"""Batched pyramidal Lucas-Kanade optical flow.

TPU-native replacement of the reference's `cv::calcOpticalFlowPyrLK` front
end (`/root/reference/src/visual_odometry/visual_feature/feature_tracker.cpp:74-89`),
including the forward-backward consistency check (`flow_back`/FB_THRESHOLD).

Design: all features track simultaneously — one `vmap` over N features, a
Python-unrolled coarse-to-fine loop over pyramid levels, and a fixed
iteration count per level (branch-free; OpenCV's early-exit epsilon becomes
a no-op update once converged). Patch sampling is bilinear gather from the
full image; the 2x2 normal equations solve in registers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KLTConfig(NamedTuple):
    win: int = 10          # patch half-size -> 21x21 window (OpenCV (21,21))
    levels: int = 4        # pyramid levels (OpenCV maxLevel=3 -> 4 levels)
    iters: int = 10        # LK iterations per level
    min_eig: float = 1e-4  # min eigenvalue threshold on G (normalized)
    fb_thresh: float = 0.5  # forward-backward distance gate (≙ FB_THRESHOLD)
    pred_levels: int = 2   # levels used when an initial flow is given: the
    #                        prediction already absorbs the large motion, and
    #                        coarse levels (where fine texture aliases away)
    #                        can only drag a good guess off target


def pyramid(img, levels: int):
    """Gaussian-ish pyramid: [level0 = img, ...]; 5-tap binomial blur +
    2x decimation per level. img: (H, W) float."""
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], dtype=img.dtype) / 16.0
    out = [img]
    cur = img
    for _ in range(levels - 1):
        # separable blur
        c = jnp.pad(cur, ((2, 2), (0, 0)), mode="edge")
        c = sum(k[i] * c[i : i + cur.shape[0], :] for i in range(5))
        c2 = jnp.pad(c, ((0, 0), (2, 2)), mode="edge")
        c = sum(k[i] * c2[:, i : i + cur.shape[1]] for i in range(5))
        cur = c[::2, ::2]
        out.append(cur)
    return out


def _bilinear(img, y, x):
    """Sample img at float coords (y, x) arrays, border-clamped."""
    H, W = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    i00 = img[y0i, x0i]
    i01 = img[y0i, x0i + 1]
    i10 = img[y0i + 1, x0i]
    i11 = img[y0i + 1, x0i + 1]
    return (i00 * (1 - wy) * (1 - wx) + i01 * (1 - wy) * wx
            + i10 * wy * (1 - wx) + i11 * wy * wx)


def _track_level(img_prev, img_cur, pt_prev, guess, cfg: KLTConfig):
    """LK at one pyramid level for a single feature.

    pt_prev: (2,) x,y in this level's coords; guess: (2,) current estimate of
    the tracked position. Returns (new_guess, min_eig)."""
    w = cfg.win
    dy, dx = jnp.meshgrid(
        jnp.arange(-w, w + 1, dtype=img_prev.dtype),
        jnp.arange(-w, w + 1, dtype=img_prev.dtype), indexing="ij")

    py = pt_prev[1] + dy
    px = pt_prev[0] + dx
    # template and its gradients (central differences on the source image)
    T = _bilinear(img_prev, py, px)
    Ix = 0.5 * (_bilinear(img_prev, py, px + 1) - _bilinear(img_prev, py, px - 1))
    Iy = 0.5 * (_bilinear(img_prev, py + 1, px) - _bilinear(img_prev, py - 1, px))

    gxx = jnp.sum(Ix * Ix)
    gxy = jnp.sum(Ix * Iy)
    gyy = jnp.sum(Iy * Iy)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
    n = (2 * w + 1) ** 2
    min_eig = min_eig / n

    inv = jnp.asarray([[gyy, -gxy], [-gxy, gxx]], dtype=img_prev.dtype) / \
        jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)

    def body(_, g):
        I = _bilinear(img_cur, g[1] + dy, g[0] + dx)
        dI = I - T
        b = jnp.asarray([jnp.sum(dI * Ix), jnp.sum(dI * Iy)])
        return g - inv @ b

    out = jax.lax.fori_loop(0, cfg.iters, body, guess)
    return out, min_eig


def track(pyr_prev, pyr_cur, pts, cfg: KLTConfig = KLTConfig(),
          use_pallas: bool = False, init=None):
    """Track pts (N, 2) from prev to cur. Returns (pts_cur (N,2), ok (N,)).

    Coarse-to-fine with forward-backward verification
    (≙ `feature_tracker.cpp:74-89`). With use_pallas=True the
    full-resolution levels run the Mosaic kernel
    (`ops/pallas/lk_kernel.py` — 6 features per grid program; 150
    features refine in ~2.3 ms on a v5e); levels smaller than the
    kernel's DMA window use the vmapped JAX path.

    init (N, 2), optional: initial guess of the tracked positions (e.g. a
    gyro-predicted flow, `frontend/fused.py::rotation_flow`), ≙ OpenCV's
    OPTFLOW_USE_INITIAL_FLOW. The backward pass always starts from the
    original pts — with prediction, FB verification stays meaningful for
    displacements far beyond the pyramid's unaided convergence range.
    """
    H, W = pyr_prev[0].shape
    L = len(pyr_prev) if init is None else min(len(pyr_prev),
                                               max(cfg.pred_levels, 1))
    pyr_prev, pyr_cur = pyr_prev[:L], pyr_cur[:L]

    def fwd(pyrs_a, pyrs_b, p0, g0):
        if use_pallas:
            from ctrlvio_tpu.ops.pallas import lk_kernel

            g = g0 / (2 ** (L - 1))
            eig = jnp.zeros((p0.shape[0],), dtype=p0.dtype)
            for lev in range(L - 1, -1, -1):
                pl_pts = p0 / (2**lev)
                h, w = pyrs_a[lev].shape
                if h >= lk_kernel.WIN_H and w >= lk_kernel.WIN_W:
                    g, eig = lk_kernel.lk_refine(pyrs_a[lev], pyrs_b[lev],
                                                 pl_pts, g, iters=cfg.iters)
                else:
                    g, eig = jax.vmap(
                        lambda pt, gg: _track_level(pyrs_a[lev], pyrs_b[lev],
                                                    pt, gg, cfg))(pl_pts, g)
                if lev > 0:
                    g = g * 2.0
            return g, eig

        def one(pt, gi):
            g = gi / (2 ** (L - 1))
            me_last = jnp.asarray(0.0, dtype=pt.dtype)
            for lev in range(L - 1, -1, -1):
                pl = pt / (2**lev)
                g, me_last = _track_level(pyrs_a[lev], pyrs_b[lev], pl, g, cfg)
                if lev > 0:
                    g = g * 2.0
            return g, me_last

        return jax.vmap(one)(p0, g0)

    pts_cur, eig = fwd(pyr_prev, pyr_cur, pts, pts if init is None else init)
    pts_back, _ = fwd(pyr_cur, pyr_prev, pts_cur, pts)

    fb = jnp.linalg.norm(pts_back - pts, axis=-1)
    inb = ((pts_cur[:, 0] >= 1.0) & (pts_cur[:, 0] < W - 1.0)
           & (pts_cur[:, 1] >= 1.0) & (pts_cur[:, 1] < H - 1.0))
    ok = (fb < cfg.fb_thresh) & inb & (eig > cfg.min_eig)
    return pts_cur, ok
