"""Shi-Tomasi corner detection with min-distance suppression.

TPU-native replacement for `cv::goodFeaturesToTrack` + the min-distance
mask refill of the reference (`feature_tracker.cpp:112-169`): structure
tensor by separable convolutions (VPU-friendly), minimum-eigenvalue
response, 3x3 NMS, grid-cell min-distance suppression (the greedy mask of
the reference is sequential; best-per-cell on a min_dist grid is the
parallel equivalent), and top-K selection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sep_conv(img, kv, kh):
    pad_v = len(kv) // 2
    pad_h = len(kh) // 2
    c = jnp.pad(img, ((pad_v, pad_v), (0, 0)), mode="edge")
    c = sum(kv[i] * c[i : i + img.shape[0], :] for i in range(len(kv)))
    c2 = jnp.pad(c, ((0, 0), (pad_h, pad_h)), mode="edge")
    return sum(kh[i] * c2[:, i : i + img.shape[1]] for i in range(len(kh)))


def shi_tomasi_response(img, block: int = 3):
    """Min-eigenvalue of the 2x2 structure tensor, box-filtered over
    block x block (OpenCV default blockSize=3)."""
    dt = img.dtype
    deriv = jnp.asarray([-0.5, 0.0, 0.5], dtype=dt)
    smooth = jnp.asarray([0.25, 0.5, 0.25], dtype=dt)
    Ix = _sep_conv(img, smooth, deriv)
    Iy = _sep_conv(img, deriv, smooth)
    box = jnp.ones((block,), dtype=dt) / block
    gxx = _sep_conv(Ix * Ix, box, box)
    gxy = _sep_conv(Ix * Iy, box, box)
    gyy = _sep_conv(Iy * Iy, box, box)
    tr = gxx + gyy
    det = gxx * gyy - gxy * gxy
    return 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))


def _maxpool_same(r, k: int):
    pad = k // 2
    rp = jnp.pad(r, pad, mode="constant", constant_values=-jnp.inf)
    out = r
    for dy in range(k):
        for dx in range(k):
            out = jnp.maximum(out, rp[dy : dy + r.shape[0], dx : dx + r.shape[1]])
    return out


def detect(img, max_corners: int, min_dist: int, quality: float = 0.01,
           exclude_yx=None, border: int = 3):
    """Top-K Shi-Tomasi corners with min-distance suppression.

    exclude_yx: (M, 2) float existing feature positions (y, x) whose
    min_dist neighborhoods are masked out (the refill behavior of
    `feature_tracker.cpp:112-127`); pass rows of -1 for empty slots.
    Returns (pts (K, 2) as x,y float, valid (K,)).
    """
    H, W = img.shape
    r = shi_tomasi_response(img)
    # border + quality gates
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = ((yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border))
    r = jnp.where(inb, r, 0.0)
    r = jnp.where(r >= quality * jnp.max(r), r, 0.0)
    # 3x3 NMS
    r = jnp.where(r >= _maxpool_same(r, 3), r, 0.0)

    # grid-cell suppression at min_dist granularity: keep the best response
    # per cell. Expressed as PAD + RESHAPE + per-cell max/argmax — pure
    # data movement + reductions (TPU-friendly), no scatter and no top_k
    # over the full H*W image (only over the ~2k cells).
    g = max(int(min_dist), 1)
    Hc, Wc = -(-H // g), -(-W // g)
    rp = jnp.pad(r, ((0, Hc * g - H), (0, Wc * g - W)))
    cells = rp.reshape(Hc, g, Wc, g).transpose(0, 2, 1, 3).reshape(
        Hc * Wc, g * g)
    vals = cells.max(axis=1)
    offs = cells.argmax(axis=1).astype(jnp.int32)
    ci = jnp.arange(Hc * Wc, dtype=jnp.int32)
    py = (ci // Wc) * g + offs // g
    px = (ci % Wc) * g + offs % g

    # exclude cells already occupied by tracked features (scatter over the
    # small cell table only)
    if exclude_yx is not None:
        ey = jnp.clip(exclude_yx[:, 0], 0, H - 1).astype(jnp.int32)
        ex = jnp.clip(exclude_yx[:, 1], 0, W - 1).astype(jnp.int32)
        ecell = (ey // g) * Wc + (ex // g)
        valid_ex = exclude_yx[:, 0] >= 0
        occupied = jnp.zeros((Hc * Wc,), dtype=jnp.bool_).at[ecell].max(valid_ex)
        vals = jnp.where(occupied, 0.0, vals)

    # top candidate cells (sorted by response), then exact greedy min-dist
    # NMS (the grid pass bounds candidates; the greedy pass enforces the
    # radius across cell boundaries, ≙ the sequential mask of `applyMask`)
    K = min(2 * max_corners, int(vals.shape[0]))
    topv, topi = jax.lax.top_k(vals, K)
    pts = jnp.stack([px[topi].astype(img.dtype), py[topi].astype(img.dtype)],
                    axis=-1)
    vals = topv
    keep = vals > 0.0

    def body(i, keep):
        d2 = jnp.sum((pts - pts[i]) ** 2, axis=-1)
        clash = (jnp.arange(K) > i) & (d2 < float(min_dist) ** 2)
        return keep & ~(clash & keep[i])

    keep = jax.lax.fori_loop(0, K, body, keep)
    order = jnp.argsort(~keep, stable=True)[:max_corners]
    return pts[order], keep[order]
