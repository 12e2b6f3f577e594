"""Pallas TPU kernel: batched Lucas-Kanade refinement at one pyramid level.

The KLT inner loop is the one hot op in this framework that XLA handles
poorly: per-feature dynamic window reads from a large image become giant
gather ops. This kernel processes FPB=6 features per grid program:

  1. DMAs six fixed-size (WIN_H x WIN_W) windows around the features from
     the image in HBM into one stacked (6*WIN_H x WIN_W) VMEM scratch
     (window origins come from scalar-prefetched coordinates — the
     PrefetchScalarGridSpec pattern),
  2. builds all six template patches and their gradients in ONE pair of
     MXU matmuls via stacked block bilinear-selection matrices: the
     6x21=126-row patch stack is almost exactly one 128-row MXU tile, so
     the systolic array that idled at 21 rows per feature now runs full
     (bilinear sampling = selection matmuls — no per-lane gather, which
     the TPU VPU cannot do),
  3. runs ITERS damped LK updates for all six features together
     (per-feature scalars stay in SREGs; patch algebra is shared),
  4. writes the refined positions + G-matrix minimum eigenvalues.

The public wrapper `lk_refine` matches `frontend.klt._track_level`'s
semantics for in-bounds features (forward-backward checking and pyramid
orchestration stay in `frontend/klt.py`). Interpret mode makes it testable
on CPU; on TPU it compiles to one Mosaic kernel, ceil(N/6) grid programs.

Measured motivation: the one-feature-per-program version spent ~64 ms per
1280x1024 frame in the front end (150 features x 3 levels x fwd/bwd, each
a 21-row matmul chain); batching by 6 cuts both the program count and the
MXU underutilization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# patch half-size -> 21x21 LK window (OpenCV default), margins for gradients
# and sub-pixel shifts
HALF = 10
PATCH = 2 * HALF + 1          # 21
# Window origins must be tile-aligned for the HBM->VMEM DMA (sublane 8,
# lane 128); the window is sized so an aligned origin still leaves the
# feature's patch fully interior.
WIN_H = 48
WIN_W = 256
FPB = 6                       # features per grid program
SH = FPB * WIN_H              # stacked window rows (288)
PR = FPB * PATCH              # stacked patch rows (126 ~ one MXU tile)


def _row_map(vals):
    """(PR, 1) f32: per-row constant taking vals[b] on patch-row block b.
    Built from block-range selects (no integer div/mod — Mosaic-safe)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (PR, 1), 0)
    out = jnp.zeros((PR, 1), jnp.float32)
    for b in range(FPB):
        m = jnp.logical_and(r >= PATCH * b, r < PATCH * (b + 1))
        out = out + m.astype(jnp.float32) * vals[b]
    return out


def _col_map(vals):
    """(1, PR) f32: per-column constant taking vals[b] on patch-col block b."""
    c = jax.lax.broadcasted_iota(jnp.int32, (1, PR), 1)
    out = jnp.zeros((1, PR), jnp.float32)
    for b in range(FPB):
        m = jnp.logical_and(c >= PATCH * b, c < PATCH * (b + 1))
        out = out + m.astype(jnp.float32) * vals[b]
    return out


_BLOCKS = [float(b) for b in range(FPB)]


def _wr(oy_l, fy_l):
    """(PR, SH) stacked vertical bilinear selection: patch-row r (feature
    b=r//21, row pi=r%21) has weight (1-fy_b) at stacked-window row
    48b + oy_b + pi and fy_b at the next row. Dynamic CONTENT but static
    SHAPE — patch extraction becomes one MXU matmul for all six features."""
    r = jax.lax.broadcasted_iota(jnp.int32, (PR, 1), 0).astype(jnp.float32)
    bi = _row_map(_BLOCKS)
    pi = r - PATCH * bi
    oy = _row_map(oy_l)
    fy = _row_map(fy_l)
    c = jax.lax.broadcasted_iota(jnp.int32, (PR, SH), 1).astype(jnp.float32)
    w = c - WIN_H * bi            # window-relative row, valid only in-block
    t = oy + pi                   # target row inside the feature's window
    return ((w == t).astype(jnp.float32) * (1.0 - fy)
            + (w == t + 1.0).astype(jnp.float32) * fy)


def _wc(ox_l, fx_l):
    """(WIN_W, PR) stacked horizontal bilinear selection (all features
    share the 256 window columns; each patch-col block selects around its
    own ox_b)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (1, PR), 1).astype(jnp.float32)
    bj = _col_map(_BLOCKS)
    pj = j - PATCH * bj
    ox = _col_map(ox_l)
    fx = _col_map(fx_l)
    r = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, PR), 0).astype(jnp.float32)
    t = ox + pj
    return ((r == t).astype(jnp.float32) * (1.0 - fx)
            + (r == t + 1.0).astype(jnp.float32) * fx)


def _sample6(win, Wr, Wc):
    """All six bilinear patches as two MXU matmuls: (PR,SH)@(SH,W)@(W,PR).
    Only the six diagonal (21x21) blocks of the result are meaningful."""
    t = jnp.dot(Wr, win, preferred_element_type=jnp.float32)
    return jnp.dot(t, Wc, preferred_element_type=jnp.float32)


def _lk_kernel(iters: int,
               org_ref, pts_ref, guess_ref,      # scalar-prefetch (SMEM)
               prev_ref, cur_ref,                # HBM image refs
               out_ref,                          # output (8, 128) block
               prev_win, cur_win, sems):         # scratch
    g = pl.program_id(0)
    base = g * FPB
    f32 = jnp.float32

    # ---- 12 async copies: each feature's two windows into its band ----
    # (i32 casts: under x64 the scalar reads promote to i64, which
    # tpu.memref_slice DMA offsets reject)
    copies = []
    for b in range(FPB):
        f = base + b
        oy_p = org_ref[f, 0].astype(jnp.int32)
        ox_p = org_ref[f, 1].astype(jnp.int32)
        oy_c = org_ref[f, 2].astype(jnp.int32)
        ox_c = org_ref[f, 3].astype(jnp.int32)
        copies.append(pltpu.make_async_copy(
            prev_ref.at[pl.ds(pl.multiple_of(oy_p, 8), WIN_H),
                        pl.ds(pl.multiple_of(ox_p, 128), WIN_W)],
            prev_win.at[pl.ds(b * WIN_H, WIN_H), :], sems.at[0, b]))
        copies.append(pltpu.make_async_copy(
            cur_ref.at[pl.ds(pl.multiple_of(oy_c, 8), WIN_H),
                       pl.ds(pl.multiple_of(ox_c, 128), WIN_W)],
            cur_win.at[pl.ds(b * WIN_H, WIN_H), :], sems.at[1, b]))
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    # ---- per-feature template coordinates (scalars, unrolled) ---------
    ix_l, iy_l, fx_l, fy_l = [], [], [], []
    oxc_l, oyc_l = [], []
    lo = jnp.int32(1)
    for b in range(FPB):
        f = base + b
        ox_p = org_ref[f, 1].astype(f32)
        oy_p = org_ref[f, 0].astype(f32)
        px = pts_ref[f, 0] - ox_p
        py = pts_ref[f, 1] - oy_p
        ix = jnp.floor(px - HALF).astype(jnp.int32)
        iy = jnp.floor(py - HALF).astype(jnp.int32)
        fx_l.append(px - HALF - ix.astype(f32))
        fy_l.append(py - HALF - iy.astype(f32))
        # keep the gradient taps (ix-1 / ix+1) inside the window (i32
        # bounds — see the x64 note above)
        ix_l.append(jnp.clip(ix, lo, jnp.int32(WIN_W - PATCH - 2))
                    .astype(f32))
        iy_l.append(jnp.clip(iy, lo, jnp.int32(WIN_H - PATCH - 2))
                    .astype(f32))
        oxc_l.append(org_ref[f, 3].astype(f32))
        oyc_l.append(org_ref[f, 2].astype(f32))

    pw = prev_win[:]
    Wr0 = _wr(iy_l, fy_l)
    Wc0 = _wc(ix_l, fx_l)
    one = jnp.float32(1.0)
    T = _sample6(pw, Wr0, Wc0)
    Ix = 0.5 * (_sample6(pw, Wr0, _wc([x + one for x in ix_l], fx_l))
                - _sample6(pw, Wr0, _wc([x - one for x in ix_l], fx_l)))
    Iy = 0.5 * (_sample6(pw, _wr([y + one for y in iy_l], fy_l), Wc0)
                - _sample6(pw, _wr([y - one for y in iy_l], fy_l), Wc0))

    # diagonal-block masks: only block (b, b) of each (PR, PR) product is
    # feature b's patch; cross-feature blocks are garbage by construction
    ri = jax.lax.broadcasted_iota(jnp.int32, (PR, PR), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (PR, PR), 1)
    masks = []
    for b in range(FPB):
        mr = jnp.logical_and(ri >= PATCH * b, ri < PATCH * (b + 1))
        mc = jnp.logical_and(ci >= PATCH * b, ci < PATCH * (b + 1))
        masks.append(jnp.logical_and(mr, mc).astype(f32))

    IxIx = Ix * Ix
    IxIy = Ix * Iy
    IyIy = Iy * Iy
    gxx, gxy, gyy, inv_det, min_eig = [], [], [], [], []
    for b in range(FPB):
        a = jnp.sum(IxIx * masks[b])
        c2 = jnp.sum(IxIy * masks[b])
        d = jnp.sum(IyIy * masks[b])
        det = a * d - c2 * c2
        tr = a + d
        disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
        min_eig.append(0.5 * (tr - disc) / (PATCH * PATCH))
        inv_det.append(jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det))
        gxx.append(a)
        gxy.append(c2)
        gyy.append(d)

    cw = cur_win[:]

    def body(_, carry):
        gxs, gys = carry[:FPB], carry[FPB:]
        jx_l, jy_l, hx_l, hy_l = [], [], [], []
        for b in range(FPB):
            cx = gxs[b] - oxc_l[b]
            cy = gys[b] - oyc_l[b]
            jx = jnp.floor(cx - HALF).astype(jnp.int32)
            jy = jnp.floor(cy - HALF).astype(jnp.int32)
            jx = jnp.clip(jx, jnp.int32(0), jnp.int32(WIN_W - PATCH - 1))
            jy = jnp.clip(jy, jnp.int32(0), jnp.int32(WIN_H - PATCH - 1))
            hx_l.append(cx - HALF - jx.astype(f32))
            hy_l.append(cy - HALF - jy.astype(f32))
            jx_l.append(jx.astype(f32))
            jy_l.append(jy.astype(f32))
        I = _sample6(cw, _wr(jy_l, hy_l), _wc(jx_l, hx_l))
        dI = I - T
        dIx = dI * Ix
        dIy = dI * Iy
        ngx, ngy = [], []
        for b in range(FPB):
            bx = jnp.sum(dIx * masks[b])
            by = jnp.sum(dIy * masks[b])
            dx = inv_det[b] * (gyy[b] * bx - gxy[b] * by)
            dy = inv_det[b] * (gxx[b] * by - gxy[b] * bx)
            ngx.append(gxs[b] - dx)
            ngy.append(gys[b] - dy)
        return tuple(ngx) + tuple(ngy)

    init = tuple(guess_ref[base + b, 0] for b in range(FPB)) \
        + tuple(guess_ref[base + b, 1] for b in range(FPB))
    fin = jax.lax.fori_loop(0, iters, body, init)

    # scalar stores to VMEM are unsupported: emit one lane-padded row with
    # (gx, gy, min_eig) per feature at lanes 3b..3b+2 (iota selects —
    # value-level scatter has no Mosaic lowering)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = jnp.zeros((8, 128), f32)
    for b in range(FPB):
        row = jnp.where(lane == 3 * b, fin[b],
                        jnp.where(lane == 3 * b + 1, fin[FPB + b],
                                  jnp.where(lane == 3 * b + 2, min_eig[b],
                                            row)))
    out_ref[:, :] = row


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def lk_refine(img_prev, img_cur, pts, guess, iters: int = 10,
              interpret: bool = False):
    """Refine tracked positions at one pyramid level.

    img_prev/img_cur: (H, W) f32; pts: (N, 2) x,y template positions;
    guess: (N, 2) initial estimates in img_cur.
    Returns (pts_cur (N, 2), min_eig (N,)).
    """
    # Trace the whole kernel region with x64 semantics OFF regardless of
    # the process config: every dtype here is explicitly f32/i32, and an
    # x64-traced kernel leaks i64 into Mosaic (i64 DMA slice offsets are
    # rejected; i64 converts recurse at lowering). Hosts that enable
    # jax_enable_x64 for the f64 estimator paths would otherwise break
    # the image front end.
    with jax.enable_x64(False):
        return _lk_refine_x32(img_prev, img_cur, pts, guess, iters,
                              interpret)


def _lk_refine_x32(img_prev, img_cur, pts, guess, iters, interpret):
    H, W = img_prev.shape
    N = pts.shape[0]
    pts = pts.astype(jnp.float32)
    guess = guess.astype(jnp.float32)

    # pad the feature count to a multiple of FPB with copies of the first
    # point (always in-bounds); padded results are dropped below
    G = -(-N // FPB)
    Npad = G * FPB
    if Npad != N:
        pad = Npad - N
        pts = jnp.concatenate([pts, jnp.tile(pts[:1], (pad, 1))], axis=0)
        guess = jnp.concatenate([guess, jnp.tile(guess[:1], (pad, 1))],
                                axis=0)

    # per-feature window origins (clamped); computed on host side of the
    # kernel and scalar-prefetched so the DMAs can use them as offsets
    # tile-aligned window origins: y snapped to 8 rows (feature lands
    # 16..23 rows into the 48-row window), x snapped to 128 lanes (feature
    # lands 64..191 into the 256-lane window) — patch + taps stay interior
    def origin(p, extent, span, align, lead):
        o = ((jnp.floor(p).astype(jnp.int32) - lead) // align) * align
        return jnp.clip(o, 0, jnp.maximum(extent - span, 0))

    oy_p = origin(pts[:, 1], H, WIN_H, 8, 16)
    ox_p = origin(pts[:, 0], W, WIN_W, 128, 64)
    oy_c = origin(guess[:, 1], H, WIN_H, 8, 16)
    ox_c = origin(guess[:, 0], W, WIN_W, 128, 64)
    org = jnp.stack([oy_p, ox_p, oy_c, ox_c], axis=1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((SH, WIN_W), jnp.float32),
            pltpu.VMEM((SH, WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, FPB)),
        ],
    )
    # each grid program owns one sublane-aligned (8, 128) output block
    out = pl.pallas_call(
        functools.partial(_lk_kernel, iters),
        out_shape=jax.ShapeDtypeStruct((8 * G, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(org, pts, guess, img_prev.astype(jnp.float32), img_cur.astype(jnp.float32))
    res = out[::8][:, : 3 * FPB].reshape(Npad, 3)[:N]
    return res[:, :2], res[:, 2]
