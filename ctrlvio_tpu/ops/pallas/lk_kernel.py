"""Pallas TPU kernel: batched Lucas-Kanade refinement at one pyramid level.

The KLT inner loop is the one hot op in this framework that XLA handles
poorly: per-feature dynamic window reads from a large image become giant
gather ops. This kernel gives each feature its own grid program that

  1. DMAs a fixed-size (WIN x 128) window around the feature from the image
     in HBM into VMEM (window origin comes from scalar-prefetched
     coordinates — the PrefetchScalarGridSpec pattern),
  2. builds the template patch and its gradients with uniform fractional
     shifts (the whole patch shares one sub-pixel offset, so bilinear
     sampling = a 4-tap blend of integer-shifted slices — no per-lane
     gather, which the TPU VPU cannot do),
  3. runs ITERS damped LK updates entirely in registers/VMEM,
  4. writes the refined position + the G-matrix minimum eigenvalue.

The public wrapper `lk_refine` matches `frontend.klt._track_level`'s
semantics for in-bounds features (forward-backward checking and pyramid
orchestration stay in `frontend/klt.py`). Interpret mode makes it testable
on CPU; on TPU it compiles to one Mosaic kernel for all features.
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


def _row_weights(oy, fy):
    """(PATCH, WIN_H) vertical bilinear selection matrix: row i has weight
    (1-fy) at window row oy+i and fy at oy+i+1. Dynamic CONTENT but static
    SHAPE — patch extraction becomes an MXU matmul instead of an unaligned
    dynamic slice (which Mosaic cannot lower on the sublane axis)."""
    pi = jax.lax.broadcasted_iota(jnp.int32, (PATCH, WIN_H), 0)
    wj = jax.lax.broadcasted_iota(jnp.int32, (PATCH, WIN_H), 1)
    return ((wj == oy + pi).astype(jnp.float32) * (1.0 - fy)
            + (wj == oy + pi + 1).astype(jnp.float32) * fy)


def _col_weights(ox, fx):
    """(WIN_W, PATCH) horizontal bilinear selection matrix."""
    wi = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, PATCH), 0)
    pj = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, PATCH), 1)
    return ((wi == ox + pj).astype(jnp.float32) * (1.0 - fx)
            + (wi == ox + pj + 1).astype(jnp.float32) * fx)


def _sample(win, Wr, Wc):
    """Bilinear patch extraction as two MXU matmuls: (P,H)@(H,W)@(W,P)."""
    t = jnp.dot(Wr, win, preferred_element_type=jnp.float32)
    return jnp.dot(t, Wc, preferred_element_type=jnp.float32)


def _lk_kernel(iters: int,
               org_ref, pts_ref, guess_ref,      # scalar-prefetch (SMEM)
               prev_ref, cur_ref,                # HBM image refs
               out_ref,                          # output (1, 128) block
               prev_win, cur_win, sems):         # scratch
    f = pl.program_id(0)
    # force i32 (under x64 the scalar reads promote to i64, which
    # tpu.memref_slice DMA offsets reject)
    oy_p = org_ref[f, 0].astype(jnp.int32)
    ox_p = org_ref[f, 1].astype(jnp.int32)
    oy_c = org_ref[f, 2].astype(jnp.int32)
    ox_c = org_ref[f, 3].astype(jnp.int32)

    cp_prev = pltpu.make_async_copy(
        prev_ref.at[pl.ds(pl.multiple_of(oy_p, 8), WIN_H),
                    pl.ds(pl.multiple_of(ox_p, 128), WIN_W)], prev_win,
        sems.at[0])
    cp_cur = pltpu.make_async_copy(
        cur_ref.at[pl.ds(pl.multiple_of(oy_c, 8), WIN_H),
                    pl.ds(pl.multiple_of(ox_c, 128), WIN_W)], cur_win,
        sems.at[1])
    cp_prev.start()
    cp_cur.start()
    cp_prev.wait()
    cp_cur.wait()

    # template patch + gradients at the feature's sub-pixel position
    px = pts_ref[f, 0] - ox_p.astype(jnp.float32)
    py = pts_ref[f, 1] - oy_p.astype(jnp.float32)
    ix = jnp.floor(px - HALF).astype(jnp.int32)
    iy = jnp.floor(py - HALF).astype(jnp.int32)
    fx = px - HALF - ix.astype(jnp.float32)
    fy = py - HALF - iy.astype(jnp.float32)
    # keep the gradient taps (ix-1 / ix+1) inside the window. Bounds are
    # explicit i32: under x64 mode Python-int clip bounds promote the
    # index to i64 inside the kernel, and Mosaic's i64 convert lowering
    # recurses infinitely (RecursionError at trace time).
    one = jnp.int32(1)
    ix = jnp.clip(ix, one, jnp.int32(WIN_W - PATCH - 2))
    iy = jnp.clip(iy, one, jnp.int32(WIN_H - PATCH - 2))

    pw = prev_win[:]
    Wr = _row_weights(iy, fy)
    Wc = _col_weights(ix, fx)
    T = _sample(pw, Wr, Wc)
    Ix = 0.5 * (_sample(pw, Wr, _col_weights(ix + 1, fx))
                - _sample(pw, Wr, _col_weights(ix - 1, fx)))
    Iy = 0.5 * (_sample(pw, _row_weights(iy + 1, fy), Wc)
                - _sample(pw, _row_weights(iy - 1, fy), Wc))

    gxx = jnp.sum(Ix * Ix)
    gxy = jnp.sum(Ix * Iy)
    gyy = jnp.sum(Iy * Iy)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    min_eig = 0.5 * (tr - disc) / (PATCH * PATCH)

    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)

    def body(_, g):
        gx, gy = g
        cx = gx - ox_c.astype(jnp.float32)
        cy = gy - oy_c.astype(jnp.float32)
        jx = jnp.floor(cx - HALF).astype(jnp.int32)
        jy = jnp.floor(cy - HALF).astype(jnp.int32)
        # clamp so the 4-tap slices stay inside the window (i32 bounds —
        # see the x64/Mosaic note above)
        jx = jnp.clip(jx, jnp.int32(0), jnp.int32(WIN_W - PATCH - 1))
        jy = jnp.clip(jy, jnp.int32(0), jnp.int32(WIN_H - PATCH - 1))
        hx = cx - HALF - jx.astype(jnp.float32)
        hy = cy - HALF - jy.astype(jnp.float32)
        I = _sample(cur_win[:], _row_weights(jy, hy), _col_weights(jx, hx))
        dI = I - T
        bx = jnp.sum(dI * Ix)
        by = jnp.sum(dI * Iy)
        dx = inv_det * (gyy * bx - gxy * by)
        dy = inv_det * (gxx * by - gxy * bx)
        return gx - dx, gy - dy

    gx, gy = jax.lax.fori_loop(
        0, iters, body, (guess_ref[f, 0], guess_ref[f, 1]))
    # scalar stores to VMEM are unsupported: emit one lane-padded row
    # (built with iota selects — value-level scatter has no Mosaic lowering)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = jnp.where(lane == 0, gx,
                    jnp.where(lane == 1, gy,
                              jnp.where(lane == 2, min_eig, 0.0)))
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
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda f, *_: (f, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN_H, WIN_W), jnp.float32),
            pltpu.VMEM((WIN_H, WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # each grid program owns one sublane-aligned (8, 128) output block
    out = pl.pallas_call(
        functools.partial(_lk_kernel, iters),
        out_shape=jax.ShapeDtypeStruct((8 * N, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(org, pts, guess, img_prev.astype(jnp.float32), img_cur.astype(jnp.float32))
    out = out[::8]
    return out[:, :2], out[:, 2]
