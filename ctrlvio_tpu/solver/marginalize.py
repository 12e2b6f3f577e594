"""Continuous-time marginalization: build the linearized prior.

The headline machinery of the reference (`marginalization_factor.cpp:178-265`
+ drop-set selection in `trajectory_manager.cpp:150-263`), re-cast as
fixed-shape batched linear algebra:

  1. linearize the marg factor subset (old image factors with their inverse
     depths, IMU factors before ts[1], the first bias factor, the previous
     prior) at the current estimate — `assemble.linearize(marg_mode=True)`;
  2. form the Gauss–Newton system over the window C-coords plus the
     *diagonal* landmark block — the MXU matmul replaces the 4-pthread
     partial-Hessian reduction (`ThreadsConstructA`, :141-176);
  3. eliminate the landmark block analytically (truncated diagonal
     pseudo-inverse ≙ the eigenvalue truncation of
     `marginalization_factor.h:129` applied to 1x1 blocks), then
     Schur-eliminate the dropped knot/bias coords via a masked
     Jacobi-scaled Cholesky;
  4. take the square root of the kept system: J_lin = S^{1/2} V^T,
     r_lin = S^{-1/2} V^T b (:254-263), stored with the current values as
     linearization point (box-minus applied at solve time).

The dropped set is expressed as a boolean mask over coordinates — no pointer
identity, so a subsequent window slide is just a column roll
(`roll_prior`).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ctrlvio_tpu.ops import so3
from ctrlvio_tpu.utils.precision import f32_matmuls

from . import assemble
from .layout import (BiasFactors, ImageFactors, ImuFactors, PriorFactor,
                     SolveOptions, WindowConfig, WindowParams)

EIG_REL_EPS = {jnp.float32.dtype: 1e-6, jnp.float64.dtype: 1e-12}


def _eig_thresh(S):
    """Relative eigenvalue truncation (the reference's absolute 1e-30,
    `marginalization_factor.h:129`, is meaningless in f32; relative-to-max is
    the robust equivalent)."""
    rel = EIG_REL_EPS.get(S.dtype, 1e-6)
    return jnp.maximum(jnp.max(S), 0.0) * rel + 1e-30


def drop_mask(cfg: WindowConfig, drop_knots, drop_bias0: bool) -> jnp.ndarray:
    """(C+LM,) bool mask of dropped coordinates.

    drop_knots: (KW,) bool — control points leaving the window
    (ctrl(ts0) <= idx < ctrl(ts1), ≙ `trajectory_manager.cpp:150-155`).
    All landmark coords are dropped (only marg-flagged landmarks have
    nonzero rows; empty ones are pseudo-inverse no-ops).
    """
    km = jnp.repeat(drop_knots, 3)
    bias_m = jnp.zeros((3 * cfg.NB,), bool).at[:3].set(drop_bias0)
    ld_m = jnp.zeros((1,), bool)
    c_mask = jnp.concatenate([km, km, bias_m, bias_m, ld_m])
    return jnp.concatenate([c_mask, jnp.ones((cfg.LM,), bool)])


@f32_matmuls
def build_prior(params: WindowParams, img: ImageFactors, imu: ImuFactors,
                bias: BiasFactors, old_prior: PriorFactor, drop_knots,
                ext, gravity, imu_info, sqrt_info_img,
                cfg: WindowConfig, opts: SolveOptions,
                knot_shift=None, bias_shift=None) -> PriorFactor:
    """Construct the new prior after a MARGIN_OLD solve.

    If knot_shift/bias_shift are given (traced int32), the output prior is
    expressed directly in the *post-slide* window layout (column roll fused
    into the build — keeps the whole prior pipeline asynchronous)."""
    dtype = params.knots_p.dtype
    C, LM = cfg.C, cfg.LM

    lin = assemble.linearize(params, img, imu, bias, old_prior, ext, gravity,
                             imu_info, sqrt_info_img, cfg, opts, marg_mode=True)

    # Gauss-Newton system over the C window coords + diagonal landmark block
    J = lin.J
    H_cc = J.T @ J
    g_c = J.T @ lin.r
    Jl = lin.J_lm
    h_ll = jnp.zeros((LM,), dtype=dtype).at[lin.lm_idx].add(jnp.sum(Jl * Jl, -1))
    r_img = lin.r[: 2 * cfg.OBS].reshape(cfg.OBS, 2)
    g_l = jnp.zeros((LM,), dtype=dtype).at[lin.lm_idx].add(jnp.sum(Jl * r_img, -1))
    J_rows = J[: 2 * cfg.OBS].reshape(cfg.OBS, 2, C)
    W = jnp.einsum("oc,ock->ok", Jl, J_rows)
    H_cl = jnp.zeros((LM, C), dtype=dtype).at[lin.lm_idx].add(W)

    # [1] eliminate the landmark block analytically. It is DIAGONAL (1x1
    # inverse-depth blocks), so the truncated pseudo-inverse here IS the
    # reference's eigenvalue truncation (`marginalization_factor.cpp:240-252`)
    # applied exactly — and the dense (C+LM)^2 extended system the previous
    # implementation built (dominating the f64 host cost) never materializes.
    thr = _eig_thresh(h_ll)
    inv_hll = jnp.where(h_ll > thr, 1.0 / jnp.maximum(h_ll, thr), 0.0)
    H1 = H_cc - H_cl.T @ (H_cl * inv_hll[:, None])
    g1 = g_c - H_cl.T @ (inv_hll * g_l)
    H1 = 0.5 * (H1 + H1.T)

    # [2] Schur-eliminate the dropped window coords (old control points +
    # first bias) with a masked, Jacobi-scaled Cholesky. Scaling compresses
    # the dynamic range (bias info vs knot blocks) so the factorization stays
    # accurate — required for f32, improves f64 conditioning too.
    d = drop_mask(cfg, drop_knots, True)[:C].astype(dtype)
    k = 1.0 - d
    s = 1.0 / jnp.sqrt(jnp.clip(jnp.abs(jnp.diag(H1)), 1e-8, None))
    eps = jnp.asarray(1e-7 if dtype == jnp.float32 else 1e-10, dtype)
    Hs = H1 * s[:, None] * s[None, :]
    Hs_dd = Hs * d[:, None] * d[None, :]
    Hs_dd = 0.5 * (Hs_dd + Hs_dd.T) + jnp.diag(eps * d + (1.0 - d))
    Ld = jnp.linalg.cholesky(Hs_dd)
    eye = jnp.eye(C, dtype=dtype)
    Ld_inv = jax.scipy.linalg.solve_triangular(Ld, eye, lower=True)
    Hs_dd_inv = (Ld_inv.T @ Ld_inv) * d[:, None] * d[None, :]
    H_dd_inv = Hs_dd_inv * s[:, None] * s[None, :]

    H_kd = H1 * k[:, None] * d[None, :]
    H_sc = H1 * k[:, None] * k[None, :] - H_kd @ H_dd_inv @ H_kd.T
    b_sc = g1 * k - H_kd @ (H_dd_inv @ (g1 * d))

    # [3] square root of the kept block via Cholesky in scaled coordinates:
    # Hs_kk + eps I = L L^T  =>  J = L^T Dinv,  L r = D b_sc
    # (the reference stores the eigendecomposition sqrt, :254-263)
    H_sc = 0.5 * (H_sc + H_sc.T)
    Hs_kk = H_sc * s[:, None] * s[None, :]
    Hs_kk = 0.5 * (Hs_kk + Hs_kk.T) + eps * jnp.eye(C, dtype=dtype)
    L2 = jnp.linalg.cholesky(Hs_kk)
    J_lin = L2.T * (1.0 / s)[None, :]
    r_lin = jax.scipy.linalg.solve_triangular(L2, s * b_sc, lower=True)

    out = PriorFactor(
        J=J_lin, r0=r_lin,
        knots_q0=params.knots_q, knots_p0=params.knots_p,
        bg0=params.bg, ba0=params.ba, ld0=params.ld,
    )
    if knot_shift is not None:
        out = _roll_prior_traced(out, knot_shift, bias_shift, cfg)
    return out


def marg_caps(cfg: WindowConfig):
    """Static capacity of the COMPACTED marginalization subset (obs rows,
    IMU rows, landmark columns). The marg subset is a small fraction of the
    window's factors — obs anchored at the departing frame, IMU samples in
    the first keyframe interval, its landmarks — so the QR runs on a matrix
    ~6x smaller than the full factor set (measured 30 -> ~7 ms/megastep at
    B=16). Env-overridable; overflow is counted and surfaced loudly
    (`build_prior_sqrt(return_overflow=True)` -> stream summary)."""
    mobs = int(os.environ.get("CTRLVIO_MARG_OBS", "0")) or min(cfg.OBS, 384)
    mimu = int(os.environ.get("CTRLVIO_MARG_IMU", "0")) or min(cfg.MIMU, 128)
    mlm = int(os.environ.get("CTRLVIO_MARG_LM", "0")) or min(cfg.LM, 128)
    return mobs, mimu, mlm


@f32_matmuls
def build_prior_sqrt(params: WindowParams, img: ImageFactors, imu: ImuFactors,
                     bias: BiasFactors, old_prior: PriorFactor, drop_knots,
                     ext, gravity, imu_info, sqrt_info_img,
                     cfg: WindowConfig, opts: SolveOptions,
                     knot_shift=None, bias_shift=None,
                     return_overflow: bool = False) -> PriorFactor:
    """Square-root (QR) marginalization — the f32/TPU-safe formulation.

    The normal-equation build (`build_prior`) forms H = JᵀJ and Schur-
    eliminates by subtraction; in f32 the cancellation against the
    accumulated prior corrupts the recursion (~2 m ATE drift measured).
    Here nothing is ever squared: stack the marg-subset factor rows, the
    landmark columns, and the old prior's square-root rows into one tall
    matrix [A | b] over columns [landmarks | dropped coords | kept coords],
    then a single Q-less Householder QR eliminates landmarks + dropped
    coords by *orthogonal transforms only*. The trailing rows are the new
    prior's square root — the classic square-root information filter
    (Bierman 1977), which is exactly why it runs in f32 where the H-form
    needs f64. ≙ `marginalization_factor.cpp:209-263` (4-thread H build +
    eigendecomposition sqrt) re-designed for the MXU.

    Unlike `build_prior`, takes the FULL (uncompacted) factor arrays — the
    marg subset is selected by the `marg_drop` masks inside
    `assemble.linearize(marg_mode=True)`, so the whole build is jittable
    with no host-side compaction.
    """
    dtype = params.knots_p.dtype
    C, LM = cfg.C, cfg.LM
    MOBS, MMIMU, MLM = marg_caps(cfg)

    # ---- compact the marg subset to its static caps -----------------------
    # The marg-active factors (anchored obs / first-interval IMU) are a
    # small, contiguous-in-spirit subset; a stable argsort-gather pulls them
    # to the front so the QR below runs on (≈2k x ≈MLM+C) instead of the
    # full (≈4k x LM+C) system — same R factor (inactive rows are zero, and
    # eliminating an all-zero landmark column contributes nothing).
    m_img = jnp.logical_and(img.valid, img.marg_drop)
    m_imu = jnp.logical_and(imu.valid, imu.marg_drop)
    n_img = jnp.sum(m_img.astype(jnp.int32))
    n_imu = jnp.sum(m_imu.astype(jnp.int32))
    ord_i = jnp.argsort(jnp.logical_not(m_img), stable=True)[:MOBS]
    ord_m = jnp.argsort(jnp.logical_not(m_imu), stable=True)[:MMIMU]
    img_c = ImageFactors(*(f[ord_i] for f in img))
    imu_c = ImuFactors(*(f[ord_m] for f in imu))
    cfg_m = cfg._replace(OBS=MOBS, MIMU=MMIMU)

    lin = assemble.linearize(params, img_c, imu_c, bias, old_prior, ext,
                             gravity, imu_info, sqrt_info_img, cfg_m, opts,
                             marg_mode=True)
    R = lin.J.shape[0]

    # landmark column compaction: slots with active marg rows, front-packed
    act = jnp.logical_and(img_c.valid, img_c.marg_drop)
    cnt = jnp.zeros((LM,), jnp.int32).at[img_c.lm_idx].add(
        act.astype(jnp.int32))
    has = cnt > 0
    n_lm = jnp.sum(has.astype(jnp.int32))
    perm_lm = jnp.argsort(jnp.logical_not(has), stable=True)[:MLM]
    rank = jnp.zeros((LM,), jnp.int32).at[perm_lm].set(
        jnp.arange(MLM, dtype=jnp.int32))
    new_idx = rank[lin.lm_idx]  # inactive rows are zero in J_lm: collisions
    #                             with a real compact slot contribute nothing

    # overflow guard: an ACTIVE row whose landmark did not win a compact
    # slot would alias into slot 0 (rank defaults to 0) and corrupt another
    # landmark's column. Zero such rows entirely — the observation is
    # DROPPED from the prior (matching the loud overflow warning), never
    # mis-attributed.
    sel = jnp.zeros((LM,), jnp.bool_).at[perm_lm].set(has[perm_lm])
    row_ok = jnp.logical_or(jnp.logical_not(act),
                            sel[img_c.lm_idx]).astype(dtype)  # (MOBS,)
    lin = lin._replace(
        J=lin.J.at[: 2 * MOBS].mul(
            jnp.repeat(row_ok, 2)[:, None]),
        r=lin.r.at[: 2 * MOBS].mul(jnp.repeat(row_ok, 2)))

    # landmark columns: J_lm (MOBS, 2) scattered to (2*MOBS, MLM) columns
    oh = (jnp.arange(MLM, dtype=jnp.int32)[None, :]
          == new_idx[:, None]).astype(dtype) * row_ok[:, None]  # (MOBS, MLM)
    A_lm_img = (lin.J_lm[:, :, None] * oh[:, None, :]).reshape(2 * MOBS, MLM)
    A_lm = jnp.concatenate(
        [A_lm_img, jnp.zeros((R - 2 * MOBS, MLM), dtype=dtype)], axis=0)

    # per-cap overflow counts [obs, imu, lm] — surfaced via the stream
    # summary so the host warning can name the cap to raise
    overflow = jnp.stack([jnp.maximum(n_img - MOBS, 0),
                          jnp.maximum(n_imu - MMIMU, 0),
                          jnp.maximum(n_lm - MLM, 0)])

    # column scaling (algebraically exact: scaling a variable commutes with
    # marginalizing it; kept columns are unscaled at the end)
    cs_lm = jnp.linalg.norm(A_lm, axis=0)
    cs_c = jnp.linalg.norm(lin.J, axis=0)
    cs_lm = jnp.where(cs_lm > 1e-12, cs_lm, 1.0)
    cs_c = jnp.where(cs_c > 1e-12, cs_c, 1.0)

    # permute the C block: dropped coords first (landmark cols are all
    # dropped and already lead). argsort of the kept-flag is stable, so
    # column order within each group is preserved.
    drop_c = drop_mask(cfg, drop_knots, True)[:C]
    order = jnp.argsort(jnp.logical_not(drop_c), stable=True)
    inv_order = jnp.argsort(order)

    A = jnp.concatenate([
        A_lm / cs_lm[None, :],
        (lin.J / cs_c[None, :])[:, order],
        lin.r[:, None],
    ], axis=1)                                            # (R, MLM+C+1)

    # Rank-deficiency guard: Householder QR without pivoting handles a zero
    # (or near-noise) pivot in the eliminated block by grabbing an arbitrary
    # data direction as q_j — stealing a row of KEPT-coordinate information
    # into the discarded block (empty landmark slots make this the common
    # case, not a corner). Appending eps·I rows gives every column a private
    # pivot axis orthogonal to all data rows, so degenerate columns consume
    # their own eps row instead. Cost: spurious eps² self-information on each
    # coordinate (scaled units, so relative) — far below both dtypes' noise.
    eps = jnp.asarray(3e-4 if dtype == jnp.float32 else 1e-7, dtype)
    reg = jnp.concatenate([
        eps * jnp.eye(MLM + C, dtype=dtype),
        jnp.zeros((MLM + C, 1), dtype=dtype),
    ], axis=1)
    A = jnp.concatenate([A, reg], axis=0)
    Rq = jnp.linalg.qr(A, mode="r")                       # (MLM+C+1, MLM+C+1)

    # marginal rows: strictly below the eliminated [landmarks | dropped]
    # block. Row index >= MLM always (landmarks all dropped), so rows
    # [MLM, MLM+C) hold the (masked) C marginal rows.
    d_tot = MLM + jnp.sum(drop_c.astype(jnp.int32))
    rows = Rq[MLM : MLM + C]
    keep_row = (jnp.arange(MLM, MLM + C) >= d_tot)[:, None].astype(dtype)
    rows = rows * keep_row

    J_perm = rows[:, MLM : MLM + C]
    J_out = jnp.take(J_perm, inv_order, axis=1) * cs_c[None, :]
    r_out = rows[:, MLM + C]

    out = PriorFactor(
        J=J_out, r0=r_out,
        knots_q0=params.knots_q, knots_p0=params.knots_p,
        bg0=params.bg, ba0=params.ba, ld0=params.ld,
    )
    if knot_shift is not None:
        out = _roll_prior_traced(out, knot_shift, bias_shift, cfg)
    if return_overflow:
        return out, overflow
    return out


def _roll_prior_traced(prior: PriorFactor, knot_shift, bias_shift,
                       cfg: WindowConfig) -> PriorFactor:
    """In-graph column/row roll of the prior into the post-slide layout
    (dynamic shifts; zero-fill beyond the window edge)."""
    KW, NB, C = cfg.KW, cfg.NB, cfg.C
    dtype = prior.J.dtype
    ks3 = 3 * knot_shift
    bs3 = 3 * bias_shift

    def roll_cols(J, start, size, shift):
        idx = jnp.arange(size) + shift
        ok = idx < size
        block = jnp.take(J[:, start : start + size],
                         jnp.clip(idx, 0, size - 1), axis=1)
        return J.at[:, start : start + size].set(block * ok[None, :].astype(dtype))

    J = prior.J
    J = roll_cols(J, 0, 3 * KW, ks3)
    J = roll_cols(J, 3 * KW, 3 * KW, ks3)
    J = roll_cols(J, 6 * KW, 3 * NB, bs3)
    J = roll_cols(J, 6 * KW + 3 * NB, 3 * NB, bs3)

    def roll_rows(a, shift, fill):
        n = a.shape[0]
        idx = jnp.arange(n) + shift
        ok = (idx < n)[:, None]
        out = jnp.take(a, jnp.clip(idx, 0, n - 1), axis=0)
        return jnp.where(ok, out, jnp.asarray(fill, dtype=a.dtype))

    ident = jnp.zeros((4,), dtype=dtype).at[0].set(1.0)
    return PriorFactor(
        J=J, r0=prior.r0,
        knots_q0=roll_rows(prior.knots_q0, knot_shift, ident),
        knots_p0=roll_rows(prior.knots_p0, knot_shift, 0.0),
        bg0=roll_rows(prior.bg0, bias_shift, 0.0),
        ba0=roll_rows(prior.ba0, bias_shift, 0.0),
        ld0=prior.ld0,
    )


def roll_prior(prior: PriorFactor, knot_shift: int, bias_shift: int,
               cfg: WindowConfig) -> PriorFactor:
    """Shift the prior's columns/linearization point when the window slides.

    After MARGIN_OLD the window's first knot advances by `knot_shift` and
    keyframe biases shift down one slot; the prior's fixed-layout columns
    roll accordingly (the reference instead re-maps parameter-block
    pointers via addr_shift, `marginalization_factor.cpp:267-290`).
    Host-side numpy (runs once per frame on small arrays).
    """
    KW, NB, C = cfg.KW, cfg.NB, cfg.C
    J = np.asarray(prior.J).copy()
    s3 = 3 * knot_shift

    def roll_block(Jb, start, size, shift):
        blk = Jb[:, start : start + size]
        out = np.zeros_like(blk)
        if shift < size:
            out[:, : size - shift] = blk[:, shift:]
        Jb[:, start : start + size] = out

    if knot_shift > 0:
        roll_block(J, 0, 3 * KW, s3)             # so3 knots
        roll_block(J, 3 * KW, 3 * KW, s3)        # pos knots
    if bias_shift > 0:
        roll_block(J, 6 * KW, 3 * NB, 3 * bias_shift)       # bg
        roll_block(J, 6 * KW + 3 * NB, 3 * NB, 3 * bias_shift)  # ba

    def roll_rows(a, shift, fill):
        a = np.asarray(a).copy()
        if shift > 0:
            a[:-shift] = a[shift:]
            a[-shift:] = fill
        return a

    kq0 = roll_rows(prior.knots_q0, knot_shift, np.array([1.0, 0, 0, 0]))
    kp0 = roll_rows(prior.knots_p0, knot_shift, 0.0)
    bg0 = roll_rows(prior.bg0, bias_shift, 0.0)
    ba0 = roll_rows(prior.ba0, bias_shift, 0.0)

    return PriorFactor(J=jnp.asarray(J), r0=prior.r0, knots_q0=jnp.asarray(kq0),
                       knots_p0=jnp.asarray(kp0), bg0=jnp.asarray(bg0),
                       ba0=jnp.asarray(ba0), ld0=prior.ld0)
