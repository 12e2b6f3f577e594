"""Linearization: packed factors -> dense Jacobian rows over the window layout.

This is the TPU replacement for Ceres' residual-block evaluation + sparse
assembly (`trajectory_estimator.cpp:219-332`, Ceres SPARSE_NORMAL_CHOLESKY).
Instead of a sparse matrix, every factor's block Jacobians are scattered
into *dense rows* over the ~C=373-dim camera system; `H = J^T J` is then a
single MXU matmul and the landmark block (kept separate, diagonal) is
Schur-eliminated analytically. At the window's scale (≲11k rows, C≲512)
dense-on-MXU beats any sparse scheme by a wide margin.

Robust loss: Cauchy with scale c (≙ `trajectory_estimator.cpp:320-323`),
applied as the sqrt(rho') rescaling — exactly what Ceres' Corrector does
when rho'' <= 0, which is always the case for Cauchy (see the same logic in
`marginalization_factor.cpp:39-67`).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ctrlvio_tpu.ops import factors as F
from ctrlvio_tpu.ops import spline
from ctrlvio_tpu.utils.precision import f32_matmuls
from .layout import (BiasFactors, ImageFactors, ImuFactors, PriorFactor,
                     SolveOptions, WindowConfig, WindowParams, boxminus_full)


class Linearization(NamedTuple):
    J: jnp.ndarray        # (R, C) dense camera-system Jacobian rows
    r: jnp.ndarray        # (R,) residuals (robust-weighted)
    J_lm: jnp.ndarray     # (OBS, 2) d r_img / d dinv (robust-weighted)
    lm_idx: jnp.ndarray   # (OBS,)
    obs_valid: jnp.ndarray  # (OBS,)
    cost: jnp.ndarray     # robustified total cost (scalar)


def _cauchy_weight_and_cost(r2, c):
    """Per-factor robust weight sqrt(rho'(s)) and cost rho(s), s=||r||^2."""
    b = c * c
    w = 1.0 / jnp.sqrt(1.0 + r2 / b)
    cost = b * jnp.log1p(r2 / b)
    return w, cost


def _image_blocks(params: WindowParams, img: ImageFactors, ext, cfg: WindowConfig,
                  opts: SolveOptions, sqrt_info):
    """Vmapped residual + tangent-block Jacobians for all image factors."""
    dt = cfg.dt
    inv_dt = jnp.asarray(1.0 / dt, dtype=params.knots_p.dtype)
    ld = params.ld

    # row-shifted grid coordinates, integer shift frozen at this linearization
    ui_tot = img.f_i + img.row_i * ld * inv_dt
    uj_tot = img.f_j + img.row_j * ld * inv_dt
    shift_i = jnp.floor(ui_tot)
    shift_j = jnp.floor(uj_tot)
    s_i = jnp.clip(img.i0_i + shift_i.astype(jnp.int32), 0, cfg.KW - 4)
    s_j = jnp.clip(img.i0_j + shift_j.astype(jnp.int32), 0, cfg.KW - 4)

    q4i = spline.gather_local(params.knots_q, s_i)
    p4i = spline.gather_local(params.knots_p, s_i)
    q4j = spline.gather_local(params.knots_q, s_j)
    p4j = spline.gather_local(params.knots_p, s_j)
    dinv = params.dinv[img.lm_idx]

    from ctrlvio_tpu.ops.reproj_analytic import reproj_analytic

    def one(q4i, p4i, q4j, p4j, dinv, fi, fj, sh_i, sh_j, row_i, row_j, pt_i, pt_j):
        return reproj_analytic(q4i, p4i, q4j, p4j, dinv, ld, fi, fj, sh_i,
                               sh_j, row_i, row_j, inv_dt, pt_i, pt_j, ext,
                               sqrt_info)

    r, J_ri, J_pi, J_rj, J_pj, J_d, J_ld = jax.vmap(one)(
        q4i, p4i, q4j, p4j, dinv, img.f_i, img.f_j, shift_i, shift_j,
        img.row_i, img.row_j, img.pt_i, img.pt_j,
    )
    return r, J_ri, J_pi, J_rj, J_pj, J_d, J_ld, s_i, s_j


def _imu_blocks(params: WindowParams, imu: ImuFactors, gravity, imu_info,
                cfg: WindowConfig):
    inv_dt = jnp.asarray(1.0 / cfg.dt, dtype=params.knots_p.dtype)
    s = jnp.clip(imu.i0, 0, cfg.KW - 4)
    q4 = spline.gather_local(params.knots_q, s)
    p4 = spline.gather_local(params.knots_p, s)
    bg = params.bg[imu.bias_idx]
    ba = params.ba[imu.bias_idx]
    z43 = jnp.zeros((4, 3), dtype=p4.dtype)
    z3 = jnp.zeros((3,), dtype=p4.dtype)

    def one(q4, p4, u, bg, ba, gy, ac):
        def f(xi_r, xi_p, d_bg, d_ba):
            return F.imu_residual_tangent(
                xi_r, xi_p, d_bg, d_ba, q4, p4, u, inv_dt, bg, ba, gy, ac,
                gravity, imu_info,
            )

        r = f(z43, z43, z3, z3)
        jac = jax.jacfwd(f, argnums=(0, 1, 2, 3))(z43, z43, z3, z3)
        return r, jac

    r, (J_r, J_p, J_bg, J_ba) = jax.vmap(one)(q4, p4, imu.u, bg, ba, imu.gyro, imu.accel)
    return r, J_r, J_p, J_bg, J_ba, s


def _knot_cols(s, base):
    """Column indices (..., 4, 3) for 4 consecutive knot blocks at s."""
    k = s[..., None] + jnp.arange(4, dtype=s.dtype)  # (..., 4)
    c0 = base + 3 * k  # (..., 4)
    return c0[..., None] + jnp.arange(3, dtype=s.dtype)  # (..., 4, 3)


@f32_matmuls
def linearize(params: WindowParams, img: ImageFactors, imu: ImuFactors,
              bias: BiasFactors, prior: PriorFactor, ext, gravity, imu_info,
              sqrt_info_img, cfg: WindowConfig, opts: SolveOptions,
              marg_mode: bool = False) -> Linearization:
    """Evaluate all residuals + scatter block Jacobians into dense rows.

    marg_mode=True restricts to the marginalization factor subset
    (marg_drop flags, Cauchy scale 1 — ≙ `trajectory_estimator.cpp:321`)
    and is used to build the prior.
    """
    dtype = params.knots_p.dtype
    C = cfg.C
    KW, NB = cfg.KW, cfg.NB
    R_img = 2 * cfg.OBS
    R_imu = 6 * cfg.MIMU
    R_bias = 6 * (NB - 1)
    R = R_img + R_imu + R_bias + C

    img_active = jnp.logical_and(img.valid, img.marg_drop) if marg_mode else img.valid
    imu_active = jnp.logical_and(imu.valid, imu.marg_drop) if marg_mode else imu.valid
    cauchy_c = 1.0 if marg_mode else opts.cauchy_c

    # ---- image factors -------------------------------------------------
    (r_i, J_ri, J_pi, J_rj, J_pj, J_d, J_ld, s_i, s_j) = _image_blocks(
        params, img, ext, cfg, opts, sqrt_info_img
    )
    w_img, cost_img = _cauchy_weight_and_cost(jnp.sum(r_i * r_i, axis=-1), cauchy_c)
    m_img = img_active.astype(dtype)
    w_img = w_img * m_img
    cost = 0.5 * jnp.sum(cost_img * m_img)

    r_img = (r_i * w_img[:, None]).reshape(-1)  # (2*OBS,)
    J_lm = J_d * w_img[:, None]

    # ---- imu factors ---------------------------------------------------
    r_m, J_mr, J_mp, J_mbg, J_mba, s_m = _imu_blocks(params, imu, gravity, imu_info, cfg)
    m_imu = imu_active.astype(dtype)
    r_imu = (r_m * m_imu[:, None]).reshape(-1)
    cost = cost + 0.5 * jnp.sum((r_m * m_imu[:, None]) ** 2)

    # ---- bias factors --------------------------------------------------
    bias_active = bias.valid
    if marg_mode:
        # only the first bias pair is marginalized (≙ trajectory_manager.cpp:255-263)
        bias_active = jnp.logical_and(
            bias.valid, jnp.arange(NB - 1) == 0
        )
    rb = jax.vmap(F.bias_residual)(
        params.bg[:-1], params.bg[1:], params.ba[:-1], params.ba[1:], bias.sqrt_info
    )  # (NB-1, 6)
    m_bias = bias_active.astype(dtype)
    r_bias = (rb * m_bias[:, None]).reshape(-1)
    cost = cost + 0.5 * jnp.sum((rb * m_bias[:, None]) ** 2)

    # ---- prior ---------------------------------------------------------
    dx = boxminus_full(params, prior.knots_q0, prior.knots_p0, prior.bg0,
                       prior.ba0, prior.ld0, cfg)
    r_prior = prior.r0 + prior.J @ dx
    if marg_mode:
        # prior participates in the marg build (≙ trajectory_manager.cpp:166-203)
        pass
    cost = cost + 0.5 * jnp.sum(r_prior * r_prior)

    # ---- scatter-free dense-row assembly ------------------------------
    # Block Jacobians expand into dense rows via one-hot einsums (the
    # positional scatter became the single hottest op: XLA lowers scatters
    # serially on CPU and poorly on TPU; the einsum form is a handful of
    # tiny MXU contractions instead).
    kw_iota = jnp.arange(KW, dtype=jnp.int32)

    def knot_onehot(s):
        # (N, 4, KW): one-hot of knot indices s..s+3
        return (kw_iota[None, None, :]
                == (s[:, None, None] + jnp.arange(4, dtype=jnp.int32)[None, :, None])
                ).astype(dtype)

    def expand_knots(Jr, Jp, oh):
        # Jr/Jp: (N, rdim, 4, 3); oh: (N, 4, KW) -> (N, rdim, 6*KW)
        rot = jnp.einsum("nrkd,nkw->nrwd", Jr, oh).reshape(Jr.shape[0], -1, 3 * KW)
        pos = jnp.einsum("nrkd,nkw->nrwd", Jp, oh).reshape(Jp.shape[0], -1, 3 * KW)
        return rot, pos

    nb_iota = jnp.arange(NB, dtype=jnp.int32)

    # image rows (OBS, 2, C)
    oh_i = knot_onehot(s_i)
    oh_j = knot_onehot(s_j)
    rot_i, pos_i = expand_knots(J_ri, J_pi, oh_i)
    rot_j, pos_j = expand_knots(J_rj, J_pj, oh_j)
    w2 = w_img[:, None, None]
    J_img_rows = jnp.concatenate(
        [(rot_i + rot_j) * w2, (pos_i + pos_j) * w2,
         jnp.zeros((cfg.OBS, 2, 6 * NB), dtype=dtype),
         (J_ld * w_img[:, None])[..., None]], axis=2)

    # imu rows (M, 6, C)
    oh_m = knot_onehot(s_m)
    rot_m, pos_m = expand_knots(J_mr, J_mp, oh_m)
    oh_bias = (nb_iota[None, :] == imu.bias_idx[:, None]).astype(dtype)  # (M, NB)
    bg_m = jnp.einsum("nrd,nb->nrbd", J_mbg, oh_bias).reshape(cfg.MIMU, 6, 3 * NB)
    ba_m = jnp.einsum("nrd,nb->nrbd", J_mba, oh_bias).reshape(cfg.MIMU, 6, 3 * NB)
    wm2 = m_imu[:, None, None]
    J_imu_rows = jnp.concatenate(
        [rot_m, pos_m, bg_m, ba_m,
         jnp.zeros((cfg.MIMU, 6, 1), dtype=dtype)], axis=2) * wm2

    # bias-pair rows (NB-1, 6, C)
    si = bias.sqrt_info * m_bias[:, None]  # (NB-1, 6)
    pair = jnp.arange(NB - 1, dtype=jnp.int32)
    oh_bi = (nb_iota[None, :] == pair[:, None]).astype(dtype)        # (NB-1, NB)
    oh_bj = (nb_iota[None, :] == pair[:, None] + 1).astype(dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    # gyro rows 0..2 touch bg_i (-) and bg_j (+); accel rows 3..5 touch ba
    bg_rows = (jnp.einsum("pd,pb->pdb", si[:, :3], oh_bj - oh_bi)[:, :, :, None]
               * eye3[None, :, None, :]).reshape(NB - 1, 3, 3 * NB)
    ba_rows = (jnp.einsum("pd,pb->pdb", si[:, 3:], oh_bj - oh_bi)[:, :, :, None]
               * eye3[None, :, None, :]).reshape(NB - 1, 3, 3 * NB)
    zKW = jnp.zeros((NB - 1, 3, 6 * KW), dtype=dtype)
    z3NB = jnp.zeros((NB - 1, 3, 3 * NB), dtype=dtype)
    z1 = jnp.zeros((NB - 1, 3, 1), dtype=dtype)
    gyro_rows = jnp.concatenate([zKW, bg_rows, z3NB, z1], axis=2)
    accel_rows = jnp.concatenate([zKW, z3NB, ba_rows, z1], axis=2)
    J_bias_rows = jnp.concatenate([gyro_rows, accel_rows], axis=1)  # (NB-1,6,C)

    J = jnp.concatenate([
        J_img_rows.reshape(R_img, C),
        J_imu_rows.reshape(R_imu, C),
        J_bias_rows.reshape(R_bias, C),
        prior.J,
    ], axis=0)

    r = jnp.concatenate([r_img, r_imu, r_bias, r_prior])
    return Linearization(J=J, r=r, J_lm=J_lm, lm_idx=img.lm_idx,
                         obs_valid=img_active, cost=cost)


def _chunk_tuple(t, Q):
    """Reshape every field of a packed factor NamedTuple from (N, ...) to
    (N//Q, Q, ...) for lax.scan chunking."""
    return type(t)(*(f.reshape(f.shape[0] // Q, Q, *f.shape[1:]) for f in t))


@f32_matmuls
def accumulate_normal_equations(params: WindowParams, img: ImageFactors,
                                imu: ImuFactors, bias: BiasFactors,
                                ext, gravity, imu_info, sqrt_info_img,
                                cfg: WindowConfig, opts: SolveOptions,
                                chunk: int | None = None):
    """Normal equations built by CHUNKED accumulation — the VMEM-resident
    reformulation of `linearize` + `build_normal_equations`.

    The dense-row path materializes J (R, C) plus (OBS, 4, 3, 3)-sized
    Jacobian intermediates; under a vmapped serve batch those are tens of
    MB, exceed the ~16 MB VMEM, and every op in the LM loop pays HBM spill
    DMAs (profiled: 60-70%% of the step). Here factors are processed in
    slot chunks of `chunk`: per-chunk intermediates are a few hundred KB
    per lane, H/g accumulate across an unrolled Python loop, and nothing
    of size (R, C) ever exists. Algebraically identical to the dense path
    (same per-factor blocks, same masking semantics — column masks commute
    with the accumulation).

    Returns (H (C,C), g (C,), h_ll (LM,), g_l (LM,), H_cl (LM,C), cost)
    WITHOUT the prior contribution — the prior's Gauss-Newton pieces are
    constant across LM iterations and are hoisted out (see
    `lm.solve_window`). Cost here is the robustified factor cost only.
    """
    if chunk is None:
        # 0 = single-shot (no lax.scan): per-factor intermediates live in
        # HBM for one big fused einsum each. Profiled at B=16 on v5e: the
        # scan's carry copies of the (C,C)/(LM,C) accumulators dominate the
        # whole LM loop (~115 of 195 ms/megastep), dwarfing any VMEM-
        # residency win — latency-bound copies, not bandwidth, are the
        # enemy at this problem size.
        chunk = int(os.environ.get("CTRLVIO_NE_CHUNK", "0"))
    if chunk <= 0:
        chunk = max(cfg.OBS, cfg.MIMU)
    dtype = params.knots_p.dtype
    C, KW, NB, LM = cfg.C, cfg.KW, cfg.NB, cfg.LM
    kw_iota = jnp.arange(KW, dtype=jnp.int32)
    lm_iota = jnp.arange(LM, dtype=jnp.int32)
    nb_iota = jnp.arange(NB, dtype=jnp.int32)

    H = jnp.zeros((C, C), dtype)
    g = jnp.zeros((C,), dtype)
    h_ll = jnp.zeros((LM,), dtype)
    g_l = jnp.zeros((LM,), dtype)
    H_cl = jnp.zeros((LM, C), dtype)
    cost = jnp.zeros((), dtype)

    def knot_onehot(s):
        return (kw_iota[None, None, :]
                == (s[:, None, None]
                    + jnp.arange(4, dtype=jnp.int32)[None, :, None])
                ).astype(dtype)

    def expand_knots(Jr, Jp, oh):
        rot = jnp.einsum("nrkd,nkw->nrwd", Jr, oh).reshape(Jr.shape[0], -1, 3 * KW)
        pos = jnp.einsum("nrkd,nkw->nrwd", Jp, oh).reshape(Jp.shape[0], -1, 3 * KW)
        return rot, pos

    # ---- image factors, chunked (lax.scan: one traced body) -------------
    Q = min(chunk, cfg.OBS)
    assert cfg.OBS % Q == 0, "OBS must be a multiple of the chunk size"

    def img_body(carry, ic):
        H, g, h_ll, g_l, H_cl, cost = carry
        (r_i, J_ri, J_pi, J_rj, J_pj, J_d, J_ld, s_i, s_j) = _image_blocks(
            params, ic, ext, cfg, opts, sqrt_info_img)
        w, cost_i = _cauchy_weight_and_cost(jnp.sum(r_i * r_i, -1),
                                            opts.cauchy_c)
        m = ic.valid.astype(dtype)
        w = w * m
        cost = cost + 0.5 * jnp.sum(cost_i * m)

        oh_i = knot_onehot(s_i)
        oh_j = knot_onehot(s_j)
        rot_i, pos_i = expand_knots(J_ri, J_pi, oh_i)
        rot_j, pos_j = expand_knots(J_rj, J_pj, oh_j)
        w2 = w[:, None, None]
        rows = jnp.concatenate(
            [(rot_i + rot_j) * w2, (pos_i + pos_j) * w2,
             jnp.zeros((Q, 2, 6 * NB), dtype),
             (J_ld * w[:, None])[..., None]], axis=2)     # (Q, 2, C)
        rw = r_i * w[:, None]                              # (Q, 2)

        H = H + jnp.einsum("qrc,qrd->cd", rows, rows)
        g = g + jnp.einsum("qrc,qr->c", rows, rw)

        Jl = J_d * w[:, None]                              # (Q, 2)
        oh_lm = (lm_iota[None, :] == ic.lm_idx[:, None]).astype(dtype)
        h_ll = h_ll + oh_lm.T @ jnp.sum(Jl * Jl, -1)
        g_l = g_l + oh_lm.T @ jnp.sum(Jl * rw, -1)
        W = jnp.einsum("qr,qrc->qc", Jl, rows)             # (Q, C)
        H_cl = H_cl + oh_lm.T @ W
        return (H, g, h_ll, g_l, H_cl, cost), None

    if Q == cfg.OBS:
        (H, g, h_ll, g_l, H_cl, cost), _ = img_body(
            (H, g, h_ll, g_l, H_cl, cost), img)
    else:
        (H, g, h_ll, g_l, H_cl, cost), _ = jax.lax.scan(
            img_body, (H, g, h_ll, g_l, H_cl, cost), _chunk_tuple(img, Q))

    # ---- IMU factors, chunked -------------------------------------------
    QM = min(chunk, cfg.MIMU)
    assert cfg.MIMU % QM == 0

    def imu_body(carry, mc):
        H, g, cost = carry
        r_m, J_mr, J_mp, J_mbg, J_mba, s_m = _imu_blocks(
            params, mc, gravity, imu_info, cfg)
        mm = mc.valid.astype(dtype)
        cost = cost + 0.5 * jnp.sum((r_m * mm[:, None]) ** 2)
        oh_m = knot_onehot(s_m)
        rot_m, pos_m = expand_knots(J_mr, J_mp, oh_m)
        oh_b = (nb_iota[None, :] == mc.bias_idx[:, None]).astype(dtype)
        bg_m = jnp.einsum("nrd,nb->nrbd", J_mbg, oh_b).reshape(QM, 6, 3 * NB)
        ba_m = jnp.einsum("nrd,nb->nrbd", J_mba, oh_b).reshape(QM, 6, 3 * NB)
        rows = jnp.concatenate(
            [rot_m, pos_m, bg_m, ba_m,
             jnp.zeros((QM, 6, 1), dtype)], axis=2) * mm[:, None, None]
        rw = r_m * mm[:, None]
        H = H + jnp.einsum("qrc,qrd->cd", rows, rows)
        g = g + jnp.einsum("qrc,qr->c", rows, rw)
        return (H, g, cost), None

    if QM == cfg.MIMU:
        (H, g, cost), _ = imu_body((H, g, cost), imu)
    else:
        (H, g, cost), _ = jax.lax.scan(
            imu_body, (H, g, cost), _chunk_tuple(imu, QM))

    # ---- bias pair factors (tiny, direct) --------------------------------
    rb = jax.vmap(F.bias_residual)(
        params.bg[:-1], params.bg[1:], params.ba[:-1], params.ba[1:],
        bias.sqrt_info)
    mb = bias.valid.astype(dtype)
    cost = cost + 0.5 * jnp.sum((rb * mb[:, None]) ** 2)
    si = bias.sqrt_info * mb[:, None]
    pair = jnp.arange(NB - 1, dtype=jnp.int32)
    oh_bi = (nb_iota[None, :] == pair[:, None]).astype(dtype)
    oh_bj = (nb_iota[None, :] == pair[:, None] + 1).astype(dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    bg_rows = (jnp.einsum("pd,pb->pdb", si[:, :3], oh_bj - oh_bi)[:, :, :, None]
               * eye3[None, :, None, :]).reshape(NB - 1, 3, 3 * NB)
    ba_rows = (jnp.einsum("pd,pb->pdb", si[:, 3:], oh_bj - oh_bi)[:, :, :, None]
               * eye3[None, :, None, :]).reshape(NB - 1, 3, 3 * NB)
    zKW = jnp.zeros((NB - 1, 3, 6 * KW), dtype)
    z3NB = jnp.zeros((NB - 1, 3, 3 * NB), dtype)
    z1 = jnp.zeros((NB - 1, 3, 1), dtype)
    rows_b = jnp.concatenate([
        jnp.concatenate([zKW, bg_rows, z3NB, z1], axis=2),
        jnp.concatenate([zKW, z3NB, ba_rows, z1], axis=2)], axis=1)
    rwb = rb * mb[:, None]
    H = H + jnp.einsum("qrc,qrd->cd", rows_b, rows_b)
    g = g + jnp.einsum("qrc,qr->c", rows_b, rwb)

    return H, g, h_ll, g_l, H_cl, cost


@f32_matmuls
def residual_rms(params: WindowParams, img: ImageFactors, imu: ImuFactors,
                 bias: BiasFactors, prior: PriorFactor, ext, gravity,
                 imu_info, sqrt_info_img, cfg: WindowConfig,
                 opts: SolveOptions):
    """Per-factor-type raw residual RMS at the current state: a (4,) vector
    [image, imu, bias, prior] (per residual coordinate, valid factors only).

    ≙ ResidualSummary printed after every reference solve
    (`trajectory_estimator.cpp:69-95`) — the streaming path's per-type
    regression signal, evaluated ONCE per frame after the solve (not in the
    LM loop)."""
    dtype = params.knots_p.dtype
    inv_dt = jnp.asarray(1.0 / cfg.dt, dtype=dtype)
    ld = params.ld

    ui_tot = img.f_i + img.row_i * ld * inv_dt
    uj_tot = img.f_j + img.row_j * ld * inv_dt
    shift_i = jnp.floor(ui_tot)
    shift_j = jnp.floor(uj_tot)
    s_i = jnp.clip(img.i0_i + shift_i.astype(jnp.int32), 0, cfg.KW - 4)
    s_j = jnp.clip(img.i0_j + shift_j.astype(jnp.int32), 0, cfg.KW - 4)
    q4i = spline.gather_local(params.knots_q, s_i)
    p4i = spline.gather_local(params.knots_p, s_i)
    q4j = spline.gather_local(params.knots_q, s_j)
    p4j = spline.gather_local(params.knots_p, s_j)
    dinv = params.dinv[img.lm_idx]
    r_img = jax.vmap(
        lambda a, b, u1, c, d, u2, e, f_, g: F.reproj_residual(
            a, b, u1, c, d, u2, inv_dt, e, f_, g, ext, sqrt_info_img)
    )(q4i, p4i, ui_tot - shift_i, q4j, p4j, uj_tot - shift_j, img.pt_i, img.pt_j, dinv)
    m_img = img.valid.astype(dtype)
    rms_img = jnp.sqrt(jnp.sum(r_img * r_img * m_img[:, None])
                       / jnp.maximum(2.0 * jnp.sum(m_img), 1.0))

    s = jnp.clip(imu.i0, 0, cfg.KW - 4)
    q4 = spline.gather_local(params.knots_q, s)
    p4 = spline.gather_local(params.knots_p, s)
    r_m = jax.vmap(
        lambda a, b, u, bg, ba, gy, ac: F.imu_residual(
            a, b, u, inv_dt, bg, ba, gy, ac, gravity, imu_info)
    )(q4, p4, imu.u, params.bg[imu.bias_idx], params.ba[imu.bias_idx], imu.gyro, imu.accel)
    m_imu = imu.valid.astype(dtype)
    rms_imu = jnp.sqrt(jnp.sum(r_m * r_m * m_imu[:, None])
                       / jnp.maximum(6.0 * jnp.sum(m_imu), 1.0))

    rb = jax.vmap(F.bias_residual)(
        params.bg[:-1], params.bg[1:], params.ba[:-1], params.ba[1:], bias.sqrt_info
    )
    m_b = bias.valid.astype(dtype)
    rms_bias = jnp.sqrt(jnp.sum(rb * rb * m_b[:, None])
                        / jnp.maximum(6.0 * jnp.sum(m_b), 1.0))

    dx = boxminus_full(params, prior.knots_q0, prior.knots_p0, prior.bg0,
                       prior.ba0, prior.ld0, cfg)
    r_prior = prior.r0 + prior.J @ dx
    n_prior = jnp.sum((jnp.sum(prior.J * prior.J, axis=1) > 0).astype(dtype))
    rms_prior = jnp.sqrt(jnp.sum(r_prior * r_prior)
                         / jnp.maximum(n_prior, 1.0))
    return jnp.stack([rms_img, rms_imu, rms_bias, rms_prior])


@f32_matmuls
def total_cost(params: WindowParams, img: ImageFactors, imu: ImuFactors,
               bias: BiasFactors, prior: PriorFactor, ext, gravity, imu_info,
               sqrt_info_img, cfg: WindowConfig, opts: SolveOptions):
    """Residual-only robust cost (for LM step acceptance)."""
    dtype = params.knots_p.dtype
    inv_dt = jnp.asarray(1.0 / cfg.dt, dtype=dtype)
    ld = params.ld

    ui_tot = img.f_i + img.row_i * ld * inv_dt
    uj_tot = img.f_j + img.row_j * ld * inv_dt
    shift_i = jnp.floor(ui_tot)
    shift_j = jnp.floor(uj_tot)
    s_i = jnp.clip(img.i0_i + shift_i.astype(jnp.int32), 0, cfg.KW - 4)
    s_j = jnp.clip(img.i0_j + shift_j.astype(jnp.int32), 0, cfg.KW - 4)
    q4i = spline.gather_local(params.knots_q, s_i)
    p4i = spline.gather_local(params.knots_p, s_i)
    q4j = spline.gather_local(params.knots_q, s_j)
    p4j = spline.gather_local(params.knots_p, s_j)
    dinv = params.dinv[img.lm_idx]
    r_img = jax.vmap(
        lambda a, b, u1, c, d, u2, e, f_, g: F.reproj_residual(
            a, b, u1, c, d, u2, inv_dt, e, f_, g, ext, sqrt_info_img)
    )(q4i, p4i, ui_tot - shift_i, q4j, p4j, uj_tot - shift_j, img.pt_i, img.pt_j, dinv)
    _, cost_img = _cauchy_weight_and_cost(jnp.sum(r_img * r_img, axis=-1), opts.cauchy_c)
    cost = 0.5 * jnp.sum(cost_img * img.valid.astype(dtype))

    s = jnp.clip(imu.i0, 0, cfg.KW - 4)
    q4 = spline.gather_local(params.knots_q, s)
    p4 = spline.gather_local(params.knots_p, s)
    r_m = jax.vmap(
        lambda a, b, u, bg, ba, gy, ac: F.imu_residual(
            a, b, u, inv_dt, bg, ba, gy, ac, gravity, imu_info)
    )(q4, p4, imu.u, params.bg[imu.bias_idx], params.ba[imu.bias_idx], imu.gyro, imu.accel)
    cost = cost + 0.5 * jnp.sum((r_m * imu.valid.astype(dtype)[:, None]) ** 2)

    rb = jax.vmap(F.bias_residual)(
        params.bg[:-1], params.bg[1:], params.ba[:-1], params.ba[1:], bias.sqrt_info
    )
    cost = cost + 0.5 * jnp.sum((rb * bias.valid.astype(dtype)[:, None]) ** 2)

    dx = boxminus_full(params, prior.knots_q0, prior.knots_p0, prior.bg0,
                       prior.ba0, prior.ld0, cfg)
    r_prior = prior.r0 + prior.J @ dx
    cost = cost + 0.5 * jnp.sum(r_prior * r_prior)
    return cost
