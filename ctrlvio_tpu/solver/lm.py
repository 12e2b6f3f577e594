"""Levenberg–Marquardt with analytic Schur elimination of landmarks.

Replaces Ceres' TRUST_REGION/LEVENBERG_MARQUARDT/SPARSE_NORMAL_CHOLESKY
(`trajectory_estimator.cpp:367-408`) with a fully-jittable solver:

  per iteration:
    linearize        -> dense rows J (R,C), landmark Jacobians (OBS,2)
    H   = J^T J      -> one (C,R)x(R,C) MXU matmul
    Schur            -> H_ll is diagonal (landmark blocks are 1x1 inverse
                        depths), elimination is a segment-sum + rank-LM
                        update, ≙ what Ceres' sparse Cholesky does
                        implicitly for the same structure
    damped solve     -> (H_sc + lambda*diag) dx = -g_sc  (LU)
    back-substitute  -> landmark steps
    accept/reject    -> robust cost comparison, lambda schedule

Everything is branch-free (where-selects) so the whole solve jits to one
XLA program; iterations run under lax.fori_loop.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ctrlvio_tpu.utils.precision import f32_matmuls

from . import assemble
from .layout import (BiasFactors, ImageFactors, ImuFactors, PriorFactor,
                     SolveOptions, WindowConfig, WindowParams, boxminus_full,
                     column_mask, retract)


class SolveStats(NamedTuple):
    cost0: jnp.ndarray
    cost: jnp.ndarray
    lm_lambda: jnp.ndarray
    accepted: jnp.ndarray  # number of accepted steps


@f32_matmuls
def build_normal_equations(lin: assemble.Linearization, cfg: WindowConfig,
                           col_mask: jnp.ndarray):
    """H, g for the camera system + diagonal landmark system + coupling.

    Returns (H (C,C), g (C,), H_ll (LM,), g_l (LM,), H_cl (LM, C)).
    """
    dtype = lin.J.dtype
    J = lin.J * col_mask[None, :]
    H = J.T @ J
    g = J.T @ lin.r

    # landmark (diagonal) block and coupling, via segment-sum over obs
    Jl = lin.J_lm  # (OBS, 2), already masked by robust weight*valid
    h_ll = jnp.zeros((cfg.LM,), dtype=dtype).at[lin.lm_idx].add(jnp.sum(Jl * Jl, axis=-1))
    # residual rows of this obs: r[2f:2f+2]
    r_img = lin.r[: 2 * cfg.OBS].reshape(cfg.OBS, 2)
    g_l = jnp.zeros((cfg.LM,), dtype=dtype).at[lin.lm_idx].add(jnp.sum(Jl * r_img, axis=-1))
    # coupling: sum over the factor's 2 rows of Jl^T J_cam_rows
    J_rows = J[: 2 * cfg.OBS].reshape(cfg.OBS, 2, cfg.C)
    W = jnp.einsum("oc,ock->ok", Jl, J_rows)  # (OBS, C)
    H_cl = jnp.zeros((cfg.LM, cfg.C), dtype=dtype).at[lin.lm_idx].add(W)
    return H, g, h_ll, g_l, H_cl


@f32_matmuls
def schur_solve(H, g, h_ll, g_l, H_cl, lam, col_mask, dtype_eps=1e-8,
                solver: str = "chol", cg_iters: int = 48):
    """Damped Schur-complement solve. Returns (dx_cam (C,), dx_lm (LM,)).

    solver: "chol" — exact blocked Cholesky (host / sync / init paths);
            "cg"   — fixed-iteration block-Jacobi PCG (the streaming
                     megastep's TPU path: no sequential factorization
                     panels, just batched GEMVs; step inexactness is
                     absorbed by the LM accept/lambda loop and validated
                     end-to-end by the bench ATE gates)."""
    C = H.shape[0]
    diag = jnp.clip(jnp.diag(H), 1e-6, 1e32)
    H_d = H + lam * jnp.diag(diag)
    # freeze masked-out coords with identity rows (their g is already 0)
    H_d = H_d + jnp.diag(1.0 - col_mask)
    h_ll_d = h_ll * (1.0 + lam) + dtype_eps

    inv_hll = 1.0 / h_ll_d
    H_sc = H_d - H_cl.T @ (H_cl * inv_hll[:, None])
    g_sc = g - H_cl.T @ (g_l * inv_hll)

    # Jacobi preconditioning: essential for f32 on TPU (bias information
    # magnitudes ~1e6 vs knot blocks ~1e2 make H badly scaled)
    s = 1.0 / jnp.sqrt(jnp.clip(jnp.diag(H_sc), 1e-12, None))
    H_n = 0.5 * (H_sc * s[:, None] * s[None, :]
                 + H_sc.T * s[None, :] * s[:, None])
    b = -(s * g_sc)
    if os.environ.get("CTRLVIO_SOLVE", solver) == "cg":
        # Fixed-iteration CG on the Jacobi-normalized SPD system. On TPU the
        # blocked Cholesky + triangular solves are SEQUENTIAL 128-wide panel
        # loops — profiled at ~9.6 ms per LM iteration at B=16 (the single
        # largest cost of the whole megastep) — while CG is nothing but
        # batched GEMVs that vmap across lanes at full throughput. The
        # normalized system has unit diagonal and LM damping adds lam to it,
        # so conditioning is benign; an inexactly solved step is still a
        # descent direction and the LM accept/lambda loop absorbs the error
        # (inexact / truncated-Newton LM).
        iters = int(os.environ.get("CTRLVIO_CG_ITERS", str(cg_iters)))

        # block-Jacobi (3x3) preconditioner: the normalized system's local
        # knot/bias coordinate triples stay strongly coupled; inverting the
        # 3x3 diagonal blocks analytically (vmapped adjugate, no sequential
        # panels) cuts the CG iteration count ~3x for the same step quality
        nb3 = (C - 1) // 3
        Hb = H_n[: 3 * nb3, : 3 * nb3].reshape(nb3, 3, nb3, 3)
        blk = Hb[jnp.arange(nb3), :, jnp.arange(nb3), :]   # (nb3, 3, 3)
        cof = jnp.stack([
            jnp.cross(blk[:, 1], blk[:, 2]),
            jnp.cross(blk[:, 2], blk[:, 0]),
            jnp.cross(blk[:, 0], blk[:, 1]),
        ], axis=2)                                          # adj(blk)^T cols
        det = jnp.einsum("ni,ni->n", blk[:, 0], cof[:, :, 0])
        ok = jnp.abs(det) > 1e-12
        inv_blk = jnp.where(
            ok[:, None, None],
            cof / jnp.where(ok, det, 1.0)[:, None, None],
            jnp.broadcast_to(jnp.eye(3, dtype=blk.dtype), blk.shape))

        def prec(r):
            zb = jnp.einsum(
                "nij,nj->ni", inv_blk, r[: 3 * nb3].reshape(nb3, 3))
            return jnp.concatenate([zb.reshape(-1), r[3 * nb3:]])

        def cg_body(_, carry):
            x, r, p, z, rz = carry
            Hp = H_n @ p
            alpha = rz / jnp.maximum(p @ Hp, 1e-30)
            x = x + alpha * p
            r = r - alpha * Hp
            z = prec(r)
            rz_new = r @ z
            p = z + (rz_new / jnp.maximum(rz, 1e-30)) * p
            return x, r, p, z, rz_new

        x0 = jnp.zeros_like(b)
        z0 = prec(b)
        y, _, _, _, _ = jax.lax.fori_loop(
            0, iters, cg_body, (x0, b, z0, z0, b @ z0))
        dx = s * y
    else:
        # Cholesky fallback (CTRLVIO_SOLVE=chol): exact direct solve; a
        # failed factorization yields NaNs which the accept test rejects
        # (lambda then increases)
        L = jnp.linalg.cholesky(H_n)
        y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
        dx = s * jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    dx = dx * col_mask
    dx_lm = -(g_l + H_cl @ dx) * inv_hll
    return dx, dx_lm


@f32_matmuls
def solve_window(params: WindowParams, img: ImageFactors, imu: ImuFactors,
                 bias: BiasFactors, prior: PriorFactor, fixed_knots,
                 ext, gravity, imu_info, sqrt_info_img,
                 cfg: WindowConfig, opts: SolveOptions):
    """Run `opts.max_iters` LM iterations. Jit-safe; shapes all static.

    fixed_knots: (KW,) bool — knots held constant
    (≙ `SetFixedIndex`/`AddControlPoints` constancy,
    `trajectory_estimator.cpp:114-141`).

    Normal equations come from the chunked VMEM-resident accumulation
    (`assemble.accumulate_normal_equations`) — no (R, C) Jacobian is ever
    materialized in the iteration loop — and the prior's constant
    Gauss-Newton pieces (H_p = (Jm)ᵀ(Jm), (Jm)ᵀr0, (Jm)ᵀJ) are hoisted out
    of the loop entirely: per iteration the prior costs one (C,C) matvec.
    """
    dtype = params.knots_p.dtype
    cmask = column_mask(cfg, opts, fixed_knots).astype(dtype)

    # landmark validity: any active observation
    lm_used = jnp.zeros((cfg.LM,), dtype=jnp.int32).at[img.lm_idx].add(
        img.valid.astype(jnp.int32))
    lm_mask = (lm_used > 0).astype(dtype)

    # hoisted prior pieces (constant across iterations)
    Pm = prior.J * cmask[None, :]
    H_p = Pm.T @ Pm
    g_p0 = Pm.T @ prior.r0
    A_p = Pm.T @ prior.J  # for g_p(dx) = g_p0 + A_p @ dx

    # normal-equation builder: "chunked" (VMEM-resident accumulation) vs
    # "dense" (materialize J rows, one JᵀJ). Env-tunable for on-chip A/B
    # (read at TRACE time; both paths are algebraically identical).
    ne_mode = os.environ.get("CTRLVIO_NE", "chunked")

    def ne_at(p):
        """One fused pass: normal equations AND robust cost at p.

        The cost rides along with the linearization (the residuals are
        already evaluated there), so each LM trial costs ONE factor sweep —
        the separate `total_cost` acceptance pass of the two-pass
        formulation is folded in, and acceptance is decided retroactively
        at the next iteration (standard deferred-acceptance LM)."""
        if ne_mode == "dense":
            lin = assemble.linearize(p, img, imu, bias, prior, ext, gravity,
                                     imu_info, sqrt_info_img, cfg, opts)
            H, g, h_ll, g_l, H_cl = build_normal_equations(lin, cfg, cmask)
            return (H, g, h_ll, g_l, H_cl), lin.cost
        H, g, h_ll, g_l, H_cl, cost_f = assemble.accumulate_normal_equations(
            p, img, imu, bias, ext, gravity, imu_info, sqrt_info_img,
            cfg, opts)
        # column masking commutes with the accumulation: J·m ⇒ m⊙H⊙m, m·g
        H = H * cmask[:, None] * cmask[None, :] + H_p
        dx0 = boxminus_full(p, prior.knots_q0, prior.knots_p0,
                            prior.bg0, prior.ba0, prior.ld0, cfg)
        g = g * cmask + g_p0 + A_p @ dx0
        H_cl = H_cl * cmask[None, :]
        r_prior = prior.r0 + prior.J @ dx0
        cost = cost_f + 0.5 * jnp.sum(r_prior * r_prior)
        return (H, g, h_ll, g_l, H_cl), cost

    ne0, cost0 = ne_at(params)

    def body(carry):
        p, ne, cost, lam, n_acc, it, _ = carry
        dx, dx_lm = schur_solve(*ne, lam, cmask, solver=opts.solver,
                                cg_iters=opts.cg_iters)
        trial = retract(p, dx, cfg, opts)
        trial = trial._replace(dinv=p.dinv + dx_lm * lm_mask)
        ne_t, cost_t = ne_at(trial)
        accept = jnp.logical_and(cost_t < cost, jnp.isfinite(cost_t))
        p_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), p, trial)
        ne_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), ne, ne_t)
        lam_next = jnp.where(accept, lam * opts.lm_lambda_down,
                             lam * opts.lm_lambda_up)
        lam_next = jnp.clip(lam_next, 1e-10, 1e8)
        cost_next = jnp.where(accept, cost_t, cost)
        # converged once an accepted step improves cost by < tol (relative)
        rel_dec = (cost - cost_next) / jnp.maximum(cost, 1e-30)
        done = jnp.logical_and(accept, rel_dec < opts.tol)
        return (p_next, ne_next, cost_next, lam_next,
                n_acc + accept.astype(jnp.int32), it + 1, done)

    def cond(carry):
        _, _, _, _, _, it, done = carry
        return jnp.logical_and(it < opts.max_iters, jnp.logical_not(done))

    lam0 = jnp.asarray(opts.lm_lambda_init, dtype=dtype)
    p_fin, _, cost_fin, lam_fin, n_acc, _, _ = jax.lax.while_loop(
        cond, body, (params, ne0, cost0, lam0, jnp.asarray(0, jnp.int32),
                     jnp.asarray(0, jnp.int32), jnp.asarray(False)))
    return p_fin, SolveStats(cost0=cost0, cost=cost_fin, lm_lambda=lam_fin,
                             accepted=n_acc)
