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
def schur_solve(H, g, h_ll, g_l, H_cl, lam, col_mask, dtype_eps=1e-8):
    """Damped Schur-complement solve. Returns (dx_cam (C,), dx_lm (LM,))."""
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
    H_n = H_sc * s[:, None] * s[None, :]
    # H_n is SPD after damping: Cholesky + two triangular solves beat the
    # generic LU lowering on TPU; a failed factorization yields NaNs which
    # the accept test rejects (lambda then increases)
    L = jnp.linalg.cholesky(0.5 * (H_n + H_n.T))
    y = jax.scipy.linalg.solve_triangular(L, -(s * g_sc), lower=True)
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

    def cost_fn(p):
        return assemble.total_cost(p, img, imu, bias, prior, ext, gravity,
                                   imu_info, sqrt_info_img, cfg, opts)

    cost0 = cost_fn(params)

    def body(carry):
        p, lam, cost, n_acc, it, _ = carry
        H, g, h_ll, g_l, H_cl, _ = assemble.accumulate_normal_equations(
            p, img, imu, bias, ext, gravity, imu_info, sqrt_info_img, cfg,
            opts)
        # column masking commutes with the accumulation: J·m ⇒ m⊙H⊙m, m·g
        H = H * cmask[:, None] * cmask[None, :] + H_p
        dx0 = boxminus_full(p, prior.knots_q0, prior.knots_p0, prior.bg0,
                            prior.ba0, prior.ld0, cfg)
        g = g * cmask + g_p0 + A_p @ dx0
        H_cl = H_cl * cmask[None, :]
        dx, dx_lm = schur_solve(H, g, h_ll, g_l, H_cl, lam, cmask)
        trial = retract(p, dx, cfg, opts)
        new_dinv = p.dinv + dx_lm * lm_mask
        trial = trial._replace(dinv=new_dinv)
        new_cost = cost_fn(trial)
        accept = jnp.logical_and(new_cost < cost, jnp.isfinite(new_cost))
        p_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), p, trial)
        lam_next = jnp.where(accept, lam * opts.lm_lambda_down,
                             lam * opts.lm_lambda_up)
        lam_next = jnp.clip(lam_next, 1e-10, 1e8)
        cost_next = jnp.where(accept, new_cost, cost)
        # converged once an accepted step improves cost by < tol (relative)
        rel_dec = (cost - cost_next) / jnp.maximum(cost, 1e-30)
        done = jnp.logical_and(accept, rel_dec < opts.tol)
        return (p_next, lam_next, cost_next,
                n_acc + accept.astype(jnp.int32), it + 1, done)

    def cond(carry):
        _, _, _, _, it, done = carry
        return jnp.logical_and(it < opts.max_iters, jnp.logical_not(done))

    lam0 = jnp.asarray(opts.lm_lambda_init, dtype=dtype)
    p_fin, lam_fin, cost_fin, n_acc, _, _ = jax.lax.while_loop(
        cond, body, (params, lam0, cost0, jnp.asarray(0, jnp.int32),
                     jnp.asarray(0, jnp.int32), jnp.asarray(False)))
    return p_fin, SolveStats(cost0=cost0, cost=cost_fin, lm_lambda=lam_fin,
                             accepted=n_acc)
