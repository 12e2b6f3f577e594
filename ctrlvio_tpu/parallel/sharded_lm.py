"""Factor-sharded Gauss-Newton assembly: distributed Schur reduction.

The TPU-native analogue of `ThreadsConstructA`
(`/root/reference/src/estimator/factor/analytic_diff/marginalization_factor.cpp:141-238`):
the reference splits factors over 4 pthreads, each builds a partial (H, b),
and the join sums them. Here factors shard over the mesh's `fac` axis; each
device linearizes its shard and computes partial normal equations;
`jax.lax.psum` over ICI reduces them, after which every device runs the
identical small dense damped solve. One window's assembly thus scales over
chips as factor counts grow (dense mapping, long windows, many landmarks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ctrlvio_tpu.solver import assemble, lm
from ctrlvio_tpu.solver.layout import (ImageFactors, ImuFactors, SolveOptions,
                                       WindowConfig, column_mask, retract)


def _specs(nt_cls, spec):
    return nt_cls(*(spec for _ in nt_cls._fields))


def make_factor_sharded_step(mesh, cfg: WindowConfig, opts: SolveOptions):
    """Build a jitted factor-sharded GN/LM step.

    step(params, img, imu, bias, prior, fixed, ext, gravity, imu_info,
         sqrt_info_img, lam) -> (new_params, replicated_cost)

    Factor arrays keep their global static sizes; OBS and MIMU must divide
    by the `fac` axis size.
    """
    n_fac = mesh.shape["fac"]
    assert cfg.OBS % n_fac == 0 and cfg.MIMU % n_fac == 0
    shard_cfg = cfg._replace(OBS=cfg.OBS // n_fac, MIMU=cfg.MIMU // n_fac)

    def shard_fn(params, img_s, imu_s, bias, prior, fixed, ext, gravity,
                 imu_info, sqrt_info_img):
        # bias + prior rows are replicated: count them only on shard 0 so the
        # psum totals them once
        keep = jax.lax.axis_index("fac") == 0
        bias = bias._replace(valid=jnp.logical_and(bias.valid, keep))
        prior = prior._replace(J=jnp.where(keep, prior.J, 0.0),
                               r0=jnp.where(keep, prior.r0, 0.0))

        cmask = column_mask(shard_cfg, opts, fixed).astype(params.knots_p.dtype)
        lin = assemble.linearize(params, img_s, imu_s, bias, prior, ext,
                                 gravity, imu_info, sqrt_info_img, shard_cfg,
                                 opts)
        H, g, h_ll, g_l, H_cl = lm.build_normal_equations(lin, shard_cfg, cmask)
        return (jax.lax.psum(H, "fac"), jax.lax.psum(g, "fac"),
                jax.lax.psum(h_ll, "fac"), jax.lax.psum(g_l, "fac"),
                jax.lax.psum(H_cl, "fac"), jax.lax.psum(lin.cost, "fac"))

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), _specs(ImageFactors, P("fac")), _specs(ImuFactors, P("fac")),
                  P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )

    def step(params, img, imu, bias, prior, fixed, ext, gravity, imu_info,
             sqrt_info_img, lam):
        dtype = params.knots_p.dtype
        H, g, h_ll, g_l, H_cl, cost = sharded(
            params, img, imu, bias, prior, fixed, ext, gravity, imu_info,
            sqrt_info_img)
        cmask = column_mask(cfg, opts, fixed).astype(dtype)
        dx, dx_lm = lm.schur_solve(H, g, h_ll, g_l, H_cl, lam, cmask)
        new = retract(params, dx, cfg, opts)
        return new._replace(dinv=params.dinv + dx_lm), cost

    return jax.jit(step)


def make_sharded_solve(mesh, cfg: WindowConfig, opts: SolveOptions):
    """Full factor-sharded `solve_window`: the complete LM loop — damped
    Schur solve, landmark back-substitution, robust-cost accept/reject,
    lambda schedule, early termination — with every factor reduction a
    `psum` over the mesh's `fac` axis.

    Mirrors `lm.solve_window` exactly (same iteration math, so results
    match the single-device solve to reduction-order rounding); the
    per-iteration linearization + partial (H, b) build runs on each
    device's factor shard — the distributed generalization of the
    reference's 4-pthread Hessian build
    (`marginalization_factor.cpp:209-238`), with XLA collectives over ICI
    replacing the join. The dense C×C solve is replicated on every device
    (identical inputs after psum -> identical step), so no broadcast is
    needed.
    """
    n_fac = mesh.shape["fac"]
    assert cfg.OBS % n_fac == 0 and cfg.MIMU % n_fac == 0
    shard_cfg = cfg._replace(OBS=cfg.OBS // n_fac, MIMU=cfg.MIMU // n_fac)

    def shard_fn(params, img_s, imu_s, bias, prior, fixed, ext, gravity,
                 imu_info, sqrt_info_img):
        dtype = params.knots_p.dtype
        # replicated rows (bias pairs, prior) count once: shard 0 only
        keep = jax.lax.axis_index("fac") == 0
        bias0 = bias._replace(valid=jnp.logical_and(bias.valid, keep))
        prior0 = prior._replace(
            J=jnp.where(keep, prior.J, jnp.zeros_like(prior.J)),
            r0=jnp.where(keep, prior.r0, jnp.zeros_like(prior.r0)))

        cmask = column_mask(shard_cfg, opts, fixed).astype(dtype)
        lm_used = jnp.zeros((cfg.LM,), jnp.int32).at[img_s.lm_idx].add(
            img_s.valid.astype(jnp.int32))
        lm_mask = (jax.lax.psum(lm_used, "fac") > 0).astype(dtype)

        def cost_fn(p):
            c = assemble.total_cost(p, img_s, imu_s, bias0, prior0, ext,
                                    gravity, imu_info, sqrt_info_img,
                                    shard_cfg, opts)
            return jax.lax.psum(c, "fac")

        cost0 = cost_fn(params)

        def body(carry):
            p, lam, cost, n_acc, it, _ = carry
            lin = assemble.linearize(p, img_s, imu_s, bias0, prior0, ext,
                                     gravity, imu_info, sqrt_info_img,
                                     shard_cfg, opts)
            H, g, h_ll, g_l, H_cl = lm.build_normal_equations(
                lin, shard_cfg, cmask)
            H = jax.lax.psum(H, "fac")
            g = jax.lax.psum(g, "fac")
            h_ll = jax.lax.psum(h_ll, "fac")
            g_l = jax.lax.psum(g_l, "fac")
            H_cl = jax.lax.psum(H_cl, "fac")
            dx, dx_lm = lm.schur_solve(H, g, h_ll, g_l, H_cl, lam, cmask)
            trial = retract(p, dx, shard_cfg, opts)
            trial = trial._replace(dinv=p.dinv + dx_lm * lm_mask)
            new_cost = cost_fn(trial)
            accept = jnp.logical_and(new_cost < cost, jnp.isfinite(new_cost))
            p_next = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, b, a), p, trial)
            lam_next = jnp.where(accept, lam * opts.lm_lambda_down,
                                 lam * opts.lm_lambda_up)
            lam_next = jnp.clip(lam_next, 1e-10, 1e8)
            cost_next = jnp.where(accept, new_cost, cost)
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
        return p_fin, lm.SolveStats(cost0=cost0, cost=cost_fin,
                                    lm_lambda=lam_fin, accepted=n_acc)

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), _specs(ImageFactors, P("fac")),
                  _specs(ImuFactors, P("fac")), P(), P(), P(), P(), P(),
                  P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
