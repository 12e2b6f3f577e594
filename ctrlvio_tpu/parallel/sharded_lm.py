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
