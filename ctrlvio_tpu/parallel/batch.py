"""Batched multi-sequence window solving: data parallelism over sequences.

Throughput scale-out (BASELINE config 5): B independent sliding-window
problems (different sequences, or different time windows of long sequences)
solve simultaneously — `vmap` over the window solve, batch axis sharded over
the mesh's `seq` axis. XLA turns the per-window dense algebra into batched
MXU matmuls; each device runs its shard with zero cross-device traffic
(embarrassingly parallel, so scaling efficiency is bandwidth-limited only by
host->device feeding).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ctrlvio_tpu.solver import lm
from ctrlvio_tpu.solver.layout import SolveOptions, WindowConfig


def make_batched_solver(mesh, cfg: WindowConfig, opts: SolveOptions):
    """Returns a jitted function solving a batch of windows sharded over the
    mesh's `seq` axis. All inputs carry a leading batch axis."""

    shard = NamedSharding(mesh, P("seq"))

    def solve_batch(params_b, img_b, imu_b, bias_b, prior_b, fixed_b, ext,
                    gravity, imu_info, sqrt_info_img):
        f = partial(lm.solve_window, cfg=cfg, opts=opts)
        return jax.vmap(
            lambda p, a, b, c, d, e: f(p, a, b, c, d, e, ext, gravity,
                                       imu_info, sqrt_info_img)
        )(params_b, img_b, imu_b, bias_b, prior_b, fixed_b)

    def constrain(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, shard), tree)

    @jax.jit
    def solve(params_b, img_b, imu_b, bias_b, prior_b, fixed_b, ext, gravity,
              imu_info, sqrt_info_img):
        params_b = constrain(params_b)
        img_b = constrain(img_b)
        imu_b = constrain(imu_b)
        out, stats = solve_batch(params_b, img_b, imu_b, bias_b, prior_b,
                                 fixed_b, ext, gravity, imu_info, sqrt_info_img)
        return constrain(out), stats

    return solve
