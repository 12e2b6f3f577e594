"""Multi-device tests on the 8-device virtual CPU mesh: batched
multi-sequence solving (seq axis) and factor-sharded normal-equation
assembly with psum reduction (fac axis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlvio_tpu.parallel import batch, mesh as mesh_mod, sharded_lm
from ctrlvio_tpu.solver import assemble, lm
from ctrlvio_tpu.solver.layout import SolveOptions, column_mask, empty_prior

from tests.test_solver import problem  # fixture reuse


def _stack(tree_list):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *tree_list)


def test_mesh_construction():
    m = mesh_mod.make_mesh(n_seq=4, n_fac=2)
    assert m.shape == {"seq": 4, "fac": 2}


def test_batched_solver_matches_single(problem):
    cfg, sim, img, imu, bias, params0, kq_gt, kp_gt, aux = problem
    opts = SolveOptions(max_iters=3)
    m = mesh_mod.make_mesh(n_seq=8, n_fac=1)
    solve_b = batch.make_batched_solver(m, cfg, opts)

    B = 8
    params_b = _stack([params0] * B)
    img_b = _stack([jax.tree_util.tree_map(jnp.asarray, img)] * B)
    imu_b = _stack([jax.tree_util.tree_map(jnp.asarray, imu)] * B)
    bias_b = _stack([jax.tree_util.tree_map(jnp.asarray, bias)] * B)
    prior_b = _stack([aux["prior"]] * B)
    fixed_b = jnp.stack([aux["fixed"]] * B)

    out_b, stats_b = solve_b(params_b, img_b, imu_b, bias_b, prior_b, fixed_b,
                             aux["ext"], aux["gravity"], aux["imu_info"],
                             aux["sqrt_info_img"])

    p1, stats1 = lm.solve_window(params0, img, imu, bias, aux["prior"],
                                 aux["fixed"], aux["ext"], aux["gravity"],
                                 aux["imu_info"], aux["sqrt_info_img"], cfg, opts)
    np.testing.assert_allclose(np.asarray(out_b.knots_p[0]),
                               np.asarray(p1.knots_p), atol=1e-8)
    np.testing.assert_allclose(np.asarray(out_b.knots_p[5]),
                               np.asarray(p1.knots_p), atol=1e-8)
    assert np.all(np.asarray(stats_b.cost) <= np.asarray(stats_b.cost0))


def test_factor_sharded_step_matches_unsharded(problem):
    cfg, sim, img, imu, bias, params0, kq_gt, kp_gt, aux = problem
    opts = SolveOptions(max_iters=1)
    m = mesh_mod.make_mesh(n_seq=1, n_fac=8)
    step = sharded_lm.make_factor_sharded_step(m, cfg, opts)

    lam = jnp.asarray(1e-4, dtype=jnp.float64)
    p_sh, cost_sh = step(params0, jax.tree_util.tree_map(jnp.asarray, img),
                         jax.tree_util.tree_map(jnp.asarray, imu),
                         jax.tree_util.tree_map(jnp.asarray, bias),
                         aux["prior"], jnp.asarray(aux["fixed"]), aux["ext"],
                         aux["gravity"], aux["imu_info"], aux["sqrt_info_img"],
                         lam)

    # unsharded reference step
    cmask = column_mask(cfg, opts, jnp.asarray(aux["fixed"])).astype(jnp.float64)
    lin = assemble.linearize(params0, img, imu, bias, aux["prior"], aux["ext"],
                             aux["gravity"], aux["imu_info"],
                             aux["sqrt_info_img"], cfg, opts)
    H, g, h_ll, g_l, H_cl = lm.build_normal_equations(lin, cfg, cmask)
    from ctrlvio_tpu.solver.layout import retract

    dx, dx_lm = lm.schur_solve(H, g, h_ll, g_l, H_cl, lam, cmask)
    p_ref = retract(params0, dx, cfg, opts)._replace(dinv=params0.dinv + dx_lm)

    np.testing.assert_allclose(float(cost_sh), float(lin.cost), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(p_sh.knots_p),
                               np.asarray(p_ref.knots_p), atol=1e-7)
    np.testing.assert_allclose(np.asarray(p_sh.dinv), np.asarray(p_ref.dinv),
                               atol=1e-7)


def test_full_sharded_solve_matches_unsharded(problem):
    """The complete factor-sharded LM (iterations, accept/reject, landmark
    back-substitution, early termination — all under psum) must reproduce
    the single-device `lm.solve_window` (f64: bit-level up to psum
    reduction order)."""
    cfg, sim, img, imu, bias, params0, kq_gt, kp_gt, aux = problem
    opts = SolveOptions(max_iters=6)
    m = mesh_mod.make_mesh(n_seq=1, n_fac=8)
    solve_sh = sharded_lm.make_sharded_solve(m, cfg, opts)
    to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    args = (params0, to_j(img), to_j(imu), to_j(bias), aux["prior"],
            jnp.asarray(aux["fixed"]), aux["ext"], aux["gravity"],
            aux["imu_info"], aux["sqrt_info_img"])
    p_sh, st_sh = solve_sh(*args)
    p_ref, st_ref = lm.solve_window(*args, cfg=cfg, opts=opts)

    assert int(st_sh.accepted) == int(st_ref.accepted)
    np.testing.assert_allclose(np.asarray(p_sh.knots_p),
                               np.asarray(p_ref.knots_p), atol=1e-9)
    np.testing.assert_allclose(np.asarray(p_sh.knots_q),
                               np.asarray(p_ref.knots_q), atol=1e-9)
    np.testing.assert_allclose(np.asarray(p_sh.dinv),
                               np.asarray(p_ref.dinv), atol=1e-9)
    np.testing.assert_allclose(float(p_sh.ld), float(p_ref.ld), atol=1e-12)
    np.testing.assert_allclose(float(st_sh.cost), float(st_ref.cost),
                               rtol=1e-8)
