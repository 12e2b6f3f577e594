"""Single-window bundle adjustment on perfect synthetic data: the solver must
recover ground-truth knots, inverse depths, and the line delay from a
perturbed initialization (config 1-2 of BASELINE.json at test scale)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlvio_tpu.ops import factors as F
from ctrlvio_tpu.ops import so3
from ctrlvio_tpu.sim import synthetic
from ctrlvio_tpu.solver import assemble, lm
from ctrlvio_tpu.solver.layout import (PriorFactor, SolveOptions, WindowConfig,
                                       WindowParams, empty_prior)
from ctrlvio_tpu.estimator import packing


@pytest.fixture(scope="module")
def problem():
    cfg = WindowConfig(KW=40, NB=11, LM=128, OBS=1024, MIMU=512, dt=0.05)
    sim = synthetic.generate(synthetic.SimConfig(duration=3.0, n_landmarks=150, seed=7))
    frames = sim.frames[: cfg.NB]
    kf_t_ns = np.array([f.t_ns for f in frames], dtype=np.int64)

    # feature tracks: first contiguous run per landmark id
    tracks = {}
    for fidx, fr in enumerate(frames):
        for k, lid in enumerate(fr.ids):
            tr = tracks.get(lid)
            if tr is None:
                tr = packing.FeatureTrack(int(lid), fidx)
                tracks[lid] = tr
            elif tr.end_frame != fidx - 1:
                continue  # non-contiguous: drop later obs
            tr.pts.append(fr.pts[k])
            tr.rows.append(float(fr.rows[k]))

    # ground-truth depths (at first-obs row time)
    R_CtoI = np.asarray(so3.quat_to_matrix(so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot)))))
    p_CinI = np.array(sim.cfg.ext_pos)
    rng = np.random.default_rng(0)
    for lid, tr in tracks.items():
        t_row = kf_t_ns[tr.start_frame] * 1e-9 + tr.rows[0] * sim.cfg.line_delay
        q, p = sim.pose_at(t_row)
        R = np.asarray(so3.quat_to_matrix(jnp.asarray(q)))
        X_c = R_CtoI.T @ (R.T @ (sim.landmarks[lid] - p) - p_CinI)
        tr.estimated_depth = X_c[2] * (1.0 + 0.2 * rng.normal())  # perturbed init

    img, dinv0, cands = packing.pack_image_factors(
        list(tracks.values()), kf_t_ns, cfg.dt, 0, cfg, dtype=np.float64)
    assert img.valid.sum() > 200

    # IMU only inside the optimization horizon (≙ opt_max_time = trajectory
    # max after extending to t_img + 0.04, `trajectory_manager.cpp:324-325,390`)
    t_horizon_ns = int(kf_t_ns[-1] + 0.04e9)
    imu = packing.pack_imu_factors(
        sim.imu_t_ns, sim.gyro, sim.accel, kf_t_ns, 0,
        t_horizon_ns, cfg.dt, 0, cfg, dtype=np.float64)
    bias = packing.bias_sqrt_info(sim.imu_t_ns, kf_t_ns, 2e-5, 4e-4, cfg,
                                  dtype=np.float64)

    # perturbed initial state
    rngj = jax.random.PRNGKey(5)
    kq_gt = jnp.asarray(sim.knots_q[: cfg.KW])
    kp_gt = jnp.asarray(sim.knots_p[: cfg.KW])
    # knots beyond the data horizon are unconstrained -> freeze them
    n_active = int(np.ceil((t_horizon_ns * 1e-9) / cfg.dt)) + 3
    dq = jax.random.normal(rngj, (cfg.KW, 3), dtype=jnp.float64) * 0.02
    dp = jax.random.normal(jax.random.PRNGKey(6), (cfg.KW, 3), dtype=jnp.float64) * 0.02
    # keep the first 4 (gauge-fixing) knots and the frozen tail exact
    dq = dq.at[:4].set(0.0)
    dp = dp.at[:4].set(0.0)
    dq = dq.at[n_active:].set(0.0)
    dp = dp.at[n_active:].set(0.0)
    params0 = WindowParams(
        knots_q=so3.boxplus(kq_gt, dq),
        knots_p=kp_gt + dp,
        bg=jnp.zeros((cfg.NB, 3), dtype=jnp.float64),
        ba=jnp.zeros((cfg.NB, 3), dtype=jnp.float64),
        dinv=jnp.asarray(dinv0),
        ld=jnp.asarray(0.0, dtype=jnp.float64),  # true value 29.47e-6
    )
    fixed = np.zeros(cfg.KW, bool)
    fixed[:4] = True
    fixed[n_active:] = True

    ext = F.CamExtrinsics(
        q_CtoI=so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))),
        p_CinI=jnp.asarray(np.array(sim.cfg.ext_pos)),
    )
    aux = dict(
        ext=ext,
        gravity=jnp.asarray(sim.gravity_vec),
        imu_info=jnp.asarray([250.0] * 3 + [12.5] * 3),
        sqrt_info_img=jnp.asarray(800.0),
        fixed=jnp.asarray(fixed),
        prior=empty_prior(cfg, jnp.float64),
    )
    return cfg, sim, img, imu, bias, params0, kq_gt, kp_gt, aux


def test_linearize_shapes_and_finiteness(problem):
    cfg, sim, img, imu, bias, params0, kq_gt, kp_gt, aux = problem
    opts = SolveOptions()
    lin = assemble.linearize(params0, img, imu, bias, aux["prior"], aux["ext"],
                             aux["gravity"], aux["imu_info"], aux["sqrt_info_img"],
                             cfg, opts)
    assert lin.J.shape == (cfg.n_rows, cfg.C)
    assert np.all(np.isfinite(np.asarray(lin.J)))
    assert np.all(np.isfinite(np.asarray(lin.r)))
    assert float(lin.cost) > 0


def test_chunked_normal_equations_match_dense(problem):
    """The VMEM-resident chunked accumulation must reproduce the dense-row
    path's (H, g, h_ll, g_l, H_cl, cost) — including the hoisted prior and
    column-mask commutation — to float64 roundoff."""
    from ctrlvio_tpu.solver.layout import boxminus_full, column_mask

    cfg, sim, img, imu, bias, params0, kq_gt, kp_gt, aux = problem
    opts = SolveOptions()
    prior = aux["prior"]._replace(
        J=jnp.asarray(np.random.default_rng(3).normal(
            size=(cfg.C, cfg.C)) * 0.05),
        r0=jnp.asarray(np.random.default_rng(4).normal(size=(cfg.C,))))
    cmask = column_mask(cfg, opts, aux["fixed"]).astype(jnp.float64)

    lin = assemble.linearize(params0, img, imu, bias, prior, aux["ext"],
                             aux["gravity"], aux["imu_info"],
                             aux["sqrt_info_img"], cfg, opts)
    H_d, g_d, hll_d, gl_d, Hcl_d = lm.build_normal_equations(lin, cfg, cmask)

    H, g, hll, gl, Hcl, cost = assemble.accumulate_normal_equations(
        params0, img, imu, bias, aux["ext"], aux["gravity"],
        aux["imu_info"], aux["sqrt_info_img"], cfg, opts)
    Pm = prior.J * cmask[None, :]
    dx0 = boxminus_full(params0, prior.knots_q0, prior.knots_p0, prior.bg0,
                        prior.ba0, prior.ld0, cfg)
    H_f = H * cmask[:, None] * cmask[None, :] + Pm.T @ Pm
    g_f = g * cmask + Pm.T @ prior.r0 + (Pm.T @ prior.J) @ dx0
    Hcl_f = Hcl * cmask[None, :]

    scale = float(jnp.max(jnp.abs(H_d))) + 1e-30
    assert float(jnp.max(jnp.abs(H_f - H_d))) / scale < 1e-12
    assert float(jnp.max(jnp.abs(g_f - g_d))) / (
        float(jnp.max(jnp.abs(g_d))) + 1e-30) < 1e-12
    np.testing.assert_allclose(np.asarray(hll), np.asarray(hll_d), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(gl_d),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Hcl_f), np.asarray(Hcl_d),
                               rtol=1e-9, atol=1e-11)
    # factor-only cost + prior quadratic = linearize's robust cost
    r_pr = prior.r0 + prior.J @ dx0
    np.testing.assert_allclose(
        float(cost) + 0.5 * float(jnp.sum(r_pr * r_pr)),
        float(lin.cost), rtol=1e-12)


def test_gauss_newton_direction_reduces_cost(problem):
    cfg, sim, img, imu, bias, params0, kq_gt, kp_gt, aux = problem
    opts = SolveOptions(max_iters=1)
    p1, stats = lm.solve_window(params0, img, imu, bias, aux["prior"],
                                aux["fixed"], aux["ext"], aux["gravity"],
                                aux["imu_info"], aux["sqrt_info_img"], cfg, opts)
    assert float(stats.cost) < float(stats.cost0)


def test_full_ba_recovers_ground_truth(problem):
    cfg, sim, img, imu, bias, params0, kq_gt, kp_gt, aux = problem
    opts = SolveOptions(max_iters=15)
    p, stats = lm.solve_window(params0, img, imu, bias, aux["prior"],
                               aux["fixed"], aux["ext"], aux["gravity"],
                               aux["imu_info"], aux["sqrt_info_img"], cfg, opts)
    assert int(stats.accepted) >= 8

    fixed = np.asarray(aux["fixed"])
    active = ~fixed
    pos_err = np.linalg.norm(np.asarray(p.knots_p - kp_gt)[active], axis=-1)
    pos_err0 = np.linalg.norm(np.asarray(params0.knots_p - kp_gt)[active], axis=-1)
    rot_err = np.linalg.norm(np.asarray(so3.boxminus(p.knots_q, kq_gt))[active], axis=-1)

    assert pos_err.max() < 2e-3, (pos_err.max(), pos_err0.max())
    assert rot_err.max() < 2e-3

    # line delay recovered from 0 -> ~29.47 us
    ld_est = float(p.ld)
    assert abs(ld_est - sim.cfg.line_delay) < 1.5e-6, ld_est

    # biases stay near zero (GT has none)
    assert np.abs(np.asarray(p.bg)).max() < 5e-3
    assert np.abs(np.asarray(p.ba)).max() < 5e-2


def test_ba_with_fixed_ld(problem):
    """Global-shutter-mode equivalence check (BASELINE config 3): with ld
    fixed at truth the solve converges at least as tightly."""
    cfg, sim, img, imu, bias, params0, kq_gt, kp_gt, aux = problem
    opts = SolveOptions(max_iters=10, fix_ld=True)
    p0 = params0._replace(ld=jnp.asarray(sim.cfg.line_delay, dtype=jnp.float64))
    p, stats = lm.solve_window(p0, img, imu, bias, aux["prior"], aux["fixed"],
                               aux["ext"], aux["gravity"], aux["imu_info"],
                               aux["sqrt_info_img"], cfg, opts)
    assert float(p.ld) == sim.cfg.line_delay  # untouched
    fixed = np.asarray(aux["fixed"])
    pos_err = np.linalg.norm(np.asarray(p.knots_p - kp_gt)[~fixed], axis=-1)
    assert pos_err.max() < 2e-3
