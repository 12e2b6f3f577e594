"""Anti-inverse-crime GT families (sim/synthetic.py gt_family/gt_knot_dt).

The estimator fits an order-4 B-spline at 0.05 s; validating only against
GT drawn from that same family is self-validation. These tests check that
(a) the out-of-class generators are internally consistent (their IMU
measurements really are the derivatives of their camera poses), and (b) the
full pipeline still tracks them — with GT the estimator's basis cannot
represent exactly (VERDICT r4 ask #5)."""

import numpy as np
import pytest

from ctrlvio_tpu.ops import so3np
from ctrlvio_tpu.sim import synthetic


def _finite_diff_check(sim, n=40):
    """IMU channels must equal pose derivatives: w_body vs dq/dt and
    accel vs d2p/dt2 (both via f64 central differences of the exact GT)."""
    ts = np.linspace(0.5, sim.cfg.duration - 0.5, n)
    q, p, w, acc = sim.poses_at(ts)
    h = 1e-4
    _, p_hi, _, _ = sim.poses_at(ts + h)
    _, p_lo, _, _ = sim.poses_at(ts - h)
    acc_fd = (p_hi - 2 * p + p_lo) / h**2
    assert np.max(np.abs(acc_fd - acc)) < 5e-3, "accel != d2p/dt2"
    q_hi = sim.poses_at(ts + h)[0]
    q_lo = sim.poses_at(ts - h)[0]
    dq = (q_hi - q_lo) / (2 * h)
    w_fd = 2.0 * so3np.quat_mul(so3np.quat_conj(q), dq)[:, 1:]
    assert np.max(np.abs(w_fd - w)) < 5e-4, "w_body != 2 vec(q* dq/dt)"


def test_lissajous_consistency():
    sim = synthetic.generate(synthetic.SimConfig(
        duration=4.0, n_landmarks=250, seed=2, gt_family="lissajous"))
    _finite_diff_check(sim)
    # dynamics in the handheld envelope (render/visibility assumptions)
    assert np.linalg.norm(sim.gyro, axis=1).max() < 4.0
    assert np.linalg.norm(sim.accel, axis=1).max() < 30.0
    assert all(len(f.ids) > 10 for f in sim.frames)


def test_fine_knot_consistency():
    sim = synthetic.generate(synthetic.SimConfig(
        duration=4.0, n_landmarks=80, seed=2, gt_knot_dt=0.01))
    _finite_diff_check(sim)
    assert np.linalg.norm(sim.accel, axis=1).max() < 30.0, \
        "fine-knot GT must stay physically handheld-like"
    # knots really live on the fine grid
    assert len(sim.knots_q) > 4.0 / 0.012


def test_default_family_unchanged():
    """gt_knot_dt=None keeps the historical generator bit-identical (every
    recorded benchmark / exactness test depends on these sequences)."""
    a = synthetic.generate(synthetic.SimConfig(
        duration=2.0, n_landmarks=40, seed=7))
    b = synthetic.generate(synthetic.SimConfig(
        duration=2.0, n_landmarks=40, seed=7, gt_family="spline",
        gt_knot_dt=None, speed=1.0))
    np.testing.assert_array_equal(a.knots_q, b.knots_q)
    np.testing.assert_array_equal(a.gyro, b.gyro)
    np.testing.assert_array_equal(a.frames[3].pts, b.frames[3].pts)


@pytest.mark.slow
@pytest.mark.parametrize("kw", [dict(gt_family="lissajous"),
                                dict(gt_knot_dt=0.01)])
def test_e2e_out_of_class_gt(kw):
    """Full pipeline on out-of-model-class GT (noiseless, f64): ATE must
    hold at the sub-cm level even though the basis can't represent GT."""
    import jax.numpy as jnp

    from ctrlvio_tpu.estimator.initializer import bootstrap_from_sim
    from ctrlvio_tpu.estimator.odometry import CtrlVIO, VIOConfig
    from ctrlvio_tpu.ops import so3
    from ctrlvio_tpu.solver.layout import WindowConfig
    from ctrlvio_tpu.utils.ate import ate_rmse

    sim = synthetic.generate(synthetic.SimConfig(
        duration=5.0, n_landmarks=250, seed=11, **kw))
    cfg = VIOConfig(
        window_config=WindowConfig(KW=32, NB=11, LM=256, OBS=768, MIMU=256),
        fix_ld=False, ld_init=0.0, dtype=np.float64)
    q_CtoI = np.asarray(so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))))
    vio = CtrlVIO(cfg, q_CtoI, np.array(sim.cfg.ext_pos))
    init = bootstrap_from_sim(sim)
    for k in range(len(sim.imu_t_ns)):
        vio.process_imu(sim.imu_t_ns[k], sim.gyro[k], sim.accel[k])
    vio.set_initial_state(init.t_ns, init.q, init.p, init.bg, init.ba,
                          init.gravity, v0=init.v)
    est, gt = [], []
    for fr in sim.frames:
        out = vio.process_frame(fr.t_ns, fr.ids, fr.pts, fr.rows)
        if out is not None:
            est.append(out[1])
            gt.append(sim.pose_at(fr.t_ns * 1e-9)[1])
    err = ate_rmse(np.asarray(est)[10:], np.asarray(gt)[10:], align="yaw")
    assert err < 0.01, f"ATE {err * 100:.2f} cm on out-of-class GT"
    assert abs(vio.traj.line_delay - sim.cfg.line_delay) < 1.5e-6
