"""Visual-inertial initialization on synthetic data WITHOUT ground-truth
bootstrap: the SfM + alignment must recover gravity direction, gyro bias,
metric scale, and a usable initial state."""

import numpy as np
import pytest

from ctrlvio_tpu.ops import so3
from ctrlvio_tpu.sim import synthetic
from ctrlvio_tpu.estimator import vio_init
import jax.numpy as jnp


@pytest.fixture(scope="module")
def sim():
    # global-shutter-ish (tiny ld) to keep the init test focused; the CT
    # solver handles RS afterwards (the reference's init also ignores RS)
    return synthetic.generate(synthetic.SimConfig(
        duration=4.0, n_landmarks=200, seed=21, line_delay=1e-7,
        gyro_bias=0.01))


def test_sfm_and_alignment_recover_state(sim):
    q_CtoI = np.asarray(so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))))
    ini = vio_init.VIOInitializer(q_CtoI, np.array(sim.cfg.ext_pos),
                                  gravity_mag=sim.cfg.gravity)
    imu_idx = 0
    out = None
    for fr in sim.frames:
        while imu_idx < len(sim.imu_t_ns) and sim.imu_t_ns[imu_idx] <= fr.t_ns:
            ini.feed_imu(sim.imu_t_ns[imu_idx], sim.gyro[imu_idx],
                         sim.accel[imu_idx])
            imu_idx += 1
        out = ini.feed_frame(fr.t_ns, fr.ids, fr.pts)
        if out is not None:
            break
    assert out is not None, "initialization never succeeded"

    # gyro bias recovered
    np.testing.assert_allclose(out.bg, sim.bg, atol=2e-3)

    # gravity-aligned orientation: the recovered world differs from the sim
    # world by a yaw rotation only -> pitch/roll of q must match GT up to yaw
    q_gt, p_gt = sim.pose_at(out.t_ns * 1e-9)
    R_est = vio_init._quat_to_R(out.q)
    R_gt = vio_init._quat_to_R(np.asarray(q_gt))
    # gravity direction in body frame must agree
    g_body_est = R_est.T @ np.array([0, 0, 1.0])
    g_body_gt = R_gt.T @ np.array([0, 0, 1.0])
    assert np.degrees(np.arccos(np.clip(g_body_est @ g_body_gt, -1, 1))) < 2.0

    # metric scale: speed magnitude matches GT within 10%
    from ctrlvio_tpu.sim.synthetic import grid_coords
    from ctrlvio_tpu.ops import spline as spl

    i0, u = grid_coords(out.t_ns * 1e-9, sim.cfg.knot_dt)
    v_gt = np.asarray(spl.rd_eval(jnp.asarray(sim.knots_p[i0:i0 + 4]),
                                  jnp.asarray(u), 1.0 / sim.cfg.knot_dt, 1))
    assert abs(np.linalg.norm(out.v) - np.linalg.norm(v_gt)) < 0.1 * max(
        np.linalg.norm(v_gt), 0.3)
