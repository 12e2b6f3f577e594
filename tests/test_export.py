"""Trajectory export + checkpoint/resume."""

import numpy as np
import pytest

from ctrlvio_tpu.utils import export


def _make_vio(duration=3.0, seed=19):
    import jax.numpy as jnp

    from ctrlvio_tpu.estimator.initializer import bootstrap_from_sim
    from ctrlvio_tpu.estimator.odometry import CtrlVIO, VIOConfig
    from ctrlvio_tpu.ops import so3
    from ctrlvio_tpu.sim import synthetic
    from ctrlvio_tpu.solver.layout import WindowConfig

    sim = synthetic.generate(synthetic.SimConfig(duration=duration,
                                                 n_landmarks=150, seed=seed))
    cfg = VIOConfig(window_config=WindowConfig(KW=48, NB=11, LM=128, OBS=768,
                                               MIMU=512),
                    dtype=np.float64)
    q_CtoI = np.asarray(so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))))
    vio = CtrlVIO(cfg, q_CtoI, np.array(sim.cfg.ext_pos))
    init = bootstrap_from_sim(sim)
    for k in range(len(sim.imu_t_ns)):
        vio.process_imu(sim.imu_t_ns[k], sim.gyro[k], sim.accel[k])
    vio.set_initial_state(init.t_ns, init.q, init.p, init.bg, init.ba,
                          init.gravity, v0=init.v)
    return sim, vio


@pytest.mark.slow
def test_export_and_checkpoint_roundtrip(tmp_path):
    sim, vio = _make_vio()
    n_frames = 14
    for fr in sim.frames[:n_frames]:
        vio.process_frame(fr.t_ns, fr.ids, fr.pts, fr.rows)
    assert vio.initialized

    # TUM export
    p = str(tmp_path / "traj.tum")
    export.export_vio_trajectory(p, vio)
    lines = open(p).read().strip().splitlines()
    assert len(lines) > 20
    vals = np.asarray([[float(x) for x in l.split()] for l in lines[1:]])
    assert vals.shape[1] == 8
    assert np.all(np.isfinite(vals))

    # checkpoint -> fresh instance -> resume produces identical poses
    ck = str(tmp_path / "state.npz")
    export.save_checkpoint(ck, vio)
    _, vio2 = _make_vio()
    export.load_checkpoint(ck, vio2)
    q1, p1 = vio.traj.pose(vio.kf_t_ns[:11])
    q2, p2 = vio2.traj.pose(vio2.kf_t_ns[:11])
    np.testing.assert_allclose(p1, p2, atol=1e-12)
    assert vio2.traj.line_delay == vio.traj.line_delay
    assert vio2.prior is not None
