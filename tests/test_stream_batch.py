"""Batched multi-sequence streaming (BASELINE config 5): B estimators in
lockstep through ONE vmapped megastep must each converge like a solo run."""

import jax.numpy as jnp
import numpy as np
import pytest

from ctrlvio_tpu.estimator.initializer import bootstrap_from_sim
from ctrlvio_tpu.estimator.odometry import CtrlVIO, VIOConfig
from ctrlvio_tpu.ops import so3
from ctrlvio_tpu.parallel.stream_batch import BatchedStream
from ctrlvio_tpu.sim import synthetic
from ctrlvio_tpu.solver.layout import WindowConfig
from ctrlvio_tpu.utils.ate import ate_rmse

CFG = dict(window_config=WindowConfig(KW=32, NB=11, LM=192, OBS=768,
                                      MIMU=256),
           fix_ld=False, ld_init=0.0, dtype=np.float64, stream=True,
           stream_lag=3, stream_warmup=6)


def _make(sim):
    q_CtoI = np.asarray(so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))))
    vio = CtrlVIO(VIOConfig(**CFG), q_CtoI, np.array(sim.cfg.ext_pos))
    init = bootstrap_from_sim(sim)
    for k in range(len(sim.imu_t_ns)):
        vio.process_imu(sim.imu_t_ns[k], sim.gyro[k], sim.accel[k])
    vio.set_initial_state(init.t_ns, init.q, init.p, init.bg, init.ba,
                          init.gravity, v0=init.v)
    return vio


@pytest.mark.slow
def test_batched_stream_matches_solo():
    sims = [synthetic.generate(synthetic.SimConfig(
        duration=4.5, n_landmarks=250, seed=s)) for s in (11, 12)]
    n_frames = min(len(s.frames) for s in sims)

    vios = [_make(s) for s in sims]
    coord = BatchedStream(vios)
    for k in range(n_frames):
        coord.step([(s.frames[k].t_ns, s.frames[k].ids, s.frames[k].pts,
                     s.frames[k].rows) for s in sims])
    coord.flush()

    solo = _make(sims[0])
    for k in range(n_frames):
        fr = sims[0].frames[k]
        solo.process_frame(fr.t_ns, fr.ids, fr.pts, fr.rows)
    solo.flush()

    for vio, sim in zip(vios, sims):
        assert abs(vio.traj.line_delay - sim.cfg.line_delay) < 1.5e-6, \
            vio.traj.line_delay
        t_eval = [f.t_ns for f in sim.frames[12:n_frames]]
        est = np.stack([vio.traj.pose(t)[1][0] for t in t_eval])
        gt = np.stack([sim.pose_at(t * 1e-9)[1] for t in t_eval])
        assert ate_rmse(est, gt, align="yaw") < 0.25

    # lane 0 equals the solo stream run (same inputs, same program modulo
    # batched-reduction rounding)
    t_eval = [f.t_ns for f in sims[0].frames[5:n_frames]]
    p_lane = np.stack([vios[0].traj.pose(t)[1][0] for t in t_eval])
    p_solo = np.stack([solo.traj.pose(t)[1][0] for t in t_eval])
    assert np.abs(p_lane - p_solo).max() < 1e-5, \
        np.abs(p_lane - p_solo).max()
