"""End-to-end replay through the device-resident STREAMING pipeline
(`estimator/stream.py`): the megastep-chained estimator (on-device QR
marginalization, lagged asynchronous summaries) must converge to the same
trajectory as the synchronous path and calibrate the line delay online.

On CPU the stream brings no speed benefit (no tunnel RTT) but exercises the
exact program the TPU runs — merge, solve, gauge, sqrt marg, in-graph slide,
depth handoff, lag bookkeeping."""

import jax.numpy as jnp
import numpy as np
import pytest

from ctrlvio_tpu.estimator.initializer import bootstrap_from_sim
from ctrlvio_tpu.estimator.odometry import CtrlVIO, VIOConfig
from ctrlvio_tpu.ops import so3
from ctrlvio_tpu.sim import synthetic
from ctrlvio_tpu.solver.layout import WindowConfig
from ctrlvio_tpu.utils.ate import ate_rmse


def _run(stream: bool, duration=5.0, seed=11, dtype=np.float64):
    sim = synthetic.generate(synthetic.SimConfig(
        duration=duration, n_landmarks=250, seed=seed))
    cfg = VIOConfig(
        window_config=WindowConfig(KW=32, NB=11, LM=192, OBS=768, MIMU=256),
        fix_ld=False, ld_init=0.0, dtype=dtype, stream=stream, stream_lag=4,
        stream_warmup=8)  # short warmup: exercise the streamed megastep path
    q_CtoI = np.asarray(so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))))
    vio = CtrlVIO(cfg, q_CtoI, np.array(sim.cfg.ext_pos))
    init = bootstrap_from_sim(sim)
    for k in range(len(sim.imu_t_ns)):
        vio.process_imu(sim.imu_t_ns[k], sim.gyro[k], sim.accel[k])
    vio.set_initial_state(init.t_ns, init.q, init.p, init.bg, init.ba,
                          init.gravity, v0=init.v)
    t_frames, online = [], []
    for fr in sim.frames:
        out = vio.process_frame(fr.t_ns, fr.ids, fr.pts, fr.rows)
        if out is not None:
            t_frames.append(fr.t_ns)
            online.append(out[1])
    vio.flush()
    final = np.stack([vio.traj.pose(t)[1][0] for t in t_frames])
    gt = np.stack([sim.pose_at(t * 1e-9)[1] for t in t_frames])
    return sim, vio, np.asarray(online), final, gt


@pytest.mark.slow
def test_stream_matches_sync_and_calibrates():
    sim, vio_s, online, final_s, gt = _run(stream=True)
    # line delay calibrated online from 0 (device-resident scalar)
    assert abs(vio_s.traj.line_delay - sim.cfg.line_delay) < 1.5e-6, \
        vio_s.traj.line_delay
    # the online (forecast) estimate tracks within the bench gate after the
    # lag ramp opens
    err_on = ate_rmse(online[10:], gt[10:], align="yaw")
    assert err_on < 0.10, f"online ATE {err_on:.4f} m"
    # keyframe export happens at summary consumption
    assert len(vio_s.keyframes) >= 10

    # the final trajectory matches the synchronous path's (same algorithm,
    # different execution schedule). Both carry the same frozen early
    # calibration transient, so compare to each other, not to gt.
    _, _, _, final_ref, _ = _run(stream=False)
    d = np.linalg.norm(final_s - final_ref, axis=1)
    assert d[5:].max() < 0.02, d.max()
