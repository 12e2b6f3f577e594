"""Image-driven end-to-end: rendered rolling-shutter frames through the
full pipeline CLAHE -> pyramidal KLT -> undistort -> sliding-window BA with
online line-delay calibration. This is the in-repo stand-in for a TUM-RSVI
bag replay (raw imagery in, trajectory out) — ≙ the reference's in-process
tracker call chain `odometry_manager.h:70-73` ->
`feature_tracker_node.cpp:55-207` -> `PerformCtrlVIO`."""

import jax.numpy as jnp
import numpy as np
import pytest

from ctrlvio_tpu.estimator.initializer import bootstrap_from_sim
from ctrlvio_tpu.estimator.odometry import CtrlVIO, VIOConfig
from ctrlvio_tpu.frontend.tracker import TrackerConfig
from ctrlvio_tpu.models.cameras import Pinhole
from ctrlvio_tpu.ops import so3
from ctrlvio_tpu.sim import render, synthetic
from ctrlvio_tpu.solver.layout import WindowConfig
from ctrlvio_tpu.utils.ate import ate_rmse

H, W, FX, CX, CY = 256, 320, 200.0, 160.0, 128.0
# scale the line delay so the total readout (H * ld ~ 29 ms) matches the
# TUM-RSVI sensor's at this reduced resolution
LD = 1.15e-4


@pytest.mark.slow
def test_image_pipeline_tracks_and_calibrates():
    sim = synthetic.generate(synthetic.SimConfig(
        duration=4.0, n_landmarks=600, seed=5, line_delay=LD,
        image_h=H, image_w=W, fx=FX, fy=FX, cx=CX, cy=CY))
    imgs = render.render_sequence(sim, H, W, FX, FX, CX, CY, seed=1)

    cam = Pinhole(FX, FX, CX, CY)
    cfg = VIOConfig(
        window_config=WindowConfig(KW=32, NB=11, LM=192, OBS=768, MIMU=256),
        fix_ld=False, ld_init=0.0, ld_upper=2e-4, dtype=np.float64)
    q_CtoI = np.asarray(so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))))
    vio = CtrlVIO(cfg, q_CtoI, np.array(sim.cfg.ext_pos))
    vio.attach_frontend(cam, (H, W),
                        TrackerConfig(max_cnt=110, min_dist=12, freq=11.0))

    init = bootstrap_from_sim(sim)
    for k in range(len(sim.imu_t_ns)):
        vio.process_imu(sim.imu_t_ns[k], sim.gyro[k], sim.accel[k])
    vio.set_initial_state(init.t_ns, init.q, init.p, init.bg, init.ba,
                          init.gravity, v0=init.v)

    est, gt, nfeat = [], [], []
    for i, fr in enumerate(sim.frames):
        out = vio.process_image(fr.t_ns, imgs[i])
        nfeat.append(int((vio.tracker.ids >= 0).sum()))
        if out is not None:
            est.append(out[1])
            gt.append(sim.pose_at(fr.t_ns * 1e-9)[1])

    assert len(est) >= 20
    assert min(nfeat[2:]) >= 40, nfeat  # tracker keeps a healthy feature set
    err = ate_rmse(np.asarray(est)[8:], np.asarray(gt)[8:], align="yaw")
    assert err < 0.15, f"ATE {err:.3f} m"
    # line delay calibrated online from 0 using KLT-tracked features only
    assert abs(vio.traj.line_delay - LD) < 1e-5, vio.traj.line_delay
