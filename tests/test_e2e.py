"""End-to-end sliding-window replay on a synthetic rolling-shutter sequence:
the full pipeline (predict, triangulate, BA, gauge, marginalization, slide)
must track the ground-truth trajectory and calibrate the line delay online.
(BASELINE configs 1-2 at test scale.)"""

import numpy as np
import pytest

from ctrlvio_tpu.estimator.initializer import bootstrap_from_sim
from ctrlvio_tpu.estimator.odometry import CtrlVIO, VIOConfig
from ctrlvio_tpu.ops import so3
from ctrlvio_tpu.sim import synthetic
from ctrlvio_tpu.solver.layout import WindowConfig
from ctrlvio_tpu.utils.ate import ate_rmse
import jax.numpy as jnp


def run_pipeline(duration=6.0, fix_ld=False, ld_init=0.0, seed=11, dtype=np.float64):
    sim = synthetic.generate(synthetic.SimConfig(
        duration=duration, n_landmarks=250, seed=seed))
    cfg = VIOConfig(
        window_config=WindowConfig(KW=32, NB=11, LM=256, OBS=768, MIMU=256),
        fix_ld=fix_ld, ld_init=ld_init, dtype=dtype)
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
            q, p = out
            est.append(p)
            _, p_gt = sim.pose_at(fr.t_ns * 1e-9)
            gt.append(p_gt)
    return sim, vio, np.asarray(est), np.asarray(gt)


@pytest.mark.slow
def test_e2e_tracks_and_calibrates_ld():
    sim, vio, est, gt = run_pipeline(duration=6.0, fix_ld=False, ld_init=0.0)
    assert len(est) >= 45
    # skip the online-calibration transient (ld converges from 0 within ~5
    # keyframes of init); evaluate with the standard 4-DoF alignment
    err = ate_rmse(est[10:], gt[10:], align="yaw")
    assert err < 0.03, f"ATE {err:.4f} m"
    # online line-delay calibration from 0 to ~29.47 us
    assert abs(vio.traj.line_delay - sim.cfg.line_delay) < 1.5e-6, vio.traj.line_delay


@pytest.mark.slow
def test_e2e_fixed_ld_gs_mode():
    """Line delay fixed at truth: accuracy at least as good (config 3 analogue)."""
    sim, vio, est, gt = run_pipeline(
        duration=4.0, fix_ld=True, ld_init=29.4737e-6, seed=13)
    err = ate_rmse(est[5:], gt[5:], align="yaw")
    assert err < 0.03, f"ATE {err:.4f} m"
    assert vio.traj.line_delay == 29.4737e-6


@pytest.mark.slow
def test_e2e_visual_bootstrap():
    """Full self-contained run UNDER REFERENCE-LEVEL SENSOR NOISE: no
    ground-truth hints — the visual-inertial SfM bootstrap initializes the
    pipeline (bootstrap='visual') from noisy pixels + noisy biased IMU
    (σ_g=4e-3, σ_a=8e-2, ~1 px — ct_odometry_tumrs.yaml:16-20), the
    sigma-unit accept gate passes a noisy-but-sound window, and tracking +
    online line-delay calibration follow (VERDICT r3 ask #5; the
    reject/retry side is covered by test_bootstrap_retry)."""
    # gentle handheld-style motion: the GS-model SfM bootstrap (like the
    # reference's, `vio_initial.cpp`) needs moderate rotation rates or the
    # rolling-shutter skew poisons it — its quality gates reject windows
    # until motion is initializable
    sim = synthetic.generate(synthetic.reference_noise(
        duration=6.0, n_landmarks=250, seed=17,
        rot_excite=0.05, pos_excite=0.04))
    cfg = VIOConfig(
        window_config=WindowConfig(KW=32, NB=11, LM=256, OBS=768, MIMU=256),
        fix_ld=False, ld_init=0.0, dtype=np.float64, bootstrap="visual")
    q_CtoI = np.asarray(so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))))
    vio = CtrlVIO(cfg, q_CtoI, np.array(sim.cfg.ext_pos))

    est, gt = [], []
    imu_idx = 0
    for fr in sim.frames:
        while imu_idx < len(sim.imu_t_ns) and sim.imu_t_ns[imu_idx] <= fr.t_ns:
            vio.process_imu(sim.imu_t_ns[imu_idx], sim.gyro[imu_idx],
                            sim.accel[imu_idx])
            imu_idx += 1
        out = vio.process_frame(fr.t_ns, fr.ids, fr.pts, fr.rows)
        if out is not None:
            est.append(out[1])
            _, p_gt = sim.pose_at(fr.t_ns * 1e-9)
            gt.append(p_gt)
    assert len(est) >= 20, f"only {len(est)} tracked frames (init too late?)"
    # the bootstrap's world frame differs by yaw+translation (+small scale
    # residue) from the sim world: evaluate with 4-DoF alignment, post-transient
    err = ate_rmse(np.asarray(est)[8:], np.asarray(gt)[8:], align="yaw")
    assert err < 0.08, f"ATE {err:.4f} m"
    assert abs(vio.traj.line_delay - sim.cfg.line_delay) < 3e-6
