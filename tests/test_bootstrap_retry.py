"""Bootstrap rejection + retry: a rolling-shutter-distorted window can pass
the SfM quality gates yet leave the first-window BA stuck in a bad basin
(round-2 reproducer: cost plateau ~1.5e3 vs the ~1e-7 of a good window, then
full divergence). The estimator must reject such inits on the BA residual-RMS
gate and retry with a later window — ≙ the reference's retry-every-frame
init loop (`vio_initial.cpp:42-56`).

The round-2 natural reproducer (seed-3 window) no longer fails — the SfM
triangulation depth/cheirality gates and PnP singularity guards added in
round 3 fix that basin at its source — so the rejection MACHINERY is now
exercised by injecting a stuck solve (inflated cost) into the first init
attempt, and the natural sequence doubles as a no-false-reject check."""

import jax.numpy as jnp
import numpy as np
import pytest

from ctrlvio_tpu.estimator.odometry import CtrlVIO, VIOConfig
from ctrlvio_tpu.ops import so3
from ctrlvio_tpu.sim import synthetic
from ctrlvio_tpu.solver.layout import WindowConfig


def _build(sim):
    cfg = VIOConfig(
        window_config=WindowConfig(KW=32, NB=11, LM=256, OBS=768, MIMU=256),
        fix_ld=False, ld_init=0.0, dtype=np.float64, bootstrap="visual")
    q_CtoI = np.asarray(so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))))
    return CtrlVIO(cfg, q_CtoI, np.array(sim.cfg.ext_pos))


@pytest.mark.slow
def test_bad_window_rejected_then_recovers():
    sim = synthetic.generate(synthetic.SimConfig(
        duration=16.0, n_landmarks=300, seed=3))
    vio = _build(sim)

    resets = [0]
    orig_reset = vio._reset_bootstrap

    def counting_reset():
        resets[0] += 1
        orig_reset()

    vio._reset_bootstrap = counting_reset

    # inject a stuck first-window BA (what a bad RS-distorted basin looks
    # like to the gate: residuals far above the measurement sigma)
    orig_solve = vio._init_solve_f64
    injected = [0]

    def stuck_once():
        n_obs = orig_solve()
        if injected[0] == 0:
            injected[0] += 1
            vio.last_solve_stats.cost = 25.0 * 2 * n_obs  # RMS ~7 sigma
        return n_obs

    vio._init_solve_f64 = stuck_once

    imu_idx = 0
    for i, fr in enumerate(sim.frames[:50]):
        while imu_idx < len(sim.imu_t_ns) and \
                sim.imu_t_ns[imu_idx] <= fr.t_ns:
            vio.process_imu(sim.imu_t_ns[imu_idx], sim.gyro[imu_idx],
                            sim.accel[imu_idx])
            imu_idx += 1
        vio.process_frame(fr.t_ns, fr.ids, fr.pts, fr.rows)

    assert injected[0] == 1, "stuck solve was never injected"
    assert resets[0] >= 1, "bad window was not rejected"
    assert vio.initialized, "bootstrap never recovered after rejection"
    # post-recovery solve is healthy: line delay calibrated, cost tiny —
    # i.e. the healthy retry was NOT falsely rejected by the RMS gate
    assert abs(vio.traj.line_delay - sim.cfg.line_delay) < 2e-6
    assert vio.last_solve_stats.cost < 1.0
