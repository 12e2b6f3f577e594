"""Long-horizon f32 stream soak UNDER REFERENCE-LEVEL SENSOR NOISE: the
device-precision (f32) streaming pipeline must not accumulate drift against
the f64 synchronous path over many window lengths — the regime where f32
marginalization-prior errors compound (≙ the recursion
`marginalization_factor.cpp:254-263`, whose float behavior is this build's
biggest numerical risk; the QR square-root prior
`solver/marginalize.py::build_prior_sqrt` is the mitigation).

Noise is injected at the reference's configured operating point
(σ_g=4e-3, σ_a=8e-2, ~1 px; `config/ct_odometry_tumrs.yaml:16-20`) — the
condition its noise-weighted estimation machinery exists for — and the
line delay must still calibrate online from 0. This is also the suite's
ld-convergence-under-noise gate (VERDICT r3 ask #1).

CPU-sized here (~14 s, ~4.4x the window span); the full 120 s / 1200-frame
soak runs on TPU via `python bench.py --duration 120` (recorded in
PARITY.md §Performance)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ctrlvio_tpu.estimator.initializer import bootstrap_from_sim
from ctrlvio_tpu.estimator.odometry import CtrlVIO, VIOConfig
from ctrlvio_tpu.ops import so3
from ctrlvio_tpu.sim import synthetic
from ctrlvio_tpu.solver.layout import WindowConfig
from ctrlvio_tpu.utils.ate import ate_rmse

DURATION = 11.0  # ~3.4x the window span; the 120 s TPU soak is bench.py's


def _run(stream: bool, dtype, sim=None, n_frames=None):
    if sim is None:
        sim = synthetic.generate(synthetic.reference_noise(
            duration=DURATION, n_landmarks=250, seed=21))
    cfg = VIOConfig(
        window_config=WindowConfig(KW=32, NB=11, LM=192, OBS=768, MIMU=256),
        fix_ld=False, ld_init=0.0, dtype=dtype, stream=stream,
        stream_lag=4, stream_warmup=12)
    q_CtoI = np.asarray(so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))))
    vio = CtrlVIO(cfg, q_CtoI, np.array(sim.cfg.ext_pos))
    init = bootstrap_from_sim(sim)
    for k in range(len(sim.imu_t_ns)):
        vio.process_imu(sim.imu_t_ns[k], sim.gyro[k], sim.accel[k])
    vio.set_initial_state(init.t_ns, init.q, init.p, init.bg, init.ba,
                          init.gravity, v0=init.v)
    t_frames, online = [], []
    for fr in sim.frames[:n_frames]:
        out = vio.process_frame(fr.t_ns, fr.ids, fr.pts, fr.rows)
        if out is not None:
            t_frames.append(fr.t_ns)
            online.append(out[1])
    vio.flush()
    gt = np.stack([sim.pose_at(t * 1e-9)[1] for t in t_frames])
    return sim, vio, np.asarray(online), gt


@pytest.mark.slow
def test_f32_stream_soak_no_compounding_drift():
    sim, vio32, est32, gt = _run(stream=True, dtype=np.float32)
    # absolute gate over the whole horizon (post lag ramp)
    err = np.linalg.norm(est32[10:] - gt[10:], axis=1)
    assert err.max() < 0.15, f"max err {err.max():.3f} m"
    # NO COMPOUNDING: late-horizon error must not blow up vs mid-horizon.
    # (A corrupted f32 prior random-walks: late/mid ratios reach 10-100x —
    # the 198 cm H-form failure; QR sqrt holds this ratio ~1.)
    n = len(err)
    mid = np.sqrt((err[n // 4 : n // 2] ** 2).mean())
    late = np.sqrt((err[3 * n // 4 :] ** 2).mean())
    assert late < 4.0 * mid + 0.02, f"drift compounds: mid {mid:.4f} m " \
        f"-> late {late:.4f} m"
    # line delay stays converged at the end of the horizon
    assert abs(vio32.traj.line_delay - sim.cfg.line_delay) < 2e-6

    # f32 stream matches the f64 sync oracle (same frozen early transient
    # in both, so compare to each other). The oracle replays the SAME sim
    # truncated to a ~6 s prefix — enough to catch gross f32 prior bias
    # (which appears within a window span or two) at roughly half the
    # test's cost; the long-horizon compounding gates above run on the
    # full f32 horizon.
    _, _, est64, _ = _run(stream=False, dtype=np.float64, sim=sim,
                          n_frames=60)
    n64 = len(est64)
    gap = ate_rmse(est32[10:n64], est64[10:], align="none")
    assert gap < 0.05, f"f32-stream vs f64-sync gap {gap:.4f} m"
