"""IMU capacity policy: the reference uses every sample in the window
(`trajectory_manager.cpp:388-416`), so exceeding the static MIMU capacity
must fail loudly by default (silent subsampling only by explicit opt-in)."""

import numpy as np
import pytest

from ctrlvio_tpu.estimator import packing
from ctrlvio_tpu.solver.layout import WindowConfig


def _data(n):
    t = np.arange(n, dtype=np.int64) * 5_000_000  # 200 Hz
    g = np.zeros((n, 3))
    a = np.zeros((n, 3))
    kf = np.linspace(0, t[-1], 11).astype(np.int64)
    return t, g, a, kf


def test_overflow_raises_by_default():
    cfg = WindowConfig(KW=32, NB=11, LM=8, OBS=8, MIMU=64)
    t, g, a, kf = _data(200)
    with pytest.raises(RuntimeError, match="MIMU"):
        packing.pack_imu_factors(t, g, a, kf, 0, int(t[-1]) + 1, 0.05, 0, cfg)


def test_overflow_subsample_opt_in():
    cfg = WindowConfig(KW=32, NB=11, LM=8, OBS=8, MIMU=64)
    t, g, a, kf = _data(200)
    imu = packing.pack_imu_factors(t, g, a, kf, 0, int(t[-1]) + 1, 0.05, 0,
                                   cfg, on_overflow="subsample")
    assert imu.valid.sum() == 64


def test_within_capacity_keeps_every_sample():
    cfg = WindowConfig(KW=32, NB=11, LM=8, OBS=8, MIMU=256)
    t, g, a, kf = _data(200)
    imu = packing.pack_imu_factors(t, g, a, kf, 0, int(t[-1]) + 1, 0.05, 0,
                                   cfg)
    assert imu.valid.sum() == 200


def _tracks(n, n_frames=5):
    trs = []
    for i in range(n):
        tr = packing.FeatureTrack(i, 0)
        tr.pts = [np.array([0.1 * i, 0.0]) for _ in range(n_frames)]
        tr.rows = [0.0] * n_frames
        trs.append(tr)
    return trs


def test_landmark_overflow_warns_loudly(caplog):
    """Dropping whole landmarks must never be silent (the reference holds
    NUM_OF_F = 2000 slots, `parameters.h:10`)."""
    import logging

    cfg = WindowConfig(KW=32, NB=11, LM=8, OBS=256, MIMU=64)
    kf = np.linspace(0, 5e8, 11).astype(np.int64)
    with caplog.at_level(logging.WARNING):
        fa, dinv, cands = packing.pack_image_factors(_tracks(12), kf, 0.05, 0, cfg)
    assert len(cands) == 8
    assert any("landmark capacity" in r.message for r in caplog.records)
    # within capacity: no warning
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        packing.pack_image_factors(_tracks(8), kf, 0.05, 0, cfg)
    assert not any("landmark capacity" in r.message for r in caplog.records)


def test_landmark_overflow_warns_loudly_native(caplog):
    """The C++ packing path reports the untruncated candidate count and the
    wrapper warns (same policy as the python path)."""
    import logging

    from ctrlvio_tpu.estimator import native

    if not native.available():
        pytest.skip("native host library unavailable")
    cfg = WindowConfig(KW=32, NB=11, LM=8, OBS=256, MIMU=64)
    ft = native.NativeFeatureTable(10)
    for f in range(5):
        ids = np.arange(12, dtype=np.int64)
        pts = np.stack([0.1 * ids, np.zeros(12)], axis=1)
        ft.add_frame(f, ids, pts, np.zeros(12))
    kf = np.linspace(0, 5e8, 11).astype(np.int64)
    with caplog.at_level(logging.WARNING):
        fa, dinv, ncand = ft.pack_image_factors(kf, 0.05, 0, cfg)
    assert ncand == 8
    assert any("landmark capacity" in r.message for r in caplog.records)


def test_auto_landmark_slots():
    assert packing.auto_landmark_slots(150) == 512
    assert packing.auto_landmark_slots(40) == 256   # floor
    assert packing.auto_landmark_slots(400) == 1280


def test_estimator_entry_points_pin_f32_matmuls():
    """Guard for the TPU matmul-precision pin: every estimator-core jit
    entry point must be wrapped with `utils.precision.f32_matmuls` (the
    bf16 MXU default diverges the stream; CPU CI can't catch a missed
    site, so we assert the wrap marker instead)."""
    from ctrlvio_tpu.estimator import stream
    from ctrlvio_tpu.solver import assemble, lm, marginalize

    entry_points = [
        stream.megastep,
        lm.solve_window, lm.build_normal_equations, lm.schur_solve,
        assemble.linearize, assemble.total_cost,
        assemble.accumulate_normal_equations, assemble.residual_rms,
        marginalize.build_prior, marginalize.build_prior_sqrt,
    ]
    for fn in entry_points:
        assert getattr(fn, "__f32_matmuls__", False), \
            f"{fn.__module__}.{fn.__name__} is not wrapped with f32_matmuls"
