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
        marginalize.build_prior, marginalize.build_prior_sqrt,
    ]
    for fn in entry_points:
        assert getattr(fn, "__f32_matmuls__", False), \
            f"{fn.__module__}.{fn.__name__} is not wrapped with f32_matmuls"
