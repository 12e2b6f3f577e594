"""Pre-integration 15x15 covariance propagation (≙ `integration_base.h:
100-180`): validated against a Monte-Carlo ensemble of noisy integrations,
and the bias Jacobian against repropagation finite differences."""

import numpy as np

from ctrlvio_tpu.estimator.preintegration import PreIntegration
from ctrlvio_tpu.ops import so3np


def _imu_stream(n=40, dt=0.005, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) * dt
    gyr = np.stack([0.4 * np.sin(3 * t), 0.3 * np.cos(2 * t), 0.2 + 0 * t], 1)
    acc = np.stack([0.5 * np.sin(t), 9.8 + 0.2 * np.cos(4 * t), 0.3 + 0 * t], 1)
    return dt, gyr, acc


def _integrate(dt, gyr, acc, acc_n=0.0, gyr_n=0.0, rng=None, **kw):
    pre = PreIntegration(**kw)
    for k in range(len(gyr)):
        g, a = gyr[k].copy(), acc[k].copy()
        if rng is not None:
            g = g + rng.normal(0, gyr_n, 3)
            a = a + rng.normal(0, acc_n, 3)
        pre.push(dt, a, g)
    return pre


def test_covariance_matches_monte_carlo():
    """Monte-Carlo under the model's own noise convention (≙ VINS /
    `integration_base.h`: the midpoint endpoints carry INDEPENDENT noise
    each step): the propagated 15x15 must match the sample covariance."""
    dt, gyr, acc = _imu_stream()
    s_a, s_g = 0.05, 0.004  # per-sample noise std
    rng = np.random.default_rng(1)
    errs = []
    for _ in range(800):
        m = PreIntegration()
        for k in range(len(gyr) - 1):
            # fresh draws for both endpoints (the model's independence
            # assumption), injected via the internal step
            a0 = acc[k] + rng.normal(0, s_a, 3)
            g0 = gyr[k] + rng.normal(0, s_g, 3)
            a1 = acc[k + 1] + rng.normal(0, s_a, 3)
            g1 = gyr[k + 1] + rng.normal(0, s_g, 3)
            m._step(dt, a0, g0, a1, g1)
        ref = PreIntegration()
        for k in range(len(gyr) - 1):
            ref._step(dt, acc[k], gyr[k], acc[k + 1], gyr[k + 1])
        dth = so3np.quat_log(so3np.quat_mul(
            so3np.quat_conj(ref.dq[None]), m.dq[None]))[0]
        errs.append(np.concatenate([m.dp - ref.dp, dth, m.dv - ref.dv]))
    S = np.cov(np.stack(errs).T)              # sample (9, 9)
    # rebuild the deterministic propagation over the same step structure
    prop = PreIntegration(acc_n=s_a, gyr_n=s_g, acc_w=0.0, gyr_w=0.0)
    for k in range(len(gyr) - 1):
        prop._step(dt, acc[k], gyr[k], acc[k + 1], gyr[k + 1])
    P = prop.covariance[:9, :9]
    d_ratio = np.diag(S) / np.maximum(np.diag(P), 1e-18)
    # 800 samples -> ~10% MC error on variances
    assert np.all(d_ratio > 0.75) and np.all(d_ratio < 1.3), d_ratio
    # PSD
    assert np.all(np.linalg.eigvalsh(prop.covariance[:9, :9]) > -1e-15)


def test_bias_jacobian_matches_repropagation():
    dt, gyr, acc = _imu_stream()
    pre = _integrate(dt, gyr, acc)
    eps = 1e-5
    for j in range(3):
        dbg = np.zeros(3)
        dbg[j] = eps
        p2 = _integrate(dt, gyr, acc, bg=dbg)
        dth = so3np.quat_log(so3np.quat_mul(
            so3np.quat_conj(pre.dq[None]), p2.dq[None]))[0] / eps
        np.testing.assert_allclose(dth, pre.J_q_bg[:, j], atol=2e-3)
        dv = (p2.dv - pre.dv) / eps
        np.testing.assert_allclose(dv, pre.jacobian[6:9, 12:15][:, j],
                                   atol=5e-3)
        p3 = _integrate(dt, gyr, acc, ba=dbg)
        dp = (p3.dp - pre.dp) / eps
        np.testing.assert_allclose(dp, pre.jacobian[0:3, 9:12][:, j],
                                   atol=5e-3)


def test_zero_noise_zero_covariance():
    dt, gyr, acc = _imu_stream()
    pre = PreIntegration(acc_n=0.0, gyr_n=0.0, acc_w=0.0, gyr_w=0.0)
    for k in range(len(gyr)):
        pre.push(dt, acc[k], gyr[k])
    assert np.abs(pre.covariance).max() == 0.0
