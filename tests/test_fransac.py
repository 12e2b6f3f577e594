"""Fundamental-matrix RANSAC gate (≙ rejectWithF,
`feature_tracker.cpp:201-235`): injected outlier correspondences on a rigid
two-view scene must be rejected, inliers kept."""

import numpy as np

from ctrlvio_tpu.frontend.fransac import reject_with_f


def _two_view(n=80, seed=3):
    rng = np.random.default_rng(seed)
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(3, 9, n)], axis=1)
    # camera 0 at identity; camera 1 translated + rotated a little
    th = 0.06
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    t = np.array([0.4, 0.05, 0.1])
    p0 = X[:, :2] / X[:, 2:3]
    X1 = (X - t) @ R
    p1 = X1[:, :2] / X1[:, 2:3]
    return p0, p1


def test_outliers_rejected_inliers_kept():
    p0, p1 = _two_view()
    n = len(p0)
    bad = np.zeros(n, bool)
    bad[::9] = True  # ~11% gross outliers
    p1c = p1.copy()
    p1c[bad] += np.random.default_rng(7).uniform(0.05, 0.2, (bad.sum(), 2))
    mask = reject_with_f(p0, p1c, thresh_px=1.0, seed=0)
    assert not mask[bad].any(), "gross outliers survived the F gate"
    assert mask[~bad].mean() > 0.95, "too many inliers rejected"


def test_noise_only_keeps_everything():
    p0, p1 = _two_view(seed=5)
    rng = np.random.default_rng(11)
    p1n = p1 + rng.normal(0, 0.3 / 460.0, p1.shape)  # ~0.3 px noise
    mask = reject_with_f(p0, p1n, thresh_px=1.5, seed=0)
    assert mask.mean() > 0.9


def test_degenerate_small_set_passes_through():
    p0 = np.random.default_rng(0).normal(0, 0.3, (5, 2))
    mask = reject_with_f(p0, p0 + 0.01, thresh_px=1.0)
    assert mask.all() and len(mask) == 5
