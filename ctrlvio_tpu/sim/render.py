"""Rasterize a synthetic scene into rolling-shutter images.

Bridges the feature-level simulator (`sim/synthetic.py`) and the image
front-end: each landmark is drawn as a sub-pixel Gaussian blob at its
rolling-shutter-correct projection (row v exposed at `t_frame + v * ld`,
the same time model as the estimator's RS reprojection factor and the
reference's `image_feature_factor.h:84-85`), so the full
CLAHE→KLT→undistort→BA pipeline can be exercised end-to-end on imagery
with exact ground truth — the in-repo stand-in for a TUM-RSVI bag replay
(no real sequences are shippable in this environment).
"""

from __future__ import annotations

import numpy as np

from ctrlvio_tpu.ops import so3np


def render_sequence(sim, H: int, W: int, fx: float, fy: float,
                    cx: float, cy: float, blob_sigma: float = 1.4,
                    background: float = 24.0, seed: int = 0) -> np.ndarray:
    """Render all frames of a SimData. Returns (F, H, W) uint8.

    Projection uses the sim's camera-IMU extrinsics and line delay; the
    row-time dependency is resolved by fixed-point iteration (2 rounds —
    the same contraction the reference's factor exploits)."""
    rng = np.random.default_rng(seed)
    L = len(sim.landmarks)
    intens = rng.uniform(110.0, 235.0, L)
    R_CtoI = so3np.quat_to_matrix(
        so3np.quat_exp(np.asarray(sim.cfg.ext_rot, np.float64)[None]))[0]
    p_CinI = np.asarray(sim.cfg.ext_pos, np.float64)
    ld = sim.cfg.line_delay

    r = int(np.ceil(3 * blob_sigma))
    oy, ox = np.mgrid[-r : r + 1, -r : r + 1]

    def cam_pose(t_sec):
        q, p = sim.pose_at(t_sec)
        R = so3np.quat_to_matrix(np.asarray(q)[None])[0]
        return R @ R_CtoI, p + R @ p_CinI

    frames = np.zeros((len(sim.frames), H, W), np.uint8)
    for fidx, fr in enumerate(sim.frames):
        t0 = fr.t_ns * 1e-9
        img = np.full((H, W), background, np.float64)
        # fixed-point on the row time: v -> t_row -> reproject
        v = np.full(L, cy)
        uv = np.zeros((L, 2))
        z = np.ones(L)
        for _ in range(3):
            t_rows = np.clip(t0 + v * ld, 0.0, None)
            for li in range(L):
                Rc, pc = cam_pose(t_rows[li])
                Xc = Rc.T @ (sim.landmarks[li] - pc)
                z[li] = Xc[2]
                if Xc[2] > 0.25:
                    uv[li] = (fx * Xc[0] / Xc[2] + cx,
                              fy * Xc[1] / Xc[2] + cy)
            v = np.clip(uv[:, 1], 0, H - 1)
        vis = (z > 0.25) & (uv[:, 0] > r + 1) & (uv[:, 0] < W - r - 2) \
            & (uv[:, 1] > r + 1) & (uv[:, 1] < H - r - 2)
        for li in np.nonzero(vis)[0]:
            u0, v0 = uv[li]
            iu, iv = int(round(u0)), int(round(v0))
            patch = intens[li] * np.exp(
                -(((iv + oy) - v0) ** 2 + ((iu + ox) - u0) ** 2)
                / (2 * blob_sigma**2))
            img[iv - r : iv + r + 1, iu - r : iu + r + 1] += patch
        frames[fidx] = np.clip(img, 0, 255).astype(np.uint8)
    return frames
