"""Synthetic rolling-shutter VIO sequence generator.

The reference validates operationally against TUM-RSVI rosbags
(`/root/reference/README.md:37-54`), which are not available here (zero
egress). This module generates physically consistent synthetic sequences
with *known* ground truth — trajectory, gravity, biases, landmark depths and
the rolling-shutter line delay — so accuracy (ATE, line-delay convergence)
is measurable exactly, which the reference could never do in-tree.

Ground truth is itself an order-4 B-spline on SO(3) x R^3 (same
representation the estimator fits), sampled:

- IMU at `imu_rate`: gyro = w_body + bg + noise, accel = R^T(a_w + g) + ba + noise
  (same measurement model the IMU factor inverts).
- Camera frames at `cam_rate`: each landmark is projected with a per-row
  exposure time t = t_frame + row * line_delay, solved by fixed-point
  iteration (row depends on the pose at the row's own exposure time — the
  actual rolling-shutter physics the reference models in
  `image_feature_factor.h:84-101`).

Host-side numpy/f64; output arrays are ragged per frame (packing to static
device shapes happens in the estimator pipeline).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ctrlvio_tpu.ops import so3, spline

S_TO_NS = 1_000_000_000


@dataclass
class SimConfig:
    duration: float = 12.0
    knot_dt: float = 0.05
    imu_rate: float = 200.0
    cam_rate: float = 10.0
    n_landmarks: int = 400
    line_delay: float = 29.4737e-6  # sec/row (TUM-RSVI nominal, ≙ config comment)
    image_h: int = 1024
    image_w: int = 1280
    fx: float = 739.0
    fy: float = 739.0
    cx: float = 640.0
    cy: float = 512.0
    # dynamics
    rot_excite: float = 0.10  # rad/knot random walk (~2 rad/s peak, handheld-like)
    pos_excite: float = 0.05  # m/knot random walk (~1 m/s)
    gravity: float = 9.80766
    # noise (0 => perfect data for exactness tests)
    gyro_noise: float = 0.0
    accel_noise: float = 0.0
    pixel_noise: float = 0.0  # in normalized coords
    gyro_bias: float = 0.0
    accel_bias: float = 0.0
    # bias random walk (std of per-step increments scaled by sqrt(dt);
    # ≙ σ_bg/σ_ba, `config/ct_odometry_tumrs.yaml:18-20`, which the
    # estimator's BiasFactor random-walk model must track)
    gyro_bias_rw: float = 0.0
    accel_bias_rw: float = 0.0
    seed: int = 0
    # camera-IMU extrinsics
    ext_rot: tuple = (0.02, -0.01, 0.015)  # so3 log of R_CtoI
    ext_pos: tuple = (0.007, -0.057, -0.042)


# The reference's operating condition: its whole estimation machinery —
# per-axis info vectors 1/σ (`opt_weight.h:119-126`, where σ_g/σ_a are used
# DIRECTLY as per-sample weights, the computed sqrt_dt deliberately unused),
# Cauchy robust loss, bias random walk — exists for noisy sensors at these
# configured levels (`config/ct_odometry_tumrs.yaml:16-20`,
# `config/tumrs/cam_tumrs.yaml` focal≈739 with image_weight 800 → ~0.9 px).
REFERENCE_NOISE = dict(
    gyro_noise=4e-3,      # per-sample std, rad/s   (σ_g, yaml:16)
    accel_noise=8e-2,     # per-sample std, m/s^2   (σ_a, yaml:19)
    pixel_noise=1.35e-3,  # ~1 px at focal 739, normalized coords
    gyro_bias=0.01,       # constant bias draw std, rad/s
    accel_bias=0.05,      # constant bias draw std, m/s^2
    gyro_bias_rw=2e-5,    # σ_bg (yaml:18)
    accel_bias_rw=4e-4,   # σ_ba (yaml:20)
)


def reference_noise(**overrides) -> SimConfig:
    """A SimConfig with sensor noise at the reference's configured operating
    point (see REFERENCE_NOISE). Keyword overrides pass through to SimConfig."""
    return SimConfig(**{**REFERENCE_NOISE, **overrides})


@dataclass
class FrameObs:
    t_ns: int
    ids: np.ndarray      # (n,) int64 landmark ids
    pts: np.ndarray      # (n, 2) normalized undistorted coords
    rows: np.ndarray     # (n,) float pixel row (v coordinate)


@dataclass
class SimData:
    cfg: SimConfig
    knots_q: np.ndarray   # (K, 4) GT SO3 knots, body(IMU)-to-world
    knots_p: np.ndarray   # (K, 3) GT position knots (IMU in world)
    imu_t_ns: np.ndarray  # (M,)
    gyro: np.ndarray      # (M, 3)
    accel: np.ndarray     # (M, 3)
    frames: List[FrameObs] = field(default_factory=list)
    landmarks: np.ndarray = None  # (L, 3) world points
    gravity_vec: np.ndarray = None
    bg: np.ndarray = None
    ba: np.ndarray = None

    def pose_at(self, t_sec):
        """GT IMU pose at time t (seconds). Returns (quat, pos). Numpy."""
        from ctrlvio_tpu.ops import so3np

        i0, u = grid_coords(np.asarray(t_sec), self.cfg.knot_dt)
        q4 = self.knots_q[i0 : i0 + 4]
        p4 = self.knots_p[i0 : i0 + 4]
        q = so3np.so3_eval(q4, np.float64(u))
        p = so3np.rd_eval(p4, np.float64(u), 1.0 / self.cfg.knot_dt, 0)
        return q, p


def grid_coords(t_sec, dt):
    """Host-side int64-exact time -> (segment index, fractional u)."""
    t_ns = np.int64(np.round(np.asarray(t_sec) * S_TO_NS))
    dt_ns = np.int64(np.round(dt * S_TO_NS))
    i0 = int(t_ns // dt_ns)
    u = float(t_ns % dt_ns) / float(dt_ns)
    return i0, u


def _smooth_knots(cfg: SimConfig, rng):
    """Random C^2 trajectory: filtered random-walk knot increments.

    ≙ the role of `genRandomTrajectory` (`so3_spline.h:160-177`) but smooth
    enough to look like handheld motion.
    """
    n_knots = int(np.ceil(cfg.duration / cfg.knot_dt)) + 4
    # smooth increments by a moving average over the random walk steps
    rot_steps = rng.normal(size=(n_knots, 3)) * cfg.rot_excite
    pos_steps = rng.normal(size=(n_knots, 3)) * cfg.pos_excite
    kernel = np.ones(5) / 5.0
    for k in range(3):
        rot_steps[:, k] = np.convolve(rot_steps[:, k], kernel, mode="same")
        pos_steps[:, k] = np.convolve(pos_steps[:, k], kernel, mode="same")

    from ctrlvio_tpu.ops import so3np

    qs = np.zeros((n_knots, 4))
    qs[0] = [1, 0, 0, 0]
    for i in range(1, n_knots):
        qs[i] = so3np.boxplus(qs[i - 1], rot_steps[i])
    ps = np.cumsum(pos_steps, axis=0)
    return qs, ps


def _batched_pose(knots_q, knots_p, ts, dt):
    """Vectorized GT pose evaluation at many times (numpy, host)."""
    from ctrlvio_tpu.ops import so3np

    t_ns = np.round(np.asarray(ts) * S_TO_NS).astype(np.int64)
    dt_ns = np.int64(np.round(dt * S_TO_NS))
    i0 = np.clip((t_ns // dt_ns).astype(np.int64), 0, len(knots_q) - 4)
    u = (t_ns % dt_ns).astype(np.float64) / float(dt_ns)
    idx = i0[:, None] + np.arange(4)
    q4 = np.asarray(knots_q)[idx]
    p4 = np.asarray(knots_p)[idx]
    q = so3np.so3_eval(q4, u)
    p = so3np.rd_eval(p4, u, 1.0 / dt, 0)
    w = so3np.so3_vel_body(q4, u, 1.0 / dt)
    acc = so3np.rd_eval(p4, u, 1.0 / dt, 2)
    return q, p, w, acc


def generate(cfg: SimConfig) -> SimData:
    from ctrlvio_tpu.utils.hostmath import on_cpu

    with on_cpu():
        return _generate_impl(cfg)


def _generate_impl(cfg: SimConfig) -> SimData:
    rng = np.random.default_rng(cfg.seed)
    knots_q, knots_p = _smooth_knots(cfg, rng)
    dt = cfg.knot_dt
    g_vec = np.array([0.0, 0.0, cfg.gravity])

    # --- IMU samples ---------------------------------------------------
    t_max = (len(knots_q) - 3) * dt - 2e-3
    imu_ts = np.arange(0.0, min(cfg.duration, t_max), 1.0 / cfg.imu_rate)
    from ctrlvio_tpu.ops import so3np

    q, p, w, acc = _batched_pose(knots_q, knots_p, imu_ts, dt)
    Rt = so3np.quat_to_matrix(q)  # body->world
    accel_body = np.einsum("nij,nj->ni", Rt.transpose(0, 2, 1), acc + g_vec)

    bg = rng.normal(size=3) * cfg.gyro_bias
    ba = rng.normal(size=3) * cfg.accel_bias
    # slow bias drift: random walk with per-step std σ_rw·sqrt(dt) — the
    # model the estimator's BiasFactor assumes (≙ trajectory_value_factor.h
    # :36-105); SimData.bg/ba stay the t=0 values (what a bootstrap sees)
    sqrt_dt = np.sqrt(1.0 / cfg.imu_rate)
    bg_t = bg + np.cumsum(rng.normal(size=w.shape), axis=0) \
        * (cfg.gyro_bias_rw * sqrt_dt)
    ba_t = ba + np.cumsum(rng.normal(size=w.shape), axis=0) \
        * (cfg.accel_bias_rw * sqrt_dt)
    gyro_m = w + bg_t + rng.normal(size=w.shape) * cfg.gyro_noise
    accel_m = accel_body + ba_t + rng.normal(size=w.shape) * cfg.accel_noise

    # --- landmarks ------------------------------------------------------
    # scatter points around the trajectory tube, biased forward of the camera
    centers = knots_p[rng.integers(0, len(knots_p), size=cfg.n_landmarks)]
    lm = centers + rng.normal(size=(cfg.n_landmarks, 3)) * np.array([4.0, 4.0, 3.0]) \
        + rng.uniform(2.0, 6.0, size=(cfg.n_landmarks, 1)) * rng.normal(size=(cfg.n_landmarks, 3)) * 0.3
    lm = lm + np.array([0.0, 0.0, 1.5])

    # camera extrinsics
    q_CtoI = so3np.quat_exp(np.array(cfg.ext_rot))
    R_CtoI = so3np.quat_to_matrix(q_CtoI)
    p_CinI = np.array(cfg.ext_pos)

    # --- camera frames (rolling shutter) --------------------------------
    frames = []
    frame_ts = np.arange(0.3, min(cfg.duration, t_max) - 0.1, 1.0 / cfg.cam_rate)
    def project_at(t_rows):
        qf, pf, _, _ = _batched_pose(knots_q, knots_p, t_rows, dt)
        Rf = so3np.quat_to_matrix(qf)  # IMU->world
        # world -> camera: X_c = R_CtoI^T (R_IW^T (X_w - p_I) - p_CinI)
        X_i = np.einsum("nij,nj->ni", Rf.transpose(0, 2, 1), lm - pf)
        X_c = np.einsum("ij,nj->ni", R_CtoI.T, X_i - p_CinI)
        z = X_c[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            xn = X_c[:, 0] / z
            yn = X_c[:, 1] / z
        v_pix = cfg.fy * yn + cfg.cy
        u_pix = cfg.fx * xn + cfg.cx
        vis = (
            (z > 0.3)
            & (u_pix >= 2)
            & (u_pix < cfg.image_w - 2)
            & (v_pix >= 0)
            & (v_pix < cfg.image_h)
        )
        return xn, yn, v_pix, vis

    for tf in frame_ts:
        # fixed-point iteration on per-landmark exposure time (row depends on
        # the pose at its own exposure time)
        t_rows = np.full(len(lm), tf)
        for _ in range(6):
            xn, yn, v_pix, vis = project_at(t_rows)
            t_rows = np.where(vis, tf + np.clip(v_pix, 0, cfg.image_h - 1) * cfg.line_delay, tf)
        # report integer rows; re-project exactly at the reported row time so
        # (pts, rows) are consistent with the RS observation model t+row*ld
        vis_fp = vis
        rows_all = np.round(np.clip(v_pix, 0, cfg.image_h - 1))
        xn, yn, v_pix, vis = project_at(tf + rows_all * cfg.line_delay)
        # keep only observations whose reported row matches the row actually
        # imaged at that exposure time (a real rolling shutter can't observe
        # a feature on a row it isn't on)
        vis = vis & vis_fp & (np.abs(v_pix - rows_all) < 3.0)
        ids = np.nonzero(vis)[0]
        pts = np.stack([xn[ids], yn[ids]], axis=1)
        if cfg.pixel_noise > 0:
            pts = pts + rng.normal(size=pts.shape) * cfg.pixel_noise
        rows = rows_all[ids]
        frames.append(
            FrameObs(
                t_ns=int(np.round(tf * S_TO_NS)),
                ids=ids.astype(np.int64),
                pts=pts,
                rows=rows.astype(np.float64),
            )
        )

    return SimData(
        cfg=cfg,
        knots_q=knots_q,
        knots_p=knots_p,
        imu_t_ns=np.round(imu_ts * S_TO_NS).astype(np.int64),
        gyro=gyro_m,
        accel=accel_m,
        frames=frames,
        landmarks=lm,
        gravity_vec=g_vec,
        bg=bg,
        ba=ba,
    )
