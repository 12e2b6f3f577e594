"""Fused single-dispatch feature-tracking front end.

Same pipeline as `frontend/tracker.py` (CLAHE -> pyramidal LK + FB check ->
min-dist Shi-Tomasi refill -> undistort, ≙ the reference's FeatureTracker,
`feature_tracker.cpp:44-207`) but engineered for a remote accelerator:

- ONE jitted megastep per frame covers track + detect + slot refill + lift;
  the pyramid and track state stay device-resident between frames.
- The host receives ONE packed (N, 8) array per frame, and can consume it
  with a one-frame lag (`lag=1`) so the device->host pull overlaps the next
  frame's compute — the tunnel RTT leaves the critical path entirely.
- Feature identity is the SLOT: a slot tracks one feature until it dies and
  is refilled in-graph; the host assigns globally unique ids to refill
  events after the fact. This removes every data-dependent shape the
  reference's id vectors imply.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import clahe as clahe_mod
from . import corners, klt
from .tracker import TrackerConfig


def rotation_flow(imu_t_ns, gyro, t0_ns, t1_ns, R_CtoI, bg=None):
    """Camera-frame relative rotation M (3, 3) between two frame times from
    raw gyro, for KLT initial-flow prediction.

    A feature with previous-frame camera ray x satisfies x_cur ~ M @ x_prev
    under pure rotation: M = R_ic^T ΔR^T R_ic with ΔR the integrated IMU
    rotation over [t0, t1] (piecewise-constant ω, midpoint-free — prediction
    only needs ~1 px accuracy). Host numpy; ~microseconds."""
    from ctrlvio_tpu.ops import so3np

    imu_t_ns = np.asarray(imu_t_ns)
    lo = np.searchsorted(imu_t_ns, t0_ns, "left")
    hi = np.searchsorted(imu_t_ns, t1_ns, "right")
    q = np.array([1.0, 0.0, 0.0, 0.0])
    ts = np.concatenate([[t0_ns], imu_t_ns[lo:hi], [t1_ns]])
    for k in range(len(ts) - 1):
        dt = (ts[k + 1] - ts[k]) * 1e-9
        if dt <= 0:
            continue
        w = gyro[min(max(lo + k - 1, 0), len(gyro) - 1)]
        if bg is not None:
            w = w - bg
        q = so3np.quat_mul(q, so3np.quat_exp(np.asarray(w, np.float64) * dt))
    dR = so3np.quat_to_matrix(q[None])[0]
    R_ic = np.asarray(R_CtoI, np.float64)
    return (R_ic.T @ dR.T @ R_ic).astype(np.float32)


class FusedTracker:
    """Slot-identity KLT tracker with a single jitted per-frame megastep.

    API: feed frames with `step(t_ns, img)`; it returns the published
    feature dict for the CURRENT frame (lag=0) or the PREVIOUS frame
    (lag=1, first call returns None). Output dict matches
    `FeatureTracker.process`: ids, pts (normalized), uv, vel, rows, t_ns.
    """

    def __init__(self, cfg: TrackerConfig, camera, image_shape, lag: int = 0):
        self.cfg = cfg
        self.camera = camera
        self.H, self.W = image_shape
        self.lag = lag
        N = cfg.max_cnt
        self.N = N

        # host-side identity state (slot-indexed, fixed size)
        self.ids = np.full((N,), -1, dtype=np.int64)
        self.track_cnt = np.zeros((N,), dtype=np.int64)
        self.prev_norm = np.zeros((N, 2))
        self.prev_live = np.zeros((N,), dtype=bool)
        self.prev_t_ns: Optional[int] = None
        self.next_id = 0
        # epipolar (F-RANSAC) rejection state: slots the host gate killed —
        # suppressed from publishing immediately, freed on the device at the
        # next dispatch (≙ rejectWithF, `feature_tracker.cpp:201-235`)
        self._kill = np.zeros((N,), dtype=bool)
        self._suppress = np.zeros((N,), dtype=bool)
        self.n_rejected = 0  # cumulative F-gate rejections (diagnostics)

        # device-resident state: (pyramid tuple, pts (N,2) f32, live (N,))
        self._dev = None
        self._pending = None  # (t_ns, packed device array) awaiting consume

        self._jit_pre = jax.jit(self._preprocess)
        self._jit_step = jax.jit(self._megastep)

    # ------------------------------------------------------------------
    def _preprocess(self, img):
        img = img.astype(jnp.float32)
        if self.cfg.use_clahe:
            img = clahe_mod.clahe(img)
        return tuple(klt.pyramid(img, self.cfg.klt.levels))

    def _megastep(self, img, pyr_prev, pts, live, M_rel, kill):
        """track -> refill free slots in-graph -> lift; returns new device
        state and a packed (N, 8) f32 host-bound array:
        [x, y, nx, ny, live, tracked, refilled, pad].

        M_rel (3, 3): camera-frame rotation prev->cur (from integrated gyro,
        `rotation_flow` docstring) used to PREDICT each feature's position —
        LK then only solves the translation residual, so fast rotation
        (the dominant handheld displacement) never exceeds the pyramid's
        convergence range. Identity disables prediction."""
        cfg = self.cfg
        pyr_cur = self._preprocess(img)

        live = live & ~kill  # host F-gate kills free their slots here
        pts_in = jnp.where(live[:, None], pts, 0.0).astype(jnp.float32)
        # gyro-predicted initial flow: rotate the lifted ray, re-project
        rays = self.camera.lift(pts_in)
        rays3 = jnp.concatenate([rays, jnp.ones_like(rays[:, :1])], axis=1)
        rot = rays3 @ M_rel.T
        guess_uv = self.camera.project(rot).astype(jnp.float32)
        ahead = rot[:, 2] > 0.1
        guess = jnp.where((live & ahead)[:, None], guess_uv, pts_in)
        guess = jnp.clip(guess, 0.0, jnp.asarray(
            [[self.W - 1.0, self.H - 1.0]], jnp.float32))
        new_pts, ok = klt.track(list(pyr_prev), list(pyr_cur), pts_in,
                                cfg.klt, use_pallas=cfg.use_pallas,
                                init=guess)
        ok = ok & live

        # refill: detect corners away from surviving tracks, assign the
        # k-th accepted candidate to the k-th free slot (one-hot matmul —
        # the in-graph equivalent of the host fill loop in tracker.py)
        exclude = jnp.where(ok[:, None], new_pts[:, ::-1], -1.0)
        cand, cand_ok = corners.detect(pyr_cur[0], max_corners=self.N,
                                       min_dist=cfg.min_dist,
                                       exclude_yx=exclude)
        free = ~ok
        cand_rank = jnp.cumsum(cand_ok.astype(jnp.int32)) - 1
        free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        sel = (cand_ok[None, :] & free[:, None]
               & (cand_rank[None, :] == free_rank[:, None]))
        from_cand = sel.astype(cand.dtype) @ cand
        refilled = jnp.any(sel, axis=1)

        pts_out = jnp.where(ok[:, None], new_pts,
                            jnp.where(refilled[:, None], from_cand, -1.0))
        live_out = ok | refilled
        norm = self.camera.lift(jnp.where(live_out[:, None], pts_out, 0.0))
        packed = jnp.concatenate([
            pts_out, norm.astype(jnp.float32),
            live_out[:, None].astype(jnp.float32),
            ok[:, None].astype(jnp.float32),
            refilled[:, None].astype(jnp.float32),
            jnp.zeros((self.N, 1), jnp.float32),
        ], axis=1)
        return (pyr_cur, pts_out, live_out), packed

    # ------------------------------------------------------------------
    def step(self, t_ns: int, img: np.ndarray, R_rel=None):
        """Feed one frame; returns the feature dict for this frame (lag=0)
        or the previous one (lag=1; None on the first call).

        R_rel: optional (3, 3) camera-frame rotation prev->cur frame (see
        `rotation_flow`) enabling gyro-predicted initial flow."""
        # stream-discontinuity restart (≙ feature_tracker_node.cpp:65-76)
        if self.prev_t_ns is not None and self._dev is not None and (
                t_ns < self.prev_t_ns
                or t_ns - self.prev_t_ns > 1_000_000_000):
            self.restart()

        imgd = jnp.asarray(img)
        if self._dev is None:
            pyr0 = self._jit_pre(imgd)
            self._dev = (pyr0,
                         jnp.full((self.N, 2), -1.0, jnp.float32),
                         jnp.zeros((self.N,), jnp.bool_))
        M = np.eye(3, dtype=np.float32) if R_rel is None \
            else np.asarray(R_rel, np.float32)
        pyr, pts, live = self._dev
        self._dev, packed = self._jit_step(imgd, pyr, pts, live,
                                           jnp.asarray(M),
                                           jnp.asarray(self._kill))
        self._kill = np.zeros((self.N,), dtype=bool)
        try:
            packed.copy_to_host_async()
        except Exception:
            pass

        out = None
        if self.lag and self._pending is not None:
            out = self._consume(*self._pending)
        self._pending = (t_ns, packed)
        if not self.lag:
            out = self._consume(*self._pending)
            self._pending = None
        return out

    def flush(self):
        """Drain the pending frame (lag=1). Returns its feature dict."""
        if self._pending is None:
            return None
        out = self._consume(*self._pending)
        self._pending = None
        return out

    def restart(self):
        self._dev = None
        self._pending = None
        self.ids[:] = -1
        self.track_cnt[:] = 0
        self.prev_live[:] = False
        self.prev_t_ns = None
        self._kill[:] = False
        self._suppress[:] = False

    # ------------------------------------------------------------------
    def _consume(self, t_ns: int, packed):
        p = np.asarray(packed, np.float64)
        uv = p[:, 0:2]
        norm = p[:, 2:4]
        live = p[:, 4] > 0.5
        tracked = p[:, 5] > 0.5
        refilled = p[:, 6] > 0.5

        # epipolar outlier gate on the host (≙ rejectWithF,
        # `feature_tracker.cpp:201-235`): features violating the dominant
        # two-view geometry (e.g. tracks on independently moving objects)
        # are suppressed from this frame's publication and their slots
        # queued for the next dispatch's in-graph kill+refill
        self._suppress &= ~refilled  # device refilled the slot: new feature
        if self.cfg.reject_wf:
            same = tracked & self.prev_live & ~self._suppress
            idx = np.nonzero(same)[0]
            if len(idx) >= 12:
                from .fransac import reject_with_f

                inl = reject_with_f(self.prev_norm[idx], norm[idx],
                                    thresh_px=self.cfg.f_threshold)
                bad = idx[~inl]
                if len(bad):
                    self._suppress[bad] = True
                    self._kill[bad] = True
                    self.n_rejected += len(bad)
        live &= ~self._suppress
        tracked &= ~self._suppress

        # id lifecycle on the host (slot identity makes this vectorizable)
        n_new = int(refilled.sum())
        self.ids = np.where(tracked, self.ids, -1)
        if n_new:
            self.ids[refilled] = self.next_id + np.arange(n_new)
            self.next_id += n_new
        self.track_cnt = np.where(tracked, self.track_cnt + 1,
                                  np.where(refilled, 1, 0))

        vel = np.zeros((self.N, 2))
        if self.prev_t_ns is not None:
            dt = (t_ns - self.prev_t_ns) * 1e-9
            if dt > 0:
                same = tracked & self.prev_live
                vel[same] = (norm[same] - self.prev_norm[same]) / dt
        self.prev_t_ns = t_ns
        self.prev_norm = norm.copy()
        self.prev_live = live.copy()

        return dict(t_ns=t_ns, ids=self.ids[live].copy(), pts=norm[live],
                    uv=uv[live], vel=vel[live], rows=uv[live][:, 1])
