"""Feature tracker: KLT pipeline with id lifecycle and refill.

≙ FeatureTracker + FeatureTrackerNode
(`/root/reference/src/visual_odometry/visual_feature/feature_tracker.{h,cpp}`,
`feature_tracker_node.cpp`): CLAHE -> pyramidal LK with forward-backward
check -> min-distance suppression & Shi-Tomasi refill to max_cnt ->
undistortion to the normalized plane -> per-feature velocity; publishes
(id, normalized xy, pixel uv, velocity) per frame at a controlled rate.

Device compute (CLAHE, pyramid, LK, corner detect) is jitted with static
shapes; id bookkeeping is host-side numpy (≙ the ids/track_cnt vectors).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import clahe as clahe_mod
from . import corners, klt


@dataclass
class TrackerConfig:
    max_cnt: int = 150          # ≙ MAX_CNT (`cam_tumrs.yaml:23`)
    min_dist: int = 25          # ≙ MIN_DIST
    use_clahe: bool = True      # ≙ EQUALIZE
    fb_check: bool = True       # ≙ flow_back
    freq: float = 10.0          # publish rate (`cam_tumrs.yaml:25`)
    use_pallas: bool = False    # full-res LK levels via the Mosaic kernel
    reject_wf: bool = False     # ≙ reject_wf (off for TUM-RSVI config)
    f_threshold: float = 1.0    # ≙ F_THRESHOLD, virtual pixels
    klt: klt.KLTConfig = klt.KLTConfig()


class FeatureTracker:
    def __init__(self, cfg: TrackerConfig, camera, image_shape):
        self.cfg = cfg
        self.camera = camera
        self.H, self.W = image_shape
        N = cfg.max_cnt
        self.pts = np.full((N, 2), -1.0, dtype=np.float64)   # pixel x,y
        self.ids = np.full((N,), -1, dtype=np.int64)
        self.track_cnt = np.zeros((N,), dtype=np.int64)
        self.prev_norm = np.zeros((N, 2))
        self.prev_t_ns: Optional[int] = None
        self.next_id = 0
        self.prev_pyr = None
        self._pub_count = 0
        self._first_t_ns = None
        self._norm_full = None

        self._jit_pre = jax.jit(self._preprocess)
        self._jit_track = jax.jit(
            partial(klt.track, cfg=cfg.klt, use_pallas=cfg.use_pallas))
        self._jit_detect = jax.jit(
            partial(corners.detect, max_corners=cfg.max_cnt,
                    min_dist=cfg.min_dist))
        self._jit_lift = jax.jit(self.camera.lift)

    def _preprocess(self, img):
        img = img.astype(jnp.float32)
        if self.cfg.use_clahe:
            img = clahe_mod.clahe(img)
        return klt.pyramid(img, self.cfg.klt.levels)

    # ------------------------------------------------------------------
    def process(self, t_ns: int, img: np.ndarray):
        """Feed one image. Returns None (rate-gated frame) or a dict with
        ids, pts_norm, uv, velocity, rows for published frames."""
        # stream-discontinuity restart (≙ `feature_tracker_node.cpp:65-76`:
        # >1 s gap or backwards time -> reset all tracks)
        if self.prev_t_ns is not None and (
                t_ns < self.prev_t_ns or t_ns - self.prev_t_ns > 1_000_000_000):
            self.restart()

        pyr = self._jit_pre(jnp.asarray(img))

        live = self.ids >= 0
        if self.prev_pyr is not None and live.any():
            pts_in = np.where(live[:, None], self.pts, 0.0)
            new_pts, ok = self._jit_track(self.prev_pyr, pyr,
                                          jnp.asarray(pts_in, jnp.float32))
            new_pts = np.asarray(new_pts, np.float64)
            ok = np.asarray(ok) & live
            self.pts = np.where(ok[:, None], new_pts, -1.0)
            self.ids = np.where(ok, self.ids, -1)
            self.track_cnt = np.where(ok, self.track_cnt + 1, 0)
        self.prev_pyr = pyr

        # publish-rate gate (≙ `feature_tracker_node.cpp:80-93`)
        if self._first_t_ns is None:
            self._first_t_ns = t_ns
        publish = True
        elapsed = (t_ns - self._first_t_ns) * 1e-9
        if elapsed > 0 and self._pub_count / elapsed > self.cfg.freq:
            publish = False

        if publish:
            self._pub_count += 1
            if self.cfg.reject_wf:
                self._reject_with_f()
            self._refill(pyr)
            return self._emit(t_ns)
        return None

    # ------------------------------------------------------------------
    def _reject_with_f(self):
        """Epipolar RANSAC outlier gate on surviving tracks
        (≙ rejectWithF, `feature_tracker.cpp:201-235`; runs only on
        published frames, like the reference)."""
        from . import fransac

        live = self.ids >= 0
        tracked = live & (self.track_cnt > 1)  # has a previous observation
        if tracked.sum() < 8 or self._norm_full is None:
            return
        cur_norm = self._lift_full()
        prev_norm = self._norm_full
        idx = np.nonzero(tracked)[0]
        mask = fransac.reject_with_f(prev_norm[idx], cur_norm[idx],
                                     thresh_px=self.cfg.f_threshold,
                                     seed=int(self._pub_count))
        drop = idx[~mask]
        self.pts[drop] = -1.0
        self.ids[drop] = -1
        self.track_cnt[drop] = 0

    def _lift_full(self) -> np.ndarray:
        """Normalized coords for ALL slots (fixed shape — one jit variant,
        no per-live-count recompiles). Dead slots produce garbage values
        that are never read."""
        uv = np.where(self.ids[:, None] >= 0, self.pts, 0.0)
        return np.asarray(self._jit_lift(jnp.asarray(uv, jnp.float64)))

    # ------------------------------------------------------------------
    def restart(self):
        """Drop all state (discontinuity recovery)."""
        self.pts[:] = -1.0
        self.ids[:] = -1
        self.track_cnt[:] = 0
        self.prev_pyr = None
        self.prev_t_ns = None
        self._pub_count = 0
        self._first_t_ns = None
        self._norm_full = None

    # ------------------------------------------------------------------
    def _refill(self, pyr):
        """Detect new corners in free slots, min-dist away from live tracks."""
        n_live = int((self.ids >= 0).sum())
        if n_live >= self.cfg.max_cnt:
            return
        exclude = np.full((self.cfg.max_cnt, 2), -1.0)
        live = self.ids >= 0
        exclude[: live.sum()] = self.pts[live][:, ::-1]  # (y, x)
        cand, cand_ok = self._jit_detect(pyr[0], exclude_yx=jnp.asarray(exclude, jnp.float32))
        cand = np.asarray(cand, np.float64)
        cand_ok = np.asarray(cand_ok)
        free = np.nonzero(~live)[0]
        k = 0
        for ci in range(len(cand)):
            if k >= len(free) or not cand_ok[ci]:
                continue
            slot = free[k]
            self.pts[slot] = cand[ci]
            self.ids[slot] = self.next_id
            self.track_cnt[slot] = 1
            self.next_id += 1
            k += 1

    # ------------------------------------------------------------------
    def _emit(self, t_ns: int):
        live = self.ids >= 0
        norm_full = self._lift_full()
        uv = self.pts[live]
        ids = self.ids[live]
        norm = norm_full[live]
        # velocities in the normalized plane (≙ undistortedPoints velocity)
        vel = np.zeros_like(norm)
        if self.prev_t_ns is not None:
            dt = (t_ns - self.prev_t_ns) * 1e-9
            if dt > 0:
                prev_map = {i: self.prev_norm[k]
                            for k, i in enumerate(self.prev_ids)}
                for k, i in enumerate(ids):
                    if i in prev_map:
                        vel[k] = (norm[k] - prev_map[i]) / dt
        self.prev_t_ns = t_ns
        self.prev_ids = ids.copy()
        self.prev_norm = norm.copy()
        self._norm_full = norm_full
        return dict(t_ns=t_ns, ids=ids, pts=norm, uv=uv, vel=vel,
                    rows=uv[:, 1])
