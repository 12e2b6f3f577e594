"""CtrlVIO: the per-frame estimation pipeline (sliding window + spline solve).

≙ OdometryManager + TrajectoryManager + VisualOdometry orchestration
(`/root/reference/src/estimator/odometry_manager.cpp:128-299`,
`trajectory_manager.cpp:288-483`, `visual_odometry.cpp:137-308`):

per frame (after initialization):
  1. buffer IMU, pair with the frame             (GetMsgsForProcessing)
  2. feature table update -> keyframe decision   (addFeatureCheckParallax)
  3. extend spline knots to t_frame + 40 ms      (ExtendTrajectory; padding
     > ld_upper * image rows, ≙ comment :247)
  4. IMU-only predict solve on the new knots     (InitTrajectory, <=8 iters)
  5. triangulate new landmarks                   (FeatureManager::triangulate)
  6. full sliding-window BA                      (UpdateTrajectory, <=15 iters)
  7. 4-DoF gauge restore                         (double2vector)
  8. marginalization prior update                (UpdateVIOPrior)
  9. slide window                                (SlideWindow{Old,New})

Host does bookkeeping in numpy; the three device calls (predict solve, BA,
prior build) are jitted with static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ctrlvio_tpu.models.trajectory import Trajectory
from ctrlvio_tpu.ops import factors as F
from ctrlvio_tpu.ops import so3
from ctrlvio_tpu.solver import gauge, lm, marginalize
from ctrlvio_tpu.solver.layout import (BiasFactors, ImageFactors, ImuFactors,
                                       PriorFactor, SolveOptions, WindowConfig,
                                       WindowParams, empty_prior)
from . import packing
from .features import FeatureTable

S_TO_NS = 1_000_000_000
MARGIN_OLD = 0
MARGIN_SECOND_NEW = 1


@dataclass
class VIOConfig:
    # MIMU sized per the loud-failure formula (imu_rate * window_span *
    # 1.25 = 200 * 1.1 * 1.25 = 275, plus slack for consecutive
    # second-new slides stretching the window): 256 was marginal and
    # overflowed when the window held non-keyframe stretches
    window_config: WindowConfig = WindowConfig(KW=32, NB=11, LM=256, OBS=2048, MIMU=384)
    knot_dt: float = 0.05
    # IMU noise -> information (≙ OptWeight, `opt_weight.h:115-140`)
    sigma_gyro: float = 4e-3
    sigma_accel: float = 8e-2
    sigma_bg: float = 2e-5
    sigma_ba: float = 4e-4
    image_weight: float = 800.0
    min_parallax: float = 10.0 / 460.0
    gravity_mag: float = 9.80766
    # line delay (≙ config ld block `ct_odometry_tumrs.yaml:30-34`)
    ld_init: float = 0.0
    fix_ld: bool = False
    ld_lower: float = 0.0
    ld_upper: float = 3.5e-5
    # ≙ the reference's Ceres cap of 15 iterations WITH early termination
    # (`trajectory_manager.cpp:313`): the LM loop stops once an accepted
    # step improves the cost by < ba_tol (relative) — steady-state frames
    # typically converge in 3-6 iterations
    ba_iters: int = 12
    ba_tol: float = 1e-5
    # Schur solver for the BA/streaming path: "chol" (exact) or "cg"
    # (fixed-iteration block-Jacobi PCG; see lm.schur_solve). Init and
    # predict paths always use "chol" — they are accuracy-critical and
    # off the hot loop.
    solver: str = "chol"
    cg_iters: int = 48
    predict_iters: int = 8
    init_ba_iters: int = 30
    dtype: type = np.float32
    use_native: bool = True  # C++ host runtime (csrc/) when available
    # bootstrap mode: "external" (set_initial_state is called by the user),
    # "static" (stationary IMU init, ≙ C15), or "visual" (SfM + alignment,
    # ≙ C19's VIOInitialization)
    bootstrap: str = "external"
    excite_threshold: float = 0.25
    # marginalization precision: True = f64 on the host CPU (safest),
    # False = solver dtype on the solver device (fast; viable with the
    # Jacobi-scaled eigendecompositions + capped bias information)
    marg_on_host: bool = True
    # streaming pipeline: the whole per-frame update runs as ONE device
    # program chained frame-to-frame (estimator/stream.py) with zero host
    # synchronization on the critical path; summaries are pulled
    # asynchronously `stream_lag` frames later for the host mirror. The
    # marginalization then runs on-device in the solver dtype via the QR
    # square-root form. False = classic synchronous per-frame round trips.
    stream: bool = False
    stream_lag: int = 6
    # fetch only every k-th summary from the device (the per-pull tunnel
    # latency is the single largest frame cost at k=1 — measured 8.6 ms of
    # a 13.5 ms frame). The host mirror only needs the NEWEST summary:
    # skipped frames' keyframe poses are reconstructed from the mirror
    # after write-back (their times stay inside the knot window), and
    # skipped summaries never transfer at all.
    stream_consume_every: int = 3
    # frames after init that run the synchronous path (host f64
    # marginalization) before handing the state + prior to the f32 device
    # stream: the bootstrap transient carries large residuals (line delay
    # calibrating from 0, bootstrap scale error) where the f32 sqrt-marg
    # recursion accumulates bias; past it, f32 is proven. The handoff cost
    # is ~N x one tunnel RTT, once.
    stream_warmup: int = 40
    # IMU capacity policy: "raise" fails loudly when a window holds more
    # samples than MIMU (the reference uses every sample,
    # `trajectory_manager.cpp:388-416`); "subsample" opts into uniform
    # decimation with a warning
    imu_overflow: str = "raise"
    # reference-faithful sensor pairing (≙ GetMsgsForProcessing [2],
    # `odometry_manager.cpp:375-383`: frames queue until the latest IMU
    # reaches traj_max + 0.2 s): a frame is solved only once the IMU
    # buffer covers its spline-extension horizon (t + 0.04 s) by this
    # margin. Solving without inertial coverage leaves the newest knots
    # image-only — measured to diverge under reference-level sensor noise
    # (noiseless pixels pin them exactly, which masked the issue).
    imu_lookahead: float = 0.06
    # print the per-factor-type residual report after every frame
    # (≙ ResidualSummary, `trajectory_estimator.cpp:69-95`)
    debug_residual_summary: bool = False
    # reject the bootstrap if the first-window f64 BA can't converge below
    # this RMS (a rolling-shutter-distorted SfM init can pass the SfM
    # gates yet sit outside the BA's basin); the bootstrap then RESETS and
    # retries with a later window — ≙ the reference's retry-every-frame
    # init loop (`vio_initial.cpp:42-56`). Units: weighted residual sigma
    # per image-observation coordinate (1.0 = residuals exactly at the
    # configured measurement noise). Healthy inits (even on real tracked
    # imagery) sit <1.5; stuck basins sit at several sigma.
    init_max_rms: float = 3.0


@dataclass
class KeyframePose:
    """Final estimate of a keyframe as it leaves the window."""

    t_ns: int
    q: np.ndarray
    p: np.ndarray


class CtrlVIO:
    def __init__(self, cfg: VIOConfig, q_CtoI: np.ndarray, p_CinI: np.ndarray):
        self.cfg = cfg
        wc = cfg.window_config
        self.wc = wc
        self.traj = Trajectory(cfg.knot_dt, cfg.ld_init, cfg.fix_ld,
                               cfg.ld_lower, cfg.ld_upper)
        from . import native as native_mod

        self.use_native = bool(cfg.use_native and native_mod.available())
        if self.use_native:
            self.features = native_mod.NativeFeatureTable(wc.NB - 1, cfg.min_parallax)
        else:
            self.features = FeatureTable(wc.NB - 1, cfg.min_parallax)
        self.q_CtoI = np.asarray(q_CtoI, dtype=np.float64)
        self.p_CinI = np.asarray(p_CinI, dtype=np.float64)

        self.imu_t_ns = np.zeros(0, np.int64)
        self.imu_gyro = np.zeros((0, 3))
        self.imu_accel = np.zeros((0, 3))

        self.kf_t_ns = np.zeros(wc.NB, np.int64)
        self.bg = np.zeros((wc.NB, 3))
        self.ba = np.zeros((wc.NB, 3))
        self.gravity = np.array([0.0, 0.0, cfg.gravity_mag])

        from collections import defaultdict

        self.timing = defaultdict(float)  # per-phase cumulative seconds
        self.initialized = False
        self.frame_count = 0          # frames accumulated before init
        self.data_start_ns: Optional[int] = None
        self.prior: Optional[PriorFactor] = None
        self.win_knot0 = 0
        self.marg_flag = MARGIN_OLD
        self.keyframes: List[KeyframePose] = []
        self.last_solve_stats = None

        jdt = jnp.float64 if cfg.dtype == np.float64 else jnp.float32
        self.jdt = jdt
        self._ext = F.CamExtrinsics(
            q_CtoI=jnp.asarray(self.q_CtoI, dtype=jdt),
            p_CinI=jnp.asarray(self.p_CinI, dtype=jdt),
        )
        self._gravity_j = jnp.asarray(self.gravity, dtype=jdt)
        self._imu_info = jnp.asarray(
            [1.0 / cfg.sigma_gyro] * 3 + [1.0 / cfg.sigma_accel] * 3, dtype=jdt)
        self._sqrt_info_img = jnp.asarray(cfg.image_weight, dtype=jdt)

        self._ba_opts = SolveOptions(
            max_iters=cfg.ba_iters, fix_ld=cfg.fix_ld, ld_lower=cfg.ld_lower,
            ld_upper=cfg.ld_upper, tol=cfg.ba_tol, solver=cfg.solver,
            cg_iters=cfg.cg_iters)
        self._init_opts = self._ba_opts._replace(
            max_iters=cfg.init_ba_iters, tol=0.0, solver="chol")
        self._predict_opts = SolveOptions(
            max_iters=cfg.predict_iters, lock_bias=True, fix_ld=True)

        try:
            self._solve_device = jax.devices()[0]
        except RuntimeError:
            self._solve_device = None
        self._solve = jax.jit(
            partial(lm.solve_window, cfg=wc), static_argnames=("opts",))

        def _ba_fused(blob, ext, gravity, imu_info, sqrt_info_img,
                      opts):
            """Solve + 4-DoF gauge restore, one blob in / one packed vector
            out. Individual transfers cost ~1-10 ms EACH over the remote
            tunnel; this turns ~18 uploads + ~20 pulls per frame into 1+1.
            The marginalization prior rides inside the same blob (its 7
            leaves used to cost ~38 ms/frame in separate device_puts)."""
            img_f, imu_f, bias_f, params, fixed_f, prior_f = _blob_unpack(
                blob, wc, self.jdt)
            q_ref = params.knots_q[0]
            p_ref = params.knots_p[0]
            p_out, stats = lm.solve_window(
                params, img_f, imu_f, bias_f, prior_f, fixed_f, ext, gravity,
                imu_info, sqrt_info_img, wc, opts)
            q_new, p_new = gauge.restore_gauge(
                p_out.knots_q, p_out.knots_p, q_ref, p_ref, 0, 0)
            p_out = p_out._replace(knots_q=q_new, knots_p=p_new)
            packed = jnp.concatenate([
                q_new.reshape(-1), p_new.reshape(-1),
                p_out.bg.reshape(-1), p_out.ba.reshape(-1), p_out.dinv,
                p_out.ld[None].astype(q_new.dtype),
                jnp.stack([stats.cost0, stats.cost,
                           stats.accepted.astype(q_new.dtype)]),
            ])
            return packed, p_out

        self._ba_fused = jax.jit(_ba_fused, static_argnames=("opts",))
        # the IMU-only predict touches no image factors/landmarks: use a
        # minimal static config so its jit variant skips the image machinery
        self._predict_cfg = wc._replace(OBS=8, LM=8)
        self._solve_predict = jax.jit(
            partial(lm.solve_window, cfg=self._predict_cfg),
            static_argnames=("opts",))
        # constants reused by every predict solve (avoid per-frame allocs)
        self._predict_img = _to_j(_empty_image_factors(self._predict_cfg, cfg.dtype))
        self._predict_bias = _to_j(BiasFactors(
            sqrt_info=np.zeros((wc.NB - 1, 6), cfg.dtype),
            valid=np.zeros(wc.NB - 1, bool)))
        self._predict_prior = empty_prior(self._predict_cfg, jdt)
        self._build_prior = jax.jit(
            partial(marginalize.build_prior, cfg=wc), static_argnames=("opts",))
        # f64 prior build on the host CPU (see _solve_window_ba); the marg
        # subset keeps all its image factors but compacts landmarks into
        # dense slots (the extended Schur system shrinks from C+LM to
        # C+LM_marg, the dominant eigh cost)
        self._marg_cfg = wc._replace(OBS=min(wc.OBS, 512),
                                     MIMU=max(wc.MIMU // 4, 64), LM=96)
        self._build_prior_cpu = jax.jit(
            partial(marginalize.build_prior, cfg=self._marg_cfg),
            static_argnames=("opts",))
        self._build_prior_dev = jax.jit(
            partial(marginalize.build_prior, cfg=self._marg_cfg),
            static_argnames=("opts",))
        self._restore = jax.jit(gauge.restore_gauge)

        if cfg.stream:
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            from . import stream as stream_mod

            self._stream_mod = stream_mod
            self._megastep = jax.jit(
                partial(stream_mod.megastep, cfg=wc), static_argnames=("opts",))
            self._stream_pending: "deque" = deque()
            self._dev_state = None
            self._prev_slot_fids: dict = {}
            self._dev_knot_hi = 0  # global knot idx the device has seeds through
            # summary fetches run on worker threads: the blocking
            # device->host pull (measured 6.8 ms/frame over the tunnel —
            # 50% of the whole frame budget) overlaps the next frames'
            # host work instead of stalling the critical path. Two workers
            # so consecutive pulls overlap (each pays tunnel latency).
            self._fetcher = ThreadPoolExecutor(max_workers=2,
                                               thread_name_prefix="ctrlvio-fetch")

    # ------------------------------------------------------------------
    # ingest
    # ------------------------------------------------------------------
    def process_imu(self, t_ns: int, gyro, accel, quat=None):
        """quat (wxyz, optional): the IMU message's own attitude estimate —
        enables the active (orientation-based) bootstrap when the static
        init's stillness test can't pass (≙ `sensor_msgs/Imu.orientation`
        consumed by ActiveInitialIMUState)."""
        if self.data_start_ns is None and self.cfg.bootstrap != "external":
            self._boot_feed_imu(int(t_ns), gyro, accel, quat)
        if self.data_start_ns is not None:
            t_ns = int(t_ns) - self.data_start_ns
        self.imu_t_ns = np.append(self.imu_t_ns, np.int64(t_ns))
        self.imu_gyro = np.vstack([self.imu_gyro, np.asarray(gyro)[None]])
        self.imu_accel = np.vstack([self.imu_accel, np.asarray(accel)[None]])
        if self.initialized:
            self._drain_pending_frames()

    # ------------------------------------------------------------------
    # self-bootstrap (≙ the init state machine in ProcessVIOData,
    # `odometry_manager.cpp:178-247`)
    # ------------------------------------------------------------------
    def _boot_feed_imu(self, t_ns, gyro, accel, quat=None):
        from .initializer import ActiveInitializer, StaticInitializer

        if self.cfg.bootstrap == "static":
            if not hasattr(self, "_static_init"):
                self._static_init = StaticInitializer(
                    excite_threshold=0.5, gravity_mag=self.cfg.gravity_mag)
                self._active_init = ActiveInitializer(
                    gravity_mag=self.cfg.gravity_mag)
            # static first, then the orientation-based fallback
            # (≙ IMUInitializer::InitialIMUState, inertial_initializer.cpp:49-58)
            st = self._static_init.feed(t_ns, gyro, accel)
            if st is None and quat is not None:
                st = self._active_init.feed(t_ns, quat)
            if st is not None:
                self._pending_init = st
        elif self.cfg.bootstrap == "visual":
            if not hasattr(self, "_vio_init"):
                from .vio_init import VIOInitializer

                self._vio_init = VIOInitializer(
                    self.q_CtoI, self.p_CinI, gravity_mag=self.cfg.gravity_mag,
                    window_size=self.wc.NB - 1,
                    excite_threshold=self.cfg.excite_threshold)
            self._vio_init.feed_imu(t_ns, gyro, accel)

    def _boot_feed_frame(self, t_ns, ids, pts) -> bool:
        """Returns True once the bootstrap produced an initial state (and
        set_initial_state was applied)."""
        st = None
        if self.cfg.bootstrap == "static":
            st = getattr(self, "_pending_init", None)
            if st is not None:
                st.t_ns = t_ns  # anchor at this frame
                q0, p0 = st.q, st.p
        elif self.cfg.bootstrap == "visual":
            if hasattr(self, "_vio_init"):
                st = self._vio_init.feed_frame(t_ns, ids, pts)
        if st is None:
            return False
        self.set_initial_state(st.t_ns, st.q, st.p, st.bg, st.ba, st.gravity,
                               v0=st.v)
        return True

    def set_initial_state(self, t0_ns: int, q0, p0, bg, ba, gravity, v0=None):
        """Bootstrap state (≙ SetInitialState, `odometry_manager.cpp:416-448`):
        gravity-aligned initial pose at the first frame time, biases, gravity,
        optional initial velocity. Shifts the time origin to t0."""
        from .initializer import InitialState

        self.data_start_ns = int(t0_ns)
        self.imu_t_ns = self.imu_t_ns - self.data_start_ns
        keep = self.imu_t_ns >= 0
        self.imu_t_ns = self.imu_t_ns[keep]
        self.imu_gyro = self.imu_gyro[keep]
        self.imu_accel = self.imu_accel[keep]
        self.gravity = np.asarray(gravity, dtype=np.float64)
        self._gravity_j = jnp.asarray(self.gravity, dtype=self.jdt)
        self.bg[:] = np.asarray(bg)
        self.ba[:] = np.asarray(ba)
        self._init_state = InitialState(
            t_ns=0, q=np.asarray(q0), p=np.asarray(p0), bg=np.asarray(bg),
            ba=np.asarray(ba), gravity=self.gravity,
            v=None if v0 is None else np.asarray(v0))
        self.traj.set_flat(q0, p0, self.traj.dt_ns)

    # ------------------------------------------------------------------
    # image front-end (≙ OdometryManager owning FeatureTrackerNode and
    # calling it in-process from the replay loop, `odometry_manager.h:70-73`)
    # ------------------------------------------------------------------
    def attach_frontend(self, camera, image_shape, tracker_cfg=None,
                        fused: bool = True):
        """Attach the KLT front-end so raw images can be fed directly.

        camera: a model from `models.cameras` (lift: pixel -> normalized);
        image_shape: (H, W); tracker_cfg: frontend.tracker.TrackerConfig.

        fused=True (default) uses the single-dispatch FusedTracker with
        gyro-predicted initial flow computed from this estimator's own IMU
        buffer (and current gyro-bias estimate); fused=False keeps the
        classic multi-dispatch FeatureTracker (reject_wf supported there)."""
        from ctrlvio_tpu.frontend.tracker import FeatureTracker, TrackerConfig

        tcfg = tracker_cfg or TrackerConfig()
        if fused and not tcfg.reject_wf:
            from ctrlvio_tpu.frontend.fused import FusedTracker

            self.tracker = FusedTracker(tcfg, camera, image_shape)
        else:
            self.tracker = FeatureTracker(tcfg, camera, image_shape)
        self._prev_img_t_ns = None

    def process_image(self, t_ns: int, img: np.ndarray):
        """Feed one raw image: CLAHE -> pyramidal KLT (gyro-predicted in
        fused mode) -> undistort -> feature frame -> per-frame estimation.
        Returns the pose estimate like process_frame, or None for
        rate-gated frames / pre-init.
        ≙ ImageMsgHandle -> img_callback -> PerformCtrlVIO."""
        assert getattr(self, "tracker", None) is not None, \
            "call attach_frontend(camera, image_shape) first"
        from ctrlvio_tpu.frontend.fused import FusedTracker, rotation_flow

        if isinstance(self.tracker, FusedTracker):
            M = None
            if self._prev_img_t_ns is not None and len(self.imu_t_ns):
                from ctrlvio_tpu.ops import so3np

                R_ic = so3np.quat_to_matrix(self.q_CtoI[None])[0]
                # the IMU buffer rebases to data_start_ns at init; frame
                # times stay absolute — query in the buffer's timebase
                base = self.data_start_ns or 0
                M = rotation_flow(self.imu_t_ns, self.imu_gyro,
                                  self._prev_img_t_ns - base,
                                  int(t_ns) - base, R_ic, bg=self.bg[-1])
            out = self.tracker.step(int(t_ns), img, R_rel=M)
            self._prev_img_t_ns = int(t_ns)
            # publish-rate gate (≙ feature_tracker_node.cpp:80-93): track
            # every frame, run estimation at cfg.freq
            cfgf = self.tracker.cfg.freq
            first = getattr(self, "_img_first_t_ns", None)
            if first is None:
                self._img_first_t_ns = int(t_ns)
                self._img_pub = 0
            elapsed = (int(t_ns) - self._img_first_t_ns) * 1e-9
            if elapsed > 0 and self._img_pub / elapsed > cfgf:
                return None
            self._img_pub = getattr(self, "_img_pub", 0) + 1
        else:
            out = self.tracker.process(int(t_ns), img)
        if out is None:
            return None
        return self.process_frame(out["t_ns"], out["ids"], out["pts"],
                                  out["rows"])

    # ------------------------------------------------------------------
    # per-frame pipeline
    # ------------------------------------------------------------------
    def process_frame(self, t_ns: int, ids, pts, rows):
        """Feed one feature frame. Returns the current IMU pose estimate
        (q, p) at the frame time, or None before initialization."""
        if self.cfg.bootstrap != "external" and not self.initialized:
            # retained for bootstrap retries (absolute times): if the
            # first-window BA rejects the init, these replay into a fresh
            # initializer so the retry starts from the newest window
            from collections import deque

            if not hasattr(self, "_recent_frames"):
                self._recent_frames = deque(maxlen=self.wc.NB + 4)
            self._recent_frames.append(
                (int(t_ns), np.asarray(ids).copy(), np.asarray(pts).copy(),
                 np.asarray(rows).copy()))
        if self.data_start_ns is None and self.cfg.bootstrap != "external":
            if not self._boot_feed_frame(int(t_ns), ids, pts):
                return None
            # fall through: this frame becomes the first window frame
        assert self.data_start_ns is not None, "call set_initial_state first"
        t_ns = int(t_ns) - self.data_start_ns
        wc = self.wc

        if not self.initialized:
            return self._accumulate_init_frame(t_ns, ids, pts, rows)

        # defer until the IMU buffer covers this frame's extension horizon
        # (≙ the reference queueing frames behind the coverage check); the
        # deferred frame is solved by a later process_imu, and the caller
        # still gets the freshest online (IMU-forecast) pose estimate
        self._drain_pending_frames()
        if not self._imu_covers(t_ns):
            from collections import deque

            if not hasattr(self, "_pending_frames"):
                self._pending_frames = deque()
            self._pending_frames.append(
                (t_ns, np.asarray(ids).copy(), np.asarray(pts).copy(),
                 np.asarray(rows).copy()))
            return self._forecast_pose(t_ns)
        return self._process_frame_ready(t_ns, ids, pts, rows)

    def _imu_covers(self, t_ns: int) -> bool:
        need = int(t_ns) + int(self.cfg.imu_lookahead * S_TO_NS)
        return len(self.imu_t_ns) > 0 and int(self.imu_t_ns[-1]) >= need

    def _drain_pending_frames(self):
        q = getattr(self, "_pending_frames", None)
        while q and self._imu_covers(q[0][0]):
            t_ns, ids, pts, rows = q.popleft()
            self._process_frame_ready(t_ns, ids, pts, rows)

    def _process_frame_ready(self, t_ns: int, ids, pts, rows):
        """Steps [0]-[9] of the per-frame pipeline, with IMU coverage
        guaranteed through the extension horizon."""
        wc = self.wc
        import time as _time

        stream_active = False
        if self.cfg.stream:
            self._stream_frame_no = getattr(self, "_stream_frame_no", 0) + 1
            stream_active = self._stream_frame_no > self.cfg.stream_warmup
        if stream_active:
            # [0] consume summaries that are due (lagged host mirror update).
            # The lag ramps open over the first streamed frames so the
            # mirror stays fresh right after the warmup handoff.
            t0 = _time.perf_counter()
            since = self._stream_frame_no - self.cfg.stream_warmup
            lag = min(self.cfg.stream_lag, max(0, since - 5))
            n_before = len(self._stream_pending)
            self._consume_summaries(lag)
            if len(self._stream_pending) < n_before:
                # re-integrate the mirror's dead-reckoned tail from the
                # freshly solved end — otherwise tip knots chain off stale
                # dead-reckoned states and the online estimate random-walks
                t_dr = _time.perf_counter()
                hi = self._mirror_solved_hi
                if hi < self.traj.n:
                    self._deadreckon_extension(
                        int((hi - 3) * self.traj.dt_ns), hi - 1,
                        self.traj.max_time_ns)
                self.timing["consume_dr"] += _time.perf_counter() - t_dr
            self.timing["consume"] += _time.perf_counter() - t0

        # [2] feature update + keyframe decision (new frame -> slot NB-1)
        is_kf = self.features.add_frame(wc.NB - 1, ids, pts, rows)
        self.marg_flag = MARGIN_OLD if is_kf else MARGIN_SECOND_NEW
        self.kf_t_ns[wc.NB - 1] = t_ns
        self.bg[wc.NB - 1] = self.bg[wc.NB - 2]
        self.ba[wc.NB - 1] = self.ba[wc.NB - 2]

        # [3] extend trajectory + [4] IMU-only predict
        t0 = _time.perf_counter()
        self._extend_and_predict(t_ns)
        self.timing["predict"] += _time.perf_counter() - t0

        # [5] triangulate new landmarks at current spline estimate
        t0 = _time.perf_counter()
        self._triangulate()
        self.timing["triangulate"] += _time.perf_counter() - t0

        # [6-9] full BA + gauge + marginalization + slide
        if stream_active:
            t0 = _time.perf_counter()
            self._stream_dispatch()
            self.timing["dispatch"] += _time.perf_counter() - t0
            t0 = _time.perf_counter()
            self._slide_window(record_keyframe=False)
            self.timing["slide"] += _time.perf_counter() - t0
        else:
            t0 = _time.perf_counter()
            self._solve_window_ba()
            self.timing["ba"] += _time.perf_counter() - t0

            # [9] slide
            t0 = _time.perf_counter()
            self._slide_window()
            self.timing["slide"] += _time.perf_counter() - t0

        if self.cfg.debug_residual_summary:
            import sys as _sys

            print(self.residual_summary().report(), file=_sys.stderr)

        if stream_active:
            # ONLINE forecast: integrate raw IMU from the last well-solved
            # spline state directly to t_ns. Evaluating the spline at its
            # extrapolated tip instead costs ~5 cm of pure representation
            # error (the dead-reckon-seeded tip knots approximate the cubic
            # blend, and the newest knots have no image factors yet) —
            # measured as the entire online-vs-post-hoc ATE gap of r3.
            return self._forecast_pose(t_ns)
        q, p = self.traj.pose(t_ns)
        return q[0], p[0]

    # ------------------------------------------------------------------
    def _forecast_pose(self, t_ns: int):
        """Online pose at t_ns: midpoint IMU integration from the newest
        image-constrained spline state (≙ the reference's IMU propagation
        for the between-solve state, `visual_odometry.cpp:137-172`)."""
        from ctrlvio_tpu.ops import so3np

        from .initializer import InitialState, dead_reckon_poses

        dt_ns = int(self.traj.dt_ns)
        hi = getattr(self, "_mirror_solved_hi", self.traj.n)
        # the last ~3 knots before hi are weakly constrained (no image
        # factors yet); anchor below them, inside the solid region
        t0 = max((hi - 4) * dt_ns, 0)
        q0, p0 = self.traj.pose(t0)
        i0 = min(self.traj.ctrl_idx(t0), self.traj.n - 4)
        u = (t0 - i0 * dt_ns) / dt_ns
        v0 = so3np.rd_eval(self.traj.knots_p[i0 : i0 + 4], np.float64(u),
                           1.0 / self.traj.dt, 1)
        st = InitialState(t_ns=0, q=q0[0], p=p0[0], bg=self.bg[-1],
                          ba=self.ba[-1], gravity=self.gravity, v=v0)
        sel = (self.imu_t_ns >= t0) & (self.imu_t_ns <= t_ns)
        kq, kp = dead_reckon_poses(
            np.array([t_ns - t0], np.int64), self.imu_t_ns[sel] - t0,
            self.imu_gyro[sel], self.imu_accel[sel], st)
        return kq[0], kp[0]

    # ------------------------------------------------------------------
    def residual_summary(self):
        """Per-factor-type residual statistics at the current estimate
        (≙ the reference's per-solve ResidualSummary,
        `trajectory_estimator.cpp:69-95` — its de-facto regression signal).
        Re-packs the current window and linearizes at the host-mirror state
        in f64; diagnostic path, not on the hot loop."""
        from ctrlvio_tpu.solver import assemble
        from ctrlvio_tpu.utils.summary import ResidualSummary

        self.flush()
        wc = self.wc
        win0 = self.traj.ctrl_idx(self.kf_t_ns[0])
        kq, kp, _ = self.traj.window(win0, wc.KW, np.float64)
        if self.use_native:
            img, dinv0, _ = self.features.pack_image_factors(
                self.kf_t_ns, self.traj.dt, win0, wc, np.float64)
        else:
            img, dinv0, _ = packing.pack_image_factors(
                list(self.features.tracks.values()), self.kf_t_ns,
                self.traj.dt, win0, wc, np.float64)
        imu = packing.pack_imu_factors(
            self.imu_t_ns, self.imu_gyro, self.imu_accel, self.kf_t_ns,
            win0 * int(self.traj.dt_ns), self.traj.max_time_ns, self.traj.dt,
            win0, wc, np.float64, on_overflow="subsample")
        bias = packing.bias_sqrt_info(self.imu_t_ns, self.kf_t_ns,
                                      self.cfg.sigma_bg, self.cfg.sigma_ba,
                                      wc, np.float64)
        prior = self.prior
        if self.cfg.stream and getattr(self, "_dev_state", None) is not None:
            prior = self._dev_state.prior
        to64 = lambda t: jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float64)
            if np.issubdtype(np.asarray(x).dtype, np.floating)
            else np.asarray(x), t)
        if prior is None:
            prior = empty_prior(wc, jnp.float64)
        params = WindowParams(
            knots_q=jnp.asarray(kq), knots_p=jnp.asarray(kp),
            bg=jnp.asarray(self.bg, jnp.float64),
            ba=jnp.asarray(self.ba, jnp.float64),
            dinv=jnp.asarray(dinv0, jnp.float64),
            ld=jnp.asarray(self.traj.line_delay, jnp.float64))
        lin = assemble.linearize(
            params, _to_j(to64(img)), _to_j(to64(imu)), _to_j(to64(bias)),
            _to_j(to64(prior)), to64(self._ext),
            jnp.asarray(self.gravity, jnp.float64),
            jnp.asarray(np.asarray(self._imu_info), jnp.float64),
            jnp.asarray(float(self._sqrt_info_img), jnp.float64),
            wc, self._ba_opts)
        return ResidualSummary.from_linearization(lin, wc)

    # ------------------------------------------------------------------
    def _accumulate_init_frame(self, t_ns, ids, pts, rows):
        wc = self.wc
        self.features.add_frame(self.frame_count, ids, pts, rows)
        self.kf_t_ns[self.frame_count] = t_ns
        self.frame_count += 1
        if self.frame_count < wc.NB:
            return None

        # window full: bootstrap the whole first window.
        # Knots start from IMU dead-reckoning (an improvement over the
        # reference's flat init — better conditioned first BA), then an
        # IMU-only LM refines the spline fit, then the long BA.
        from .initializer import dead_reckon_poses

        self.win_knot0 = 0
        self.marg_flag = MARGIN_OLD
        self.traj.extend_to(t_ns + int(0.04 * S_TO_NS))
        # cubic B-spline: curve(i*dt) ~ (P_i + 4 P_{i+1} + P_{i+2})/6, so knot
        # P_i should carry the pose at (i-1)*dt for the curve to match the
        # dead-reckoned trajectory
        knot_ts = (np.arange(self.traj.n, dtype=np.int64) - 1) \
            * int(self.traj.dt_ns)
        kq, kp = dead_reckon_poses(knot_ts, self.imu_t_ns, self.imu_gyro,
                                   self.imu_accel, self._init_state)
        self.traj.knots_q[: self.traj.n] = kq
        self.traj.knots_p[: self.traj.n] = kp
        self._extend_and_predict(t_ns, from_start=True)
        self._triangulate()
        # The first-window BA runs ONCE in f64 on the host CPU regardless of
        # the solve dtype: a visual bootstrap carries %-level scale/gravity
        # errors, and from that far out the f32 normal equations stall short
        # of the basin (measured: bias blow-up ~10 frames later through the
        # marg-prior feedback), while one f64 solve lands at machine floor.
        # Steady-state frames start near the solution, where f32 is proven.
        n_img_obs = self._init_solve_f64()
        # Quality gate in MEASUREMENT units, not absolute cost: the RMS
        # weighted residual per image-observation coordinate. 1.0 = the
        # residuals average exactly the configured measurement sigma
        # (image_weight); a non-converged RS-distorted init sits at many
        # sigma. Absolute cost can't serve here — it scales with the
        # observation count and the front-end's noise level (a healthy
        # KLT-tracked init on real imagery carries cost ~1e3 that a
        # noiseless feature-sim init does not).
        cost = float(self.last_solve_stats.cost)
        rms = np.sqrt(2.0 * cost / max(2 * n_img_obs, 1))
        if self.cfg.bootstrap != "external" and rms > self.cfg.init_max_rms:
            # the window BA could not converge (RS-distorted SfM init
            # outside the basin): reject and retry with a later window
            import sys as _sys

            print(f"[ctrlvio] bootstrap rejected (init BA residual RMS "
                  f"{rms:.2f} sigma > {self.cfg.init_max_rms}, cost "
                  f"{cost:.1f} over {n_img_obs} obs); retrying with a "
                  f"later window", file=_sys.stderr)
            self._reset_bootstrap()
            return None
        if self.cfg.bootstrap != "external":
            import sys as _sys

            print(f"[ctrlvio] bootstrap accepted (init BA residual RMS "
                  f"{rms:.2f} sigma, cost {cost:.1f} over {n_img_obs} obs)",
                  file=_sys.stderr)
        self._slide_window()
        self.initialized = True
        q, p = self.traj.pose(t_ns)
        return q[0], p[0]

    # ------------------------------------------------------------------
    def _reset_bootstrap(self):
        """Roll back a rejected initialization and re-arm the bootstrap
        (≙ the reference's init retrying every frame until success,
        `vio_initial.cpp:42-56`). Buffered IMU and the recent feature
        frames replay into a fresh initializer so the retry uses the
        newest window."""
        shift = self.data_start_ns
        self.data_start_ns = None
        self.imu_t_ns = self.imu_t_ns + shift  # back to absolute time
        self.frame_count = 0
        self.kf_t_ns[:] = 0
        self.bg[:] = 0.0
        self.ba[:] = 0.0
        self.prior = None
        self._prior_cpu64 = None
        self._init_prior = None
        self._stream_frame_no = 0
        self._dev_knot_hi = 0
        self.traj = Trajectory(self.cfg.knot_dt, self.cfg.ld_init,
                               self.cfg.fix_ld, self.cfg.ld_lower,
                               self.cfg.ld_upper)
        from . import native as native_mod

        if self.use_native:
            self.features = native_mod.NativeFeatureTable(
                self.wc.NB - 1, self.cfg.min_parallax)
        else:
            self.features = FeatureTable(self.wc.NB - 1, self.cfg.min_parallax)
        # fresh initializer, re-fed from the buffers
        for attr in ("_vio_init", "_static_init", "_pending_init"):
            if hasattr(self, attr):
                delattr(self, attr)
        if self.cfg.bootstrap == "visual":
            for k in range(len(self.imu_t_ns)):
                self._boot_feed_imu(int(self.imu_t_ns[k]), self.imu_gyro[k],
                                    self.imu_accel[k])
            for (t_abs, ids, pts, rows) in list(
                    getattr(self, "_recent_frames", [])):
                if self.data_start_ns is not None:
                    break  # a replayed window already re-initialized
                self._boot_feed_frame(t_abs, ids, pts)

    # ------------------------------------------------------------------
    def _init_solve_f64(self):
        """One-time f64 CPU bootstrap BA + marginalization prior
        (≙ the first UpdateTrajectory after SetInitialState/InitWindow)."""
        from ctrlvio_tpu.utils.hostmath import on_cpu

        wc, cfg = self.wc, self.cfg
        self.win_knot0 = self.traj.ctrl_idx(self.kf_t_ns[0])
        kq, kp, n_active = self.traj.window(self.win_knot0, wc.KW, np.float64)
        if self.use_native:
            img, dinv0, _ = self.features.pack_image_factors(
                self.kf_t_ns, self.traj.dt, self.win_knot0, wc, np.float64)
        else:
            img, dinv0, _ = packing.pack_image_factors(
                list(self.features.tracks.values()), self.kf_t_ns,
                self.traj.dt, self.win_knot0, wc, np.float64)
        t_lo = self.win_knot0 * int(self.traj.dt_ns)
        imu = packing.pack_imu_factors(
            self.imu_t_ns, self.imu_gyro, self.imu_accel, self.kf_t_ns,
            t_lo, self.traj.max_time_ns, self.traj.dt, self.win_knot0, wc,
            np.float64, on_overflow=cfg.imu_overflow)
        bias = packing.bias_sqrt_info(self.imu_t_ns, self.kf_t_ns,
                                      cfg.sigma_bg, cfg.sigma_ba, wc,
                                      np.float64)
        fixed = np.ones(wc.KW, bool)
        fixed[:n_active] = False
        to64 = lambda t: jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float64)
            if np.issubdtype(np.asarray(x).dtype, np.floating)
            else np.asarray(x), t)
        params = WindowParams(
            knots_q=jnp.asarray(kq), knots_p=jnp.asarray(kp),
            bg=jnp.asarray(self.bg, jnp.float64),
            ba=jnp.asarray(self.ba, jnp.float64),
            dinv=jnp.asarray(dinv0, jnp.float64),
            ld=jnp.asarray(self.traj.line_delay, jnp.float64))
        ext64 = F.CamExtrinsics(q_CtoI=jnp.asarray(self.q_CtoI),
                                p_CinI=jnp.asarray(self.p_CinI))
        grav64 = jnp.asarray(self.gravity, jnp.float64)
        info64 = jnp.asarray(np.asarray(self._imu_info), jnp.float64)
        w64 = jnp.asarray(float(self._sqrt_info_img), jnp.float64)
        opts = self._init_opts
        k1 = self.traj.ctrl_idx(self.kf_t_ns[1]) - self.win_knot0
        drop = np.zeros(wc.KW, bool)
        drop[:k1] = True
        with on_cpu():
            p_out, stats = jax.jit(
                partial(lm.solve_window, cfg=wc), static_argnames=("opts",))(
                params, _to_j(to64(img)), _to_j(to64(imu)), _to_j(to64(bias)),
                empty_prior(wc, jnp.float64), jnp.asarray(fixed), ext64,
                grav64, info64, w64, opts=opts)
            q_new, p_new = gauge.restore_gauge(
                p_out.knots_q, p_out.knots_p, params.knots_q[0],
                params.knots_p[0], 0, 0)
            p_out = p_out._replace(knots_q=q_new, knots_p=p_new)
            prior64 = marginalize.build_prior_sqrt(
                p_out, _to_j(to64(img)), _to_j(to64(imu)), _to_j(to64(bias)),
                empty_prior(wc, jnp.float64), jnp.asarray(drop), ext64,
                grav64, info64, w64, wc, opts._replace(cauchy_c=1.0),
                knot_shift=jnp.asarray(k1, jnp.int32),
                bias_shift=jnp.asarray(1, jnp.int32))
            prior64 = jax.tree_util.tree_map(np.asarray, prior64)

        from types import SimpleNamespace

        self.last_solve_stats = SimpleNamespace(
            cost0=float(stats.cost0), cost=float(stats.cost),
            accepted=float(stats.accepted))
        self.traj.write_back(self.win_knot0, np.asarray(p_out.knots_q),
                             np.asarray(p_out.knots_p), n_active)
        self.bg = np.asarray(p_out.bg, np.float64).copy()
        self.ba = np.asarray(p_out.ba, np.float64).copy()
        if not cfg.fix_ld:
            self.traj.line_delay = float(np.clip(
                p_out.ld, cfg.ld_lower, cfg.ld_upper))
        dinv_np = np.asarray(p_out.dinv, np.float64)
        if self.use_native:
            self.features.set_depths(dinv_np.astype(np.float32))
        else:
            # python-table path: depths by current candidates order
            self.features.set_depths_by_id(
                self.features.slot_fids(wc.LM), dinv_np[: wc.LM])
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), self.jdt)
            if np.issubdtype(np.asarray(x).dtype, np.floating)
            else jnp.asarray(np.asarray(x)), t)
        # numpy f64 seeds the sync/warmup marg chain; the cast copy rides in
        # sync solves and seeds the device stream state at handoff
        self._prior_cpu64 = prior64
        self.prior = cast(prior64)
        if self.cfg.stream:
            self._init_prior = cast(prior64)
        return int(np.asarray(img.valid).sum())

    # ------------------------------------------------------------------
    def _extend_and_predict(self, t_ns: int, from_start: bool = False):
        """≙ ExtendTrajectory + InitTrajectory (predict of new knots).

        The per-frame extension (1-2 knots) is initialized by host-side IMU
        dead-reckoning from the spline's end state — equivalent quality to
        the reference's IMU-only LM (`InitTrajectory`) at ~zero cost, since
        the full BA refines these knots immediately anyway. The LM predict
        path still runs for the bootstrap (from_start) where the whole
        window must be fit."""
        wc = self.wc
        max_bef_ns = self.traj.max_time_ns
        max_bef_idx = self.traj.n - 1
        self.traj.extend_to(t_ns + int(0.04 * S_TO_NS))
        max_aft_ns = self.traj.max_time_ns
        if max_aft_ns <= max_bef_ns and not from_start:
            return

        if not from_start:
            import time as _t2

            _x = _t2.perf_counter()
            self._deadreckon_extension(max_bef_ns, max_bef_idx, max_aft_ns)
            self.timing["predict_dr"] += _t2.perf_counter() - _x
            return

        pc = self._predict_cfg
        t_lo = 0 if from_start else max_bef_ns
        kq, kp, n_active = self.traj.window(self.win_knot0, pc.KW, np.float64)
        params = WindowParams(
            knots_q=jnp.asarray(kq, self.jdt), knots_p=jnp.asarray(kp, self.jdt),
            bg=jnp.asarray(self.bg, self.jdt), ba=jnp.asarray(self.ba, self.jdt),
            dinv=jnp.full((pc.LM,), 0.2, self.jdt),
            ld=jnp.asarray(self.traj.line_delay, self.jdt),
        )
        imu = packing.pack_imu_factors(
            self.imu_t_ns, self.imu_gyro, self.imu_accel, self.kf_t_ns,
            t_lo, max_aft_ns, self.traj.dt, self.win_knot0, pc, self.cfg.dtype,
            on_overflow=self.cfg.imu_overflow)
        img = self._predict_img
        bias = self._predict_bias

        fixed = np.ones(wc.KW, bool)
        lo = 0 if from_start else (max_bef_idx - self.win_knot0 + 1)
        lo = max(lo, 4 if from_start else 0)
        fixed[lo:n_active] = False
        if from_start:
            fixed[:4] = True

        p_out, stats = self._solve_predict(
            params, img, _to_j(imu), bias,
            self._predict_prior, jnp.asarray(fixed), self._ext,
            self._gravity_j, self._imu_info, self._sqrt_info_img,
            opts=self._predict_opts)
        self.traj.write_back(self.win_knot0, np.asarray(p_out.knots_q),
                             np.asarray(p_out.knots_p), n_active)

    # ------------------------------------------------------------------
    def _deadreckon_extension(self, max_bef_ns: int, max_bef_idx: int,
                              max_aft_ns: int):
        """Fill newly appended knots by integrating IMU from the spline's
        end state (numpy; replaces a device LM round trip per frame)."""
        from ctrlvio_tpu.ops import so3np

        from .initializer import InitialState, dead_reckon_poses

        dt_ns = int(self.traj.dt_ns)
        # spline end state at the last well-constrained time
        t0 = max(max_bef_ns - dt_ns, 0)
        q0, p0 = self.traj.pose(t0)
        i0 = min(self.traj.ctrl_idx(t0), self.traj.n - 4)
        u = (t0 - i0 * dt_ns) / dt_ns
        v0 = so3np.rd_eval(self.traj.knots_p[i0 : i0 + 4], np.float64(u),
                           1.0 / self.traj.dt, 1)
        st = InitialState(t_ns=0, q=q0[0], p=p0[0], bg=self.bg[-1],
                          ba=self.ba[-1], gravity=self.gravity, v=v0)
        # new knots carry poses at (i-1)*dt (cubic B-spline offset)
        new_idx = np.arange(max_bef_idx + 1, self.traj.n, dtype=np.int64)
        knot_ts = (new_idx - 1) * dt_ns - t0
        # bound by the needed horizon: drivers may pre-feed IMU far beyond
        # the current frame (integrating it would be pure waste)
        sel = (self.imu_t_ns >= t0) & (self.imu_t_ns <= max_aft_ns)
        kq, kp = dead_reckon_poses(
            knot_ts, self.imu_t_ns[sel] - t0, self.imu_gyro[sel],
            self.imu_accel[sel], st)
        self.traj.knots_q[new_idx] = kq
        self.traj.knots_p[new_idx] = kp

    # ------------------------------------------------------------------
    def _triangulate(self):
        nb = self.wc.NB
        cam_q, cam_p = self.traj.camera_pose(self.kf_t_ns[:nb], self.q_CtoI, self.p_CinI)
        self.features.triangulate(cam_q, cam_p)

    # ------------------------------------------------------------------
    def _solve_window_ba(self, init: bool = False):
        import time as _time

        _t = _time.perf_counter
        t_pack0 = _t()
        wc = self.wc
        cfg = self.cfg
        self.win_knot0 = self.traj.ctrl_idx(self.kf_t_ns[0])
        span = self.traj.n - self.win_knot0
        if span > wc.KW:
            raise RuntimeError(
                f"window spans {span} knots > KW={wc.KW}: keyframe gaps too "
                f"large for the configured knot capacity; raise WindowConfig.KW")
        kq, kp, n_active = self.traj.window(self.win_knot0, wc.KW, np.float64)

        if self.use_native:
            img, dinv0, _ = self.features.pack_image_factors(
                self.kf_t_ns, self.traj.dt, self.win_knot0, wc, cfg.dtype)
            cands = None
        else:
            img, dinv0, cands = packing.pack_image_factors(
                list(self.features.tracks.values()), self.kf_t_ns, self.traj.dt,
                self.win_knot0, wc, cfg.dtype)
        t_lo = self.win_knot0 * int(self.traj.dt_ns)
        imu = packing.pack_imu_factors(
            self.imu_t_ns, self.imu_gyro, self.imu_accel, self.kf_t_ns,
            t_lo, self.traj.max_time_ns, self.traj.dt, self.win_knot0, wc,
            cfg.dtype, on_overflow=cfg.imu_overflow)
        bias = packing.bias_sqrt_info(self.imu_t_ns, self.kf_t_ns, cfg.sigma_bg,
                                      cfg.sigma_ba, wc, cfg.dtype)
        # no knots are hard-fixed (≙ UpdateTrajectory, which never calls
        # SetFixedIndex): LM damping spans the 4-DoF gauge null space and the
        # post-solve restore re-anchors yaw+position. Hard-anchoring the
        # first knots would lock in any gravity tilt of the bootstrap frame
        # (pitch/roll ARE observable and must stay free to rotate).
        fixed = np.ones(wc.KW, bool)
        fixed[:n_active] = False
        blob = _blob_pack(img, imu, bias, kq, kp, self.bg, self.ba, dinv0,
                          self.traj.line_delay, fixed, self.prior, wc,
                          np.float64 if self.jdt == jnp.float64 else np.float32)
        self.timing["ba_pack"] += _t() - t_pack0

        opts = self._init_opts if init else self._ba_opts
        t0 = _t()
        # [6+7] fused solve + gauge restore; one upload, one pull
        packed, p_out = self._ba_fused(
            blob, self._ext, self._gravity_j,
            self._imu_info, self._sqrt_info_img, opts=opts)
        host = np.asarray(packed, dtype=np.float64)
        self.timing["ba_solve"] += _t() - t0

        # unpack
        wcK, wcB, wcL = wc.KW, wc.NB, wc.LM
        o = 0
        kq_np = host[o : o + 4 * wcK].reshape(wcK, 4); o += 4 * wcK
        kp_np = host[o : o + 3 * wcK].reshape(wcK, 3); o += 3 * wcK
        bg_np = host[o : o + 3 * wcB].reshape(wcB, 3); o += 3 * wcB
        ba_np = host[o : o + 3 * wcB].reshape(wcB, 3); o += 3 * wcB
        dinv_np = host[o : o + wcL]; o += wcL
        ld_np = host[o]; o += 1
        from types import SimpleNamespace

        self.last_solve_stats = SimpleNamespace(
            cost0=host[o], cost=host[o + 1], accepted=host[o + 2])

        # write back state
        t0 = _t()
        self.traj.write_back(self.win_knot0, kq_np, kp_np, n_active)
        if not self.cfg.fix_ld:  # fixed ld stays bit-exact (blob is f32)
            self.traj.line_delay = float(ld_np)
        self.bg = bg_np.copy()
        self.ba = ba_np.copy()
        if self.use_native:
            self.features.set_depths(dinv_np.astype(np.float32))
        else:
            self.features.set_depths(dinv_np, cands)
        self.timing["ba_writeback"] += _t() - t0

        # [8] marginalization prior (at the gauge-restored state).
        # Built in f64 regardless of the solve dtype: the Schur complement +
        # eigendecomposition spans too much dynamic range for f32, and a
        # corrupted prior biases every subsequent solve. The result is cast
        # back to the solve dtype (magnitudes are f32-representable).
        if self.marg_flag == MARGIN_OLD or init:
            k0 = 0  # ctrl(ts0) window-relative
            k1 = self.traj.ctrl_idx(self.kf_t_ns[1]) - self.win_knot0
            drop = np.zeros(wc.KW, bool)
            drop[k0:k1] = True
            from ctrlvio_tpu.utils.hostmath import on_cpu

            to64 = lambda t: jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float64)
                if np.issubdtype(np.asarray(x).dtype, np.floating) else np.asarray(x), t)
            img_m = _compact_factors(img, img.valid & img.marg_drop,
                                     self._marg_cfg.OBS)
            imu_m = _compact_factors(imu, imu.valid & imu.marg_drop,
                                     self._marg_cfg.MIMU)
            # remap marginalized landmarks into dense slots; build the marg
            # linearization point from the already-pulled host state (no
            # further device->host round trips)
            img_m, dinv_m = _compact_landmarks(img_m, dinv_np, self._marg_cfg.LM)
            p_marg = WindowParams(
                knots_q=kq_np, knots_p=kp_np, bg=bg_np, ba=ba_np,
                dinv=dinv_m, ld=np.float64(ld_np))
            # the prior comes out pre-rolled into the post-slide layout so
            # nothing downstream has to block on it (fully async: CPU f64
            # compute -> cast -> transfer to TPU, consumed next frame)
            knot_shift = (self.traj.ctrl_idx(self.kf_t_ns[1])
                          - self.traj.ctrl_idx(self.kf_t_ns[0]))
            old_prior = (self.prior if self.prior is not None
                         else empty_prior(wc, self.jdt))
            t0 = _time.perf_counter()
            if self.cfg.marg_on_host:
                # full f64 build on the host CPU (async): the marg Schur
                # cancellation amplifies input error, so f32 factor
                # Jacobians are NOT enough (measured: f32 linearize + f64
                # Schur drifts 1 m where full f64 stays at millimetres)
                with on_cpu():
                    prior64 = self._build_prior_cpu(
                        p_marg, to64(img_m), to64(imu_m),
                        to64(bias),
                        getattr(self, "_prior_cpu64", None) or to64(old_prior),
                        np.asarray(drop),
                        to64(self._ext), np.asarray(self.gravity, np.float64),
                        np.asarray(self._imu_info, np.float64),
                        np.float64(self._sqrt_info_img),
                        knot_shift=jnp.asarray(knot_shift, jnp.int32),
                        bias_shift=jnp.asarray(1, jnp.int32),
                        opts=opts._replace(cauchy_c=1.0))
                    prior_cast = jax.tree_util.tree_map(
                        lambda x: x.astype(self.jdt)
                        if jnp.issubdtype(x.dtype, jnp.floating) else x, prior64)
                # the cast copy is flattened into the next frame's blob
                # upload just-in-time (keeps the CPU compute asynchronous
                # until then); the f64 original seeds the next marg build
                # (keeps the prior recursion in f64)
                self._prior_cpu64 = prior64
                self.prior = prior_cast
            else:
                # solver-dtype marg on the solver device (async; relies on
                # the Jacobi-scaled factorizations). The result is pulled
                # host-side at the next blob pack.
                p_marg_dev = jax.tree_util.tree_map(
                    lambda x: jnp.asarray(np.asarray(x), self.jdt), p_marg)
                self.prior = self._build_prior_dev(
                    p_marg_dev, _to_j(img_m), _to_j(imu_m), _to_j(bias),
                    _to_j(old_prior),
                    jnp.asarray(drop), self._ext, self._gravity_j,
                    self._imu_info, self._sqrt_info_img,
                    knot_shift=jnp.asarray(knot_shift, jnp.int32),
                    bias_shift=jnp.asarray(1, jnp.int32),
                    opts=opts._replace(cauchy_c=1.0))
                self._prior_cpu64 = None
            self.timing["prior"] += _time.perf_counter() - t0

    # ------------------------------------------------------------------
    def _slide_window(self, record_keyframe: bool = True):
        wc = self.wc
        nb = wc.NB
        if self.marg_flag == MARGIN_OLD:
            if record_keyframe:
                # record the keyframe leaving the window (streaming mode
                # does this at summary consumption, when the pose is final)
                q, p = self.traj.pose(self.kf_t_ns[0])
                self.keyframes.append(
                    KeyframePose(int(self.kf_t_ns[0]), q[0], p[0]))

            from ctrlvio_tpu.ops import so3np

            cam_q, cam_p = self.traj.camera_pose(
                self.kf_t_ns[:2], self.q_CtoI, self.p_CinI)
            R = so3np.quat_to_matrix(cam_q)
            self.features.slide_old(R[0], cam_p[0], R[1], cam_p[1])

            # (the prior was already built pre-rolled into the new layout)
            self.kf_t_ns[:-1] = self.kf_t_ns[1:]
            self.bg[:-1] = self.bg[1:]
            self.ba[:-1] = self.ba[1:]
            self.win_knot0 = self.traj.ctrl_idx(self.kf_t_ns[0])

            # drop stale IMU (≙ RemoveIMUData ts[0]-5s)
            keep = self.imu_t_ns >= self.kf_t_ns[0] - 5 * S_TO_NS
            self.imu_t_ns = self.imu_t_ns[keep]
            self.imu_gyro = self.imu_gyro[keep]
            self.imu_accel = self.imu_accel[keep]
        else:
            self.features.remove_failures()
            self.features.slide_second_new(nb - 1)
            self.kf_t_ns[nb - 2] = self.kf_t_ns[nb - 1]
            self.bg[nb - 2] = self.bg[nb - 1]
            self.ba[nb - 2] = self.ba[nb - 1]


    # ------------------------------------------------------------------
    # streaming pipeline (device-resident state; see estimator/stream.py)
    # ------------------------------------------------------------------
    def _stream_dispatch(self):
        """Pack this frame's feed-forward inputs into one blob and chain the
        device megastep — no host synchronization. ≙ steps [6-9] of the
        per-frame pipeline, executed device-side."""
        import time as _time

        t0 = _time.perf_counter()
        wc, cfg = self.wc, self.cfg
        sm = self._stream_mod
        np_dtype = np.float64 if self.jdt == jnp.float64 else np.float32

        self.win_knot0 = self.traj.ctrl_idx(self.kf_t_ns[0])
        span = self.traj.n - self.win_knot0
        if span > wc.KW:
            raise RuntimeError(
                f"window spans {span} knots > KW={wc.KW}; raise WindowConfig.KW")
        kq, kp, n_active = self.traj.window(self.win_knot0, wc.KW, np.float64)

        if self.use_native:
            img, dinv0, _ = self.features.pack_image_factors(
                self.kf_t_ns, self.traj.dt, self.win_knot0, wc, cfg.dtype)
        else:
            img, dinv0, _ = packing.pack_image_factors(
                list(self.features.tracks.values()), self.kf_t_ns,
                self.traj.dt, self.win_knot0, wc, cfg.dtype)
        slot_fids = self.features.slot_fids(wc.LM)
        t_lo = self.win_knot0 * int(self.traj.dt_ns)
        imu = packing.pack_imu_factors(
            self.imu_t_ns, self.imu_gyro, self.imu_accel, self.kf_t_ns,
            t_lo, self.traj.max_time_ns, self.traj.dt, self.win_knot0, wc,
            cfg.dtype, on_overflow=cfg.imu_overflow)
        bias = packing.bias_sqrt_info(self.imu_t_ns, self.kf_t_ns,
                                      cfg.sigma_bg, cfg.sigma_ba, wc, cfg.dtype)
        fixed = np.ones(wc.KW, bool)
        fixed[:n_active] = False

        # knot seeds: only knots appended since the last dispatch. On the
        # first dispatch (warmup handoff) the HOST mirror is authoritative
        # and uploads values; afterwards the seeds are dead-reckoned
        # IN-GRAPH from the device spline end (_extend_inertial) — host
        # values would chain through the lagged mirror and feed back.
        hooked = getattr(self, "_dispatch_hook", None) is not None
        host_seeds = (not getattr(self, "_dev_dispatched", False)) if hooked \
            else self._dev_state is None  # warmup handoff
        seed_mask = np.zeros(wc.KW, bool)
        lo_rel = 0 if host_seeds else max(self._dev_knot_hi - self.win_knot0, 0)
        # the in-graph extension also RE-seeds the weakly-constrained tail
        # (last 3 knots had no image factors yet); widen the mask to match
        seed_lo = lo_rel if host_seeds else max(lo_rel - 3, 4, 0)
        seed_mask[seed_lo:n_active] = True
        self._dev_knot_hi = self.win_knot0 + n_active

        # landmark slot permutation: current slot -> previous dispatch's
        # slot (device dinv is authoritative for persisting landmarks;
        # fresh slots take the host seed)
        perm = np.full(wc.LM, -1, np.int32)
        if not host_seeds:
            prev = self._prev_slot_fids
            for i, fid in enumerate(slot_fids):
                perm[i] = prev.get(int(fid), -1)
        self._prev_slot_fids = {int(f): i for i, f in enumerate(slot_fids)}

        marg_old = self.marg_flag == MARGIN_OLD
        k1 = self.traj.ctrl_idx(self.kf_t_ns[1]) - self.win_knot0
        drop = np.zeros(wc.KW, bool)
        knot_shift = 0
        if marg_old:
            drop[:k1] = True
            knot_shift = k1
        g0i, g0f = packing.grid_of(self.kf_t_ns[0:1], self.traj.dt,
                                   self.win_knot0)
        g1i, g1f = packing.grid_of(self.kf_t_ns[1:2], self.traj.dt,
                                   self.win_knot0)
        blob = sm.pack_stream_blob(
            img, imu, bias, fixed, kq, kp, seed_mask, perm, dinv0, drop,
            marg_old, knot_shift, (g0i[0], g0f[0]), (g1i[0], g1f[0]),
            old_hi=lo_rel, new_hi=n_active, host_seeds=host_seeds,
            dtype=np_dtype)
        self.timing["pack"] += _time.perf_counter() - t0

        meta = dict(win_knot0=self.win_knot0, n_active=n_active,
                    kf0_t_ns=int(self.kf_t_ns[0]), marg_old=marg_old,
                    slot_fids=slot_fids)
        if hooked:
            # batched-serving coordinator: it owns the stacked device state
            # and runs ONE vmapped megastep for all sequences in lockstep
            self._dev_dispatched = True
            self._dispatch_hook(self, blob, host_seeds, meta)
            return

        t0 = _time.perf_counter()
        if self._dev_state is None:
            # warmup handoff: the sync warmup's f64-built (jdt-cast,
            # post-slide) prior seeds the device chain; with no warmup the
            # f64 init solve's prior does
            self._dev_state = self._initial_dev_state()
        self._dev_state, summary = self._megastep(
            self._dev_state, blob, self._ext, self._gravity_j,
            self._imu_info, self._sqrt_info_img, opts=self._ba_opts)
        self._enqueue_summary(meta, summary)
        self.timing["dispatch_jit"] += _time.perf_counter() - t0

    def _initial_dev_state(self):
        """Initial device-resident state for the first dispatch (also used
        by the batched-serving coordinator to build its stacked state)."""
        from ctrlvio_tpu.solver.layout import empty_params

        wc = self.wc
        p0 = empty_params(wc, self.jdt)._replace(
            bg=jnp.asarray(self.bg, self.jdt),
            ba=jnp.asarray(self.ba, self.jdt),
            ld=jnp.asarray(self.traj.line_delay, self.jdt))
        prior0 = self.prior if self.prior is not None else \
            getattr(self, "_init_prior", None)
        if prior0 is None:
            prior0 = empty_prior(wc, self.jdt)
        prior0 = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), self.jdt)
            if np.issubdtype(np.asarray(x).dtype, np.floating)
            else jnp.asarray(np.asarray(x)), prior0)
        return self._stream_mod.DevState(params=p0, prior=prior0)

    def _fetch_async(self, summary):
        """Kick the device->host summary pull onto the fetcher thread.
        Returns a future resolving to the host f64 array."""
        try:
            summary.copy_to_host_async()
        except Exception:
            pass
        return self._fetcher.submit(np.asarray, summary, np.float64)

    def _enqueue_summary(self, meta, summary):
        """Queue a dispatched frame's summary; only every k-th is actually
        pulled to the host (prefetched on the worker thread at dispatch
        time, so it has landed long before consumption)."""
        self._dispatch_no = getattr(self, "_dispatch_no", -1) + 1
        fetch = (self._dispatch_no % max(self.cfg.stream_consume_every, 1)
                 == 0)
        obj = self._fetch_async(summary) if fetch else summary
        self._stream_pending.append((meta, obj, fetch))

    def _stream_complete(self, summary, meta):
        """Batched-serving path: the coordinator hands back this
        sequence's summary slice of the vmapped megastep."""
        self._enqueue_summary(meta, summary)

    def _consume_summaries(self, max_pending: int):
        """Apply the newest consumable summary (the last FETCHED one among
        the over-lag entries) to the host mirror; earlier entries in the
        batch are dropped without a device->host transfer."""
        n_over = len(self._stream_pending) - max_pending
        if n_over <= 0:
            return
        last = -1
        for i in range(n_over):
            if self._stream_pending[i][2]:
                last = i
        if last < 0:
            return  # next fetched summary not yet past the lag horizon
        batch = [self._stream_pending.popleft() for _ in range(last + 1)]
        self._apply_summary_batch(batch)

    def flush(self):
        """End-of-stream drain (call before reading final poses /
        keyframes / line delay): best-effort solve of frames still queued
        behind the IMU-coverage check (safe here — nothing chains after),
        then drain all in-flight summaries into the host mirror."""
        q = getattr(self, "_pending_frames", None)
        last_imu = int(self.imu_t_ns[-1]) if len(self.imu_t_ns) else -1
        while q and q[0][0] <= last_imu:
            t_ns, ids, pts, rows = q.popleft()
            self._process_frame_ready(t_ns, ids, pts, rows)
        if not self.cfg.stream:
            return
        while self._stream_pending:
            batch = [self._stream_pending.popleft()]
            # extend to the next fetched entry (or the very end)
            while self._stream_pending and not batch[-1][2]:
                batch.append(self._stream_pending.popleft())
            self._apply_summary_batch(batch)

    def _apply_summary_batch(self, batch):
        """Write the batch's NEWEST summary into the host mirror; record
        keyframes for every marg_old frame in the batch from the mirror
        (their slide-out times are still inside the knot window)."""
        import time as _time

        meta, obj, fetched = batch[-1]
        t0 = _time.perf_counter()
        # prefetched at dispatch time — landed frames ago; the raw-array
        # fallback only happens at flush() for an off-cycle tail summary
        host = obj.result() if fetched else np.asarray(obj, np.float64)
        t1 = _time.perf_counter()
        self.timing["consume_fetch"] += t1 - t0
        s = self._stream_mod.unpack_summary(host, self.wc)
        self.traj.write_back(meta["win_knot0"], s["knots_q"], s["knots_p"],
                             meta["n_active"])
        self._mirror_solved_hi = meta["win_knot0"] + meta["n_active"]
        nb = self.wc.NB
        # freshest converged biases drive the host dead-reckon
        self.bg[:] = s["bg"][nb - 1]
        self.ba[:] = s["ba"][nb - 1]
        if not self.cfg.fix_ld:
            self.traj.line_delay = float(
                np.clip(s["ld"], self.cfg.ld_lower, self.cfg.ld_upper))
        fids = meta["slot_fids"]
        if len(fids):
            self.features.set_depths_by_id(
                fids, s["dinv"][: len(fids)].astype(np.float32))
        from types import SimpleNamespace

        self.last_solve_stats = SimpleNamespace(
            cost0=s["cost0"], cost=s["cost"], accepted=s["accepted"],
            rms=s.get("rms"))  # per-type [image, imu, bias, prior]
        ovf = np.asarray(s.get("marg_ovf", [0.0]))
        if float(ovf.sum()) > 0:
            # loud-failure policy (see packing.py): the marginalization
            # subset exceeded its compacted caps — the overflowed factors
            # were DROPPED from the prior (never mis-attributed).
            import warnings

            names = ["OBS", "IMU", "LM"]
            what = ", ".join(f"{n}+{int(v)}" for n, v in zip(names, ovf)
                             if v > 0)
            warnings.warn(
                f"marginalization subset overflowed its caps ({what}; "
                f"marg_caps={marginalize.marg_caps(self.wc)}); the excess "
                "factors were dropped from the prior — raise the matching "
                "CTRLVIO_MARG_{OBS,IMU,LM}", RuntimeWarning, stacklevel=2)
        if self.cfg.debug_residual_summary and s.get("rms") is not None:
            import sys as _sys

            r = s["rms"]
            print(f"[ResidualSummary/stream] image={r[0]:.3f} imu={r[1]:.3f}"
                  f" bias={r[2]:.3f} prior={r[3]:.3f}", file=_sys.stderr)
        for m, _, _ in batch:
            if m["marg_old"]:
                q, p = self.traj.pose(m["kf0_t_ns"])
                self.keyframes.append(
                    KeyframePose(m["kf0_t_ns"], q[0], p[0]))
        self.timing["consume_apply"] += _time.perf_counter() - t1


def _empty_image_factors(wc: WindowConfig, dtype) -> ImageFactors:
    OBS = wc.OBS
    z = np.zeros(OBS, dtype)
    return ImageFactors(
        i0_i=np.zeros(OBS, np.int32), f_i=z, row_i=z,
        pt_i=np.zeros((OBS, 3), dtype), i0_j=np.zeros(OBS, np.int32), f_j=z,
        row_j=z, pt_j=np.zeros((OBS, 3), dtype),
        lm_idx=np.zeros(OBS, np.int32), valid=np.zeros(OBS, bool),
        marg_drop=np.zeros(OBS, bool),
    )


def _to_j(x):
    return jax.tree_util.tree_map(jnp.asarray, x)


def _blob_pack(img: ImageFactors, imu: ImuFactors, bias: BiasFactors,
               kq, kp, bg, ba, dinv, ld, fixed,
               prior: Optional[PriorFactor], cfg: WindowConfig,
               dtype=np.float32) -> np.ndarray:
    """Concatenate every host-produced per-frame input — including the
    marginalization prior's 7 leaves — into ONE buffer (host->device uploads
    cost ~1-5 ms EACH over the remote tunnel; one blob is one upload).
    Integer/bool fields are float-encoded (values << 2^24)."""
    parts = []
    for t in (img, imu, bias):
        for f in t:
            parts.append(np.asarray(f, dtype).ravel())
    for a in (kq, kp, bg, ba, dinv):
        parts.append(np.asarray(a, dtype).ravel())
    parts.append(np.asarray([ld], dtype))
    parts.append(np.asarray(fixed, dtype))
    if prior is None:
        parts.append(np.zeros(_prior_size(cfg), dtype))
    else:
        # np.asarray on jax-CPU leaves blocks here (and only here) on the
        # async f64 marg build dispatched last frame
        for f in prior:
            parts.append(np.asarray(f, dtype).ravel())
    return np.concatenate(parts)


def _prior_size(cfg: WindowConfig) -> int:
    C, KW, NB = cfg.C, cfg.KW, cfg.NB
    return C * C + C + 4 * KW + 3 * KW + 3 * NB + 3 * NB + 1


def _blob_unpack(blob, cfg: WindowConfig, dtype):
    """In-graph inverse of _blob_pack."""
    OBS, M, NB, KW, LM, C = cfg.OBS, cfg.MIMU, cfg.NB, cfg.KW, cfg.LM, cfg.C
    o = [0]

    def take(shape, dt=None):
        n = int(np.prod(shape))
        x = jax.lax.dynamic_slice_in_dim(blob, o[0], n).reshape(shape)
        o[0] += n
        if dt is not None:
            x = x.astype(dt)
        return x

    img = ImageFactors(
        i0_i=take((OBS,), jnp.int32), f_i=take((OBS,)), row_i=take((OBS,)),
        pt_i=take((OBS, 3)), i0_j=take((OBS,), jnp.int32), f_j=take((OBS,)),
        row_j=take((OBS,)), pt_j=take((OBS, 3)),
        lm_idx=take((OBS,), jnp.int32), valid=take((OBS,), jnp.bool_),
        marg_drop=take((OBS,), jnp.bool_))
    imu = ImuFactors(
        i0=take((M,), jnp.int32), u=take((M,)), gyro=take((M, 3)),
        accel=take((M, 3)), bias_idx=take((M,), jnp.int32),
        valid=take((M,), jnp.bool_), marg_drop=take((M,), jnp.bool_))
    bias = BiasFactors(sqrt_info=take((NB - 1, 6)),
                       valid=take((NB - 1,), jnp.bool_))
    kq = take((KW, 4), dtype)
    kp = take((KW, 3), dtype)
    bg = take((NB, 3), dtype)
    ba = take((NB, 3), dtype)
    dinv = take((LM,), dtype)
    ld = take((1,), dtype)[0]
    fixed = take((KW,), jnp.bool_)
    prior = PriorFactor(
        J=take((C, C), dtype), r0=take((C,), dtype),
        knots_q0=take((KW, 4), dtype), knots_p0=take((KW, 3), dtype),
        bg0=take((NB, 3), dtype), ba0=take((NB, 3), dtype),
        ld0=take((1,), dtype)[0])
    params = WindowParams(knots_q=kq, knots_p=kp, bg=bg, ba=ba, dinv=dinv, ld=ld)
    return img, imu, bias, params, fixed, prior


def _compact_factors(factors, sel, cap: int):
    """Select rows where sel (bool mask over slot axis) and pad to cap.
    Host-side numpy; keeps the NamedTuple structure."""
    idx = np.nonzero(np.asarray(sel))[0]
    if len(idx) > cap:
        import logging

        logging.getLogger(__name__).warning(
            "marginalization factor capacity %d exceeded (%d); truncating",
            cap, len(idx))
        idx = idx[:cap]

    def take(x):
        x = np.asarray(x)
        out = np.zeros((cap,) + x.shape[1:], dtype=x.dtype)
        out[: len(idx)] = x[idx]
        return out

    return type(factors)(*(take(f) for f in factors))


def _compact_landmarks(img_m: ImageFactors, dinv: np.ndarray, lm_cap: int):
    """Remap the landmark slots referenced by a compacted marg factor set to
    dense indices [0, n); landmarks beyond lm_cap are dropped entirely (all
    their factors invalidated) so the prior never carries partial landmark
    information."""
    lm_idx = np.asarray(img_m.lm_idx)
    valid = np.asarray(img_m.valid).copy()
    used = np.unique(lm_idx[valid])
    if len(used) > lm_cap:
        import logging

        logging.getLogger(__name__).warning(
            "marginalized landmark capacity %d exceeded (%d); dropping extras",
            lm_cap, len(used))
        dropped = set(used[lm_cap:].tolist())
        valid &= ~np.isin(lm_idx, list(dropped))
        used = used[:lm_cap]
    remap = np.zeros(int(lm_idx.max()) + 1 if len(lm_idx) else 1, np.int32)
    remap[used] = np.arange(len(used), dtype=np.int32)
    new_idx = np.where(valid, remap[lm_idx], 0).astype(np.int32)
    dinv_m = np.full(lm_cap, 0.2)
    dinv_m[: len(used)] = dinv[used]
    return img_m._replace(lm_idx=new_idx, valid=valid), dinv_m
