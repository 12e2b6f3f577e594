#!/usr/bin/env python
"""Benchmark: end-to-end synthetic rolling-shutter VIO replay.

Prints ONE JSON line:
  {"metric": "frames_per_sec_per_chip", "value": N, "unit": "fps",
   "vs_baseline": N/10.0}

Baseline: the reference (single-thread CPU Ceres, `trajectory_estimator.cpp
:379-383`) processes keyframes at the 10 Hz camera rate, i.e. ~realtime.
vs_baseline is therefore the realtime multiple; the north-star target is
>= 3 (BASELINE.md).

Accuracy gates (ATE, line-delay convergence) are checked and reported on
stderr; the bench aborts with nonzero exit if accuracy is off, so the fps
number can't silently come from a diverged run.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

# The remote axon TPU tunnel occasionally wedges: backend init raises
# UNAVAILABLE or trivial ops hang for minutes (this killed round 2's bench,
# BENCH_r02.json rc=1). The bench therefore runs as a SUPERVISOR by default:
# it probes the backend with a 1-op subprocess under a hard timeout, backs
# off and retries for up to ~10 minutes, then runs the real bench in a child
# process (retried on crash/hang). If the tunnel never comes up it emits a
# structured JSON failure record instead of a raw traceback.
PROBE_BUDGET_S = float(os.environ.get("CTRLVIO_PROBE_BUDGET", 600.0))
PROBE_TIMEOUT_S = float(os.environ.get("CTRLVIO_PROBE_TIMEOUT", 150.0))
CHILD_TIMEOUT_S = float(os.environ.get("CTRLVIO_CHILD_TIMEOUT", 2400.0))
CHILD_ATTEMPTS = int(os.environ.get("CTRLVIO_CHILD_ATTEMPTS", 3))

_PROBE_SRC = """
import jax, jax.numpy as jnp
x = (jnp.ones((128, 128)) @ jnp.ones((128, 128))).sum()
assert float(x) == 128.0 * 128 * 128
print("PROBE_OK", jax.default_backend())
"""


def probe_backend(budget_s=PROBE_BUDGET_S):
    """Check the TPU backend answers a trivial op, retrying with backoff.

    Returns True once a probe subprocess succeeds, False if the backend
    stayed unavailable for the whole budget."""
    here = os.path.dirname(os.path.abspath(__file__))
    t0 = time.monotonic()
    delays = [0, 15, 30, 60, 120, 240, 240, 240]
    for i, delay in enumerate(delays):
        if delay:
            print(f"[bench] backend unavailable; retrying in {delay}s "
                  f"(elapsed {time.monotonic() - t0:.0f}s)",
                  file=sys.stderr, flush=True)
            time.sleep(delay)
        if time.monotonic() - t0 > budget_s:
            break
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC], cwd=here,
                timeout=PROBE_TIMEOUT_S, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"[bench] probe {i} HUNG (> {PROBE_TIMEOUT_S:.0f}s) — "
                  "tunnel wedged", file=sys.stderr, flush=True)
            continue
        if r.returncode == 0 and "PROBE_OK" in r.stdout:
            print(f"[bench] probe {i} ok: {r.stdout.strip()}",
                  file=sys.stderr, flush=True)
            return True
        tail = (r.stderr or r.stdout).strip().splitlines()[-1:]
        print(f"[bench] probe {i} failed rc={r.returncode}: {tail}",
              file=sys.stderr, flush=True)
    return False


def supervise(args, metric):
    """Probe the backend, then run this script as a child with the same
    argv (plus CTRLVIO_BENCH_CHILD=1) under a timeout, retrying on
    crash/hang. Prints the child's final JSON line, or a structured
    failure record — never dies with a bare backend traceback."""
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ, CTRLVIO_BENCH_CHILD="1")
    last_err = "unknown"
    for attempt in range(CHILD_ATTEMPTS):
        if not probe_backend():
            last_err = "axon TPU backend unavailable (probe budget exhausted)"
            continue
        try:
            # child stderr passes through live; stdout (the JSON line) is
            # captured so the supervisor controls what the driver parses
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                cwd=here, env=env, timeout=CHILD_TIMEOUT_S,
                stdout=subprocess.PIPE, text=True)
        except subprocess.TimeoutExpired:
            last_err = f"bench child hung > {CHILD_TIMEOUT_S:.0f}s"
            print(f"[bench] attempt {attempt}: {last_err}", file=sys.stderr,
                  flush=True)
            continue
        line = next((ln for ln in reversed((r.stdout or "").splitlines())
                     if ln.startswith("{")), None)
        if r.returncode == 0 and line:
            print(line, flush=True)
            return
        last_err = f"bench child rc={r.returncode}"
        print(f"[bench] attempt {attempt} failed: {last_err}",
              file=sys.stderr, flush=True)
    # structured failure record: value 0 marks 'no measurement', the error
    # field says why — the round's evidence survives a wedged tunnel
    print(json.dumps({
        "metric": metric, "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
        "error": last_err,
    }), flush=True)
    sys.exit(0)


METRIC_BY_MODE = {
    "e2e": "frames_per_sec_per_chip",
    "image": "image_frames_per_sec_per_chip",
    "batch": "batched_window_solves_per_sec",
    "serve": "served_frames_per_sec_per_chip",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=["tpu", "cpu-smoke"], default="tpu")
    ap.add_argument("--mode", choices=["e2e", "image", "batch", "serve"],
                    default="e2e",
                    help="e2e: sequential replay fps; image: replay from "
                         "rendered 1280x1024 rolling-shutter imagery "
                         "(CLAHE+KLT front-end included in the fps); "
                         "batch: batched multi-window solve throughput; "
                         "serve: B full estimators streaming in lockstep "
                         "through one vmapped megastep")
    ap.add_argument("--batch-size", type=int, default=8,
                    help="sequences per chip for --mode serve")
    ap.add_argument("--scene", choices=["textured", "blobs"],
                    default="textured",
                    help="--mode image world: 'textured' ray-casts a "
                         "texture-mapped room (tracker finds its own "
                         "corners; occluders + photometric drift), 'blobs' "
                         "draws Gaussian dots at landmark projections")
    ap.add_argument("--duration", type=float, default=None)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--gt", choices=["spline", "fine", "lissajous"],
                    default="spline",
                    help="GT trajectory family (anti-inverse-crime "
                         "controls): 'spline' = same order-4/0.05s family "
                         "the estimator fits; 'fine' = 0.01s-knot spline "
                         "(out of the estimator's basis); 'lissajous' = "
                         "analytic C-inf curve (not a B-spline at all)")
    ap.add_argument("--speed", type=float, default=1.0,
                    help="motion-intensity multiplier on the GT dynamics")
    ap.add_argument("--bootstrap", choices=["visual", "gt"], default="visual",
                    help="visual: full self-bootstrap (SfM + VI alignment, "
                         "like the reference); gt: ground-truth init")
    ap.add_argument("--noiseless", action="store_true",
                    help="disable sensor noise (exactness debugging). The "
                         "default injects IMU+pixel noise at the reference's "
                         "configured operating point (sigma_g=4e-3, "
                         "sigma_a=8e-2, ~1px; ct_odometry_tumrs.yaml:16-20)")
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace of the replay "
                         "(open with TensorBoard/xprof)")
    args = ap.parse_args()

    # cpu-smoke never touches the tunnel; TPU runs go through the supervisor
    if args.preset == "tpu" and not os.environ.get("CTRLVIO_BENCH_CHILD"):
        supervise(args, METRIC_BY_MODE[args.mode])
        return

    if args.mode == "batch":
        bench_batch(args)
        return
    if args.mode == "serve":
        bench_serve(args)
        return
    if args.mode == "image":
        bench_image(args)
        return

    if args.preset == "cpu-smoke":
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        duration = args.duration or 6.0
        dtype = np.float64
    else:
        import jax

        # x64 enabled so the once-per-frame marginalization runs f64 on the
        # host CPU; the hot solve stays explicitly f32 on the TPU.
        # async CPU dispatch must be set before backend init so the prior
        # build overlaps with TPU solves.
        jax.config.update("jax_enable_x64", True)
        try:
            jax.config.update("jax_cpu_enable_async_dispatch", True)
        except Exception:
            pass
        duration = args.duration or 16.0
        dtype = np.float32

    import jax.numpy as jnp

    from ctrlvio_tpu.estimator.initializer import bootstrap_from_sim
    from ctrlvio_tpu.estimator.odometry import CtrlVIO, VIOConfig
    from ctrlvio_tpu.ops import so3
    from ctrlvio_tpu.sim import synthetic
    from ctrlvio_tpu.solver.layout import WindowConfig
    from ctrlvio_tpu.utils.ate import ate_rmse

    print(f"[bench] backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    sim_kw = dict(duration=duration, n_landmarks=300, seed=args.seed,
                  speed=args.speed)
    if args.gt == "fine":
        sim_kw["gt_knot_dt"] = 0.01
    elif args.gt == "lissajous":
        sim_kw["gt_family"] = "lissajous"
    sim_cfg = (synthetic.SimConfig(**sim_kw) if args.noiseless
               else synthetic.reference_noise(**sim_kw))
    sim = synthetic.generate(sim_cfg)
    cfg = VIOConfig(
        window_config=WindowConfig(KW=32, NB=11, LM=256, OBS=768, MIMU=256),
        fix_ld=False, ld_init=0.0, dtype=dtype,
        # full self-bootstrap by default: visual SfM + VI alignment (C19),
        # like the reference's operating mode — no ground-truth leak
        bootstrap=("visual" if args.bootstrap == "visual" else "external"),
        # device-resident streaming pipeline: zero host sync on the critical
        # path (every sync costs the ~40 ms tunnel RTT); summaries are pulled
        # asynchronously a few frames later for the host mirror
        stream=(args.preset == "tpu"))
    q_CtoI = np.asarray(so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))))
    vio = CtrlVIO(cfg, q_CtoI, np.array(sim.cfg.ext_pos))

    if args.bootstrap == "visual":
        # interleaved feed happens in the frame loop below
        imu_idx = 0
    else:
        init = bootstrap_from_sim(sim)
        for k in range(len(sim.imu_t_ns)):
            vio.process_imu(sim.imu_t_ns[k], sim.gyro[k], sim.accel[k])
        vio.set_initial_state(init.t_ns, init.q, init.p, init.bg, init.ba,
                              init.gravity, v0=init.v)
        imu_idx = len(sim.imu_t_ns)

    import contextlib

    prof_ctx = contextlib.nullcontext()
    if args.profile:
        from ctrlvio_tpu.utils.summary import profile_trace

        prof_ctx = profile_trace()

    est, gt, t_est_ns = [], [], []
    frame_times = []
    rms_trend = []  # (frame, [image, imu, bias, prior] RMS) samples
    # the timed region starts after the bootstrap, jit compiles, AND the
    # stream's sync warmup (a one-time precision bootstrap, not throughput)
    timed_from = None
    # feed IMU ahead of each frame by the pairing lookahead (≙ the
    # reference's bag loop, where frames queue until IMU coverage reaches
    # traj_max + 0.2 s — odometry_manager.cpp:375-383): the frame then
    # solves inside process_frame instead of deferring to process_imu
    ahead_ns = int(0.25e9)
    with prof_ctx as logdir:
        for i, fr in enumerate(sim.frames):
            while imu_idx < len(sim.imu_t_ns) and \
                    sim.imu_t_ns[imu_idx] <= fr.t_ns + ahead_ns:
                vio.process_imu(sim.imu_t_ns[imu_idx], sim.gyro[imu_idx],
                                sim.accel[imu_idx])
                imu_idx += 1
            t0 = time.perf_counter()
            out = vio.process_frame(fr.t_ns, fr.ids, fr.pts, fr.rows)
            dt_frame = time.perf_counter() - t0
            if out is not None:
                if timed_from is None:
                    timed_from = i + (cfg.stream_warmup + 8
                                      if cfg.stream else 4)
                q, p = out
                est.append(p)
                t_est_ns.append(fr.t_ns)
                _, p_gt = sim.pose_at(fr.t_ns * 1e-9)
                gt.append(p_gt)
            if timed_from is not None and i == timed_from:
                vio.timing.clear()  # drop compile-time spikes from stats
            if timed_from is not None and i >= timed_from:
                frame_times.append(dt_frame)
            st = vio.last_solve_stats
            if (st is not None and getattr(st, "rms", None) is not None
                    and (not rms_trend or
                         not np.array_equal(rms_trend[-1][1], st.rms))):
                rms_trend.append((i, np.asarray(st.rms)))
            if i % 25 == 0:
                print(f"[bench] frame {i}/{len(sim.frames)} "
                      f"({dt_frame * 1e3:.0f} ms)", file=sys.stderr, flush=True)
    if args.profile:
        print(f"[bench] profiler trace -> {logdir}", file=sys.stderr)

    vio.flush()  # drain in-flight summaries (stream mode)
    est, gt = np.asarray(est), np.asarray(gt)
    # ONLINE (forecast) ATE: poses as reported at frame time — the stream
    # predicts ahead of the lagged solve, so this includes forecast lag.
    # Skip the online-calibration transient; standard 4-DoF-aligned ATE.
    err = ate_rmse(est[10:], gt[10:], align="yaw")
    # POST-HOC ATE: re-sample the final host-mirror spline at the same
    # frame times (every knot now carries its last solved value) — the
    # apples-to-apples analogue of the reference publishing post-solve
    # poses (`odometry_manager.cpp:283-289`)
    base = vio.data_start_ns or 0
    post = np.stack([vio.traj.pose(t - base)[1][0] for t in t_est_ns])
    err_post = ate_rmse(post[10:], gt[10:], align="yaw")
    ld_err = abs(vio.traj.line_delay - sim.cfg.line_delay)
    print(f"[bench] frames={len(est)} ATE online={err * 100:.2f} cm "
          f"post-hoc={err_post * 100:.2f} cm "
          f"ld={vio.traj.line_delay * 1e6:.2f} us (true {sim.cfg.line_delay * 1e6:.2f}, "
          f"err {ld_err * 1e6:.2f} us)", file=sys.stderr)

    ate_gate = 0.10 if args.preset == "tpu" else 0.06
    if err > ate_gate or err_post > ate_gate or ld_err > 2e-6:
        print(f"[bench] FAIL accuracy gates (ATE<{ate_gate}m, ld_err<2us)",
              file=sys.stderr)
        sys.exit(1)

    n_timed = max(len(frame_times), 1)
    # SUSTAINED throughput = frames / wall over the timed region. The
    # per-frame median understates stalls (the async stream's device queue
    # backs up and the every-3rd-frame summary fetch absorbs the backlog in
    # one long frame — a bimodal distribution whose median reads ~2x the
    # sustainable rate); the sum is what a deployment actually gets.
    sustained = n_timed / max(float(np.sum(frame_times)), 1e-9)
    phases = {k: round(v / n_timed * 1e3, 1) for k, v in vio.timing.items()}
    print(f"[bench] per-frame phase ms: {phases}", file=sys.stderr)
    if rms_trend:
        # per-factor-type RMS trendline (≙ the reference printing its
        # ResidualSummary after every solve) — the streaming path's
        # regression signal over the whole run
        print("[bench] per-type residual RMS trend (frame: image/imu/bias/"
              "prior):", file=sys.stderr)
        pick = np.unique(np.linspace(0, len(rms_trend) - 1,
                                     min(8, len(rms_trend))).astype(int))
        for k in pick:
            fidx, r = rms_trend[k]
            print(f"[bench]   {fidx:5d}: {r[0]:8.3f} {r[1]:8.3f} "
                  f"{r[2]:8.3f} {r[3]:8.3f}", file=sys.stderr)
    if args.preset == "cpu-smoke":
        # per-factor-type residual report (≙ the reference's per-solve
        # ResidualSummary, its de-facto regression signal)
        print(vio.residual_summary().report(), file=sys.stderr)

    per_frame = float(np.median(frame_times))
    print(f"[bench] median frame time {per_frame * 1e3:.1f} ms "
          f"({1.0 / per_frame:.1f} fps median); SUSTAINED "
          f"{sustained:.1f} fps over {n_timed} frames (headline; "
          f"keyframe rate 10 Hz)", file=sys.stderr)

    print(json.dumps({
        "metric": "frames_per_sec_per_chip",
        "value": round(sustained, 2),
        "unit": "fps",
        "vs_baseline": round(sustained / 10.0, 2),
        "ate_online_cm": round(err * 100, 3),
        "ate_posthoc_cm": round(err_post * 100, 3),
        "ld_err_us": round(ld_err * 1e6, 3),
        "gt": args.gt, "seed": args.seed, "speed": args.speed,
    }))


def bench_image(args):
    """Image-in replay at the reference's exact operating point: 1280x1024
    Kannala-Brandt fisheye (`config/tumrs/cam_tumrs.yaml`), 150 features,
    min_dist 25, CLAHE on, FB check on — the per-frame cost INCLUDES the
    full front end (CLAHE -> gyro-predicted pyramidal KLT -> Shi-Tomasi
    refill -> undistortion) plus the sliding-window estimator with online
    line-delay calibration (≙ feature_tracker.cpp:44-127 + PerformCtrlVIO).
    """
    import time

    import jax

    on_tpu = args.preset == "tpu"
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_cpu_enable_async_dispatch", True)
    except Exception:
        pass

    import jax.numpy as jnp

    from ctrlvio_tpu.estimator.initializer import bootstrap_from_sim
    from ctrlvio_tpu.estimator.odometry import CtrlVIO, VIOConfig
    from ctrlvio_tpu.frontend.fused import FusedTracker, rotation_flow
    from ctrlvio_tpu.frontend.klt import KLTConfig
    from ctrlvio_tpu.frontend.tracker import TrackerConfig
    from ctrlvio_tpu.models.cameras import Equidistant
    from ctrlvio_tpu.ops import so3, so3np
    from ctrlvio_tpu.sim import render, synthetic
    from ctrlvio_tpu.solver.layout import WindowConfig
    from ctrlvio_tpu.utils.ate import ate_rmse

    H, W = 1024, 1280
    cam = Equidistant(  # cam_tumrs.yaml projection_parameters
        mu=739.1654756101043, mv=739.1438452683457,
        u0=625.826167006398, v0=517.3370973594253,
        k2=0.019327620961435945, k3=0.006784242994724914,
        k4=-0.008658628531456217, k5=0.0051893686731546585)
    duration = args.duration or (12.0 if on_tpu else 4.0)
    dtype = np.float32 if on_tpu else np.float64

    print(f"[bench-image] rendering {duration:.0f}s of {W}x{H} "
          f"Kannala-Brandt rolling-shutter imagery ({args.scene})...",
          file=sys.stderr, flush=True)
    # IMU noise at the reference operating point; pixel noise comes from
    # the real CLAHE->KLT tracking of the rendered imagery, not the sim
    img_noise = {} if args.noiseless else {
        k: v for k, v in synthetic.REFERENCE_NOISE.items()
        if k != "pixel_noise"}
    sim = synthetic.generate(synthetic.SimConfig(
        duration=duration, n_landmarks=(300 if args.scene == "textured"
                                        else 1500), seed=args.seed,
        image_h=H, image_w=W, **img_noise))
    if args.scene == "textured":
        # texture-mapped world: ray-cast box room + occluder quads,
        # photometric drift, vignette, pixel noise — the tracker finds and
        # keeps its own corners on real texture (nothing is drawn at
        # landmark projections)
        imgs = render.render_textured_sequence(
            sim, H, W, cam, seed=1, n_occluders=4,
            occluder_speed=(0.0 if args.noiseless else 0.4),
            photometric=not args.noiseless,
            pixel_noise=(0.0 if args.noiseless else 2.0))
    else:
        imgs = render.render_sequence(sim, H, W, camera=cam, seed=1,
                                      big_every=6, texture=6.0)

    tcfg = TrackerConfig(  # cam_tumrs.yaml tracker block
        max_cnt=150, min_dist=25, use_clahe=True, fb_check=True,
        reject_wf=(args.scene == "textured"), f_threshold=1.0,
        use_pallas=on_tpu, klt=KLTConfig(pred_levels=3))
    tracker = FusedTracker(tcfg, cam, (H, W), lag=1 if on_tpu else 0)

    cfg = VIOConfig(
        window_config=WindowConfig(KW=32, NB=11, LM=256, OBS=768, MIMU=256),
        fix_ld=False, ld_init=0.0, ld_upper=3.5e-5, dtype=dtype,
        stream=on_tpu)
    q_CtoI = np.asarray(so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))))
    R_CtoI = so3np.quat_to_matrix(q_CtoI[None])[0]
    vio = CtrlVIO(cfg, q_CtoI, np.array(sim.cfg.ext_pos))

    init = bootstrap_from_sim(sim)
    for k in range(len(sim.imu_t_ns)):
        vio.process_imu(sim.imu_t_ns[k], sim.gyro[k], sim.accel[k])
    vio.set_initial_state(init.t_ns, init.q, init.p, init.bg, init.ba,
                          init.gravity, v0=init.v)

    # device-resident image replay: the bag lives in HBM (a real TPU host
    # feeds images over PCIe at GB/s; this dev harness tunnels at ~45 MB/s,
    # which would mismeasure the chip). --duration still bounds memory.
    imgs_dev = [jnp.asarray(im) for im in imgs] if on_tpu else imgs
    if on_tpu:
        jax.block_until_ready(imgs_dev[-1])

    est, gt = [], []
    t_feat = t_est = 0.0
    frame_times = []
    timed_from = (cfg.stream_warmup + 10) if cfg.stream else 4
    prev_t = None
    for i, fr in enumerate(sim.frames):
        t0 = time.perf_counter()
        M = (rotation_flow(sim.imu_t_ns, sim.gyro, prev_t, fr.t_ns, R_CtoI)
             if prev_t is not None else None)
        feat = tracker.step(fr.t_ns, imgs_dev[i], R_rel=M)
        prev_t = fr.t_ns
        t1 = time.perf_counter()
        out = None
        if feat is not None and len(feat["ids"]) >= 8:
            out = vio.process_frame(feat["t_ns"], feat["ids"], feat["pts"],
                                    feat["rows"])
        t2 = time.perf_counter()
        if out is not None:
            q, p = out
            est.append(p)
            gt.append(sim.pose_at(feat["t_ns"] * 1e-9)[1])
        if i == timed_from:
            vio.timing.clear()
        if i >= timed_from:
            frame_times.append(t2 - t0)
            t_feat += t1 - t0
            t_est += t2 - t1
        if i % 25 == 0:
            print(f"[bench-image] frame {i}/{len(sim.frames)} "
                  f"({(t2 - t0) * 1e3:.0f} ms, "
                  f"{len(feat['ids']) if feat else 0} feats)",
                  file=sys.stderr, flush=True)
    feat = tracker.flush()
    if feat is not None and len(feat["ids"]) >= 8:
        out = vio.process_frame(feat["t_ns"], feat["ids"], feat["pts"],
                                feat["rows"])
        if out is not None:
            est.append(out[1])
            gt.append(sim.pose_at(feat["t_ns"] * 1e-9)[1])
    vio.flush()

    est, gt = np.asarray(est), np.asarray(gt)
    err = ate_rmse(est[10:], gt[10:], align="yaw")
    ld_err = abs(vio.traj.line_delay - sim.cfg.line_delay)
    print(f"[bench-image] frames={len(est)} ATE={err * 100:.2f} cm "
          f"ld={vio.traj.line_delay * 1e6:.2f} us "
          f"(true {sim.cfg.line_delay * 1e6:.2f}, err {ld_err * 1e6:.2f} us); "
          f"F-gate rejected {tracker.n_rejected} outlier tracks",
          file=sys.stderr)
    if err > 0.15 or ld_err > 5e-6:
        print("[bench-image] FAIL accuracy gates (ATE<0.15m, ld_err<5us)",
              file=sys.stderr)
        sys.exit(1)

    n = max(len(frame_times), 1)
    phases = {k: round(v / n * 1e3, 1) for k, v in vio.timing.items()}
    print(f"[bench-image] per-frame: front-end {t_feat / n * 1e3:.1f} ms, "
          f"estimator {t_est / n * 1e3:.1f} ms; estimator phases {phases}",
          file=sys.stderr)
    per_frame = float(np.median(frame_times))
    fps = len(frame_times) / max(float(np.sum(frame_times)), 1e-9)
    print(f"[bench-image] median frame time {per_frame * 1e3:.1f} ms "
          f"({1.0 / per_frame:.1f} fps median); SUSTAINED {fps:.1f} fps "
          f"incl. front end (headline; keyframe rate 10 Hz)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "image_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 10.0, 2),
    }))


def bench_serve(args):
    """Batched multi-sequence streaming replay: B full estimators on one
    chip through a single vmapped megastep (the serving deployment shape)."""
    import time

    import jax
    import jax.numpy as jnp

    from ctrlvio_tpu.estimator.initializer import bootstrap_from_sim
    from ctrlvio_tpu.estimator.odometry import CtrlVIO, VIOConfig
    from ctrlvio_tpu.ops import so3
    from ctrlvio_tpu.parallel.stream_batch import BatchedStream
    from ctrlvio_tpu.sim import synthetic
    from ctrlvio_tpu.solver.layout import WindowConfig
    from ctrlvio_tpu.utils.ate import ate_rmse

    if args.preset == "cpu-smoke":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_cpu_enable_async_dispatch", True)
    except Exception:
        pass
    B = args.batch_size
    duration = args.duration or 12.0
    # GT bootstrap + calibrated ld: the f32 QR prior is safe almost
    # immediately (no calibration transient), so the per-lane f64 sync
    # warmup — the whole setup cost at B=16 — stays minimal
    warmup = 4

    sims = [synthetic.generate(synthetic.SimConfig(
        duration=duration, n_landmarks=300, seed=args.seed + i))
        for i in range(B)]
    n_frames = min(len(s.frames) for s in sims)
    vios = []
    for sim in sims:
        # serving shape: streams start from a calibrated sensor (ld at its
        # known value, still optimized) — the from-zero online calibration
        # transient is the e2e bench's job; replaying it per lane through
        # the short serve warmup hands the f32 prior the transient
        cfg = VIOConfig(
            window_config=WindowConfig(KW=32, NB=11, LM=256, OBS=768,
                                       MIMU=256),
            fix_ld=False, ld_init=sim.cfg.line_delay, dtype=np.float32,
            stream=True, stream_warmup=warmup)
        q_CtoI = np.asarray(so3.quat_exp(jnp.asarray(np.array(
            sim.cfg.ext_rot))))
        vio = CtrlVIO(cfg, q_CtoI, np.array(sim.cfg.ext_pos))
        init = bootstrap_from_sim(sim)
        for k in range(len(sim.imu_t_ns)):
            vio.process_imu(sim.imu_t_ns[k], sim.gyro[k], sim.accel[k])
        vio.set_initial_state(init.t_ns, init.q, init.p, init.bg, init.ba,
                              init.gravity, v0=init.v)
        vios.append(vio)
    coord = BatchedStream(vios)

    timed_from = 11 + warmup + 8
    times = []
    for k in range(n_frames):
        t0 = time.perf_counter()
        coord.step([(s.frames[k].t_ns, s.frames[k].ids, s.frames[k].pts,
                     s.frames[k].rows) for s in sims])
        if k == timed_from:
            for v in vios:
                v.timing.clear()
            if hasattr(coord, "timing"):
                coord.timing.clear()
            coord._n_steps = 0
        if k >= timed_from:
            times.append(time.perf_counter() - t0)
        if k % 25 == 0:
            print(f"[bench-serve] frame {k}/{n_frames}", file=sys.stderr,
                  flush=True)
    coord.flush()

    # accuracy gates per lane
    fail = False
    for lane, (vio, sim) in enumerate(zip(vios, sims)):
        t_eval = [f.t_ns for f in sim.frames[timed_from + 6 : n_frames]]
        # trajectory times are relative to data_start_ns (the first window
        # frame); evaluating at absolute times reads the spline ~0.3 s late
        # (~15 cm at this excitation) — the bug this gate itself caught
        base = vio.data_start_ns or 0
        est = np.stack([vio.traj.pose(t - base)[1][0] for t in t_eval])
        gt = np.stack([sim.pose_at(t * 1e-9)[1] for t in t_eval])
        err = ate_rmse(est, gt, align="yaw")
        ld_err = abs(vio.traj.line_delay - sim.cfg.line_delay)
        bad = err > 0.10 or ld_err > 5e-6
        fail = fail or bad
        print(f"[bench-serve] lane {lane} (seed {sim.cfg.seed}): "
              f"ATE {err * 100:.2f} cm, ld_err {ld_err * 1e6:.2f} us"
              f"{'  <-- FAIL' if bad else ''}", file=sys.stderr)
    if fail:
        print("[bench-serve] FAIL lane accuracy gates", file=sys.stderr)
        sys.exit(1)
    # SUSTAINED aggregate = lanes * steps / wall (the median lockstep frame
    # understates device-queue stalls absorbed by the periodic summary
    # fetch — a bimodal distribution; deployments get the sum)
    per_step = float(np.median(times))
    agg = B * len(times) / max(float(np.sum(times)), 1e-9)
    print(f"[bench-serve] B={B}: {per_step * 1e3:.1f} ms/lockstep frame "
          f"median, {float(np.mean(times)) * 1e3:.1f} ms mean -> SUSTAINED "
          f"{agg:.1f} aggregate frames/s ({agg / 10.0:.1f}x realtime "
          f"sequences per chip)", file=sys.stderr)

    # host/device split: step() wall = max(host feed, device chain) when
    # pipelined; print both so a regression names its culprit
    n_steps = max(getattr(coord, "_n_steps", 1), 1)
    split = {k: round(v / n_steps * 1e3, 1) for k, v in coord.timing.items()}
    print(f"[bench-serve] per-step host ms: {split}", file=sys.stderr)
    lane_phases = {}
    for v in vios:
        for k, s in v.timing.items():
            lane_phases[k] = lane_phases.get(k, 0.0) + s
    lane_phases = {k: round(v / n_steps * 1e3, 1)
                   for k, v in sorted(lane_phases.items())}
    print(f"[bench-serve] per-step lane-summed host phases ms: {lane_phases}",
          file=sys.stderr)
    dev_ms = coord.device_steady_ms()
    if dev_ms is not None:
        print(f"[bench-serve] pure-device vmapped megastep: {dev_ms:.1f} "
              f"ms/step ({B / dev_ms * 1e3:.1f} device-bound frames/s)",
              file=sys.stderr)

    # MFU / HBM accounting: XLA's own cost model for one vmapped megastep
    # (all B lanes) times the measured step rate, against v5e peaks
    # (197 TFLOP/s bf16-MXU, 819 GB/s HBM). The solve is f32, so MFU is
    # conservatively stated against the bf16 peak.
    try:
        cost = coord.cost_analysis()
    except Exception as e:  # pragma: no cover
        cost = None
        print(f"[bench-serve] cost_analysis unavailable: {e}",
              file=sys.stderr)
    if cost:
        flops = float(cost.get("flops", 0.0))
        byts = float(cost.get("bytes accessed", 0.0))
        rate = 1.0 / per_step
        mfu = flops * rate / 197e12 * 100
        hbm = byts * rate / 819e9 * 100
        print(f"[bench-serve] one megastep (B={B}): "
              f"{flops / 1e9:.2f} GFLOP, {byts / 1e6:.1f} MB accessed -> "
              f"at {rate:.1f} steps/s: {flops * rate / 1e12:.3f} TFLOP/s "
              f"({mfu:.2f}% MFU), {byts * rate / 1e9:.1f} GB/s HBM "
              f"({hbm:.1f}% of peak); arithmetic intensity "
              f"{flops / max(byts, 1):.1f} FLOP/B "
              f"-> {'HBM' if flops / max(byts, 1) < 240 else 'MXU'}-bound "
              f"on-chip, dispatch/RTT-bound if utilizations are low",
              file=sys.stderr)
    print(json.dumps({
        "metric": "served_frames_per_sec_per_chip",
        "value": round(agg, 2),
        "unit": "frames/s",
        "vs_baseline": round(agg / 10.0, 2),
    }))


def bench_batch(args):
    """Batched multi-window solve throughput: many sliding-window problems
    solved simultaneously (the data-parallel replay story — multiple
    sequences or decoupled time windows per chip)."""
    import time

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from ctrlvio_tpu.solver import lm
    from ctrlvio_tpu.solver.layout import SolveOptions, WindowConfig
    from functools import partial

    if args.preset == "cpu-smoke":
        jax.config.update("jax_platforms", "cpu")
    dtype = np.float32
    cfg = WindowConfig(KW=48, NB=11, LM=256, OBS=768, MIMU=512, dt=0.05)
    _, params, img, imu, bias, fixed, aux, prior = g._tiny_problem(dtype, cfg)
    ext, gravity, imu_info, sqrt_info_img = aux
    opts = SolveOptions(max_iters=15)
    to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    img, imu, bias = to_j(img), to_j(imu), to_j(bias)
    fixedj = jnp.asarray(fixed)

    def run(B):
        stack = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * B), t)
        f = jax.jit(jax.vmap(partial(
            lm.solve_window, cfg=cfg, opts=opts,
        ), in_axes=(0, 0, 0, 0, 0, 0, None, None, None, None)))
        a = (stack(params), stack(img), stack(imu), stack(bias), stack(prior),
             jnp.stack([fixedj] * B))
        out = f(*a, ext, gravity, imu_info, sqrt_info_img)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*a, ext, gravity, imu_info, sqrt_info_img))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    sweep = [1, 2, 4, 8, 16]
    wps = {}
    for B in sweep:
        tB = run(B)
        wps[B] = B / tB
        eff = wps[B] / (B * wps[1])
        print(f"[bench-batch] B={B:2d}: {tB * 1e3:7.1f} ms "
              f"({wps[B]:7.1f} windows/s, per-window efficiency {eff:.2f})",
              file=sys.stderr)
    best = max(wps.values())
    print(json.dumps({
        "metric": "batched_window_solves_per_sec",
        "value": round(best, 2),
        "unit": "windows/s",
        "vs_baseline": round(best / 10.0, 2),
    }))


if __name__ == "__main__":
    main()
