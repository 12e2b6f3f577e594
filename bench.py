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
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=["tpu", "cpu-smoke"], default="tpu")
    ap.add_argument("--mode", choices=["e2e", "batch", "serve"], default="e2e",
                    help="e2e: sequential replay fps; batch: batched "
                         "multi-window solve throughput; serve: B full "
                         "estimators streaming in lockstep through one "
                         "vmapped megastep (config 5)")
    ap.add_argument("--batch-size", type=int, default=8,
                    help="sequences per chip for --mode serve")
    ap.add_argument("--duration", type=float, default=None)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--bootstrap", choices=["visual", "gt"], default="visual",
                    help="visual: full self-bootstrap (SfM + VI alignment, "
                         "like the reference); gt: ground-truth init")
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace of the replay "
                         "(open with TensorBoard/xprof)")
    args = ap.parse_args()

    if args.mode == "batch":
        bench_batch(args)
        return
    if args.mode == "serve":
        bench_serve(args)
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

    sim = synthetic.generate(synthetic.SimConfig(
        duration=duration, n_landmarks=300, seed=args.seed))
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

    est, gt = [], []
    frame_times = []
    # the timed region starts after the bootstrap, jit compiles, AND the
    # stream's sync warmup (a one-time precision bootstrap, not throughput)
    timed_from = None
    with prof_ctx as logdir:
        for i, fr in enumerate(sim.frames):
            while imu_idx < len(sim.imu_t_ns) and \
                    sim.imu_t_ns[imu_idx] <= fr.t_ns:
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
                _, p_gt = sim.pose_at(fr.t_ns * 1e-9)
                gt.append(p_gt)
            if timed_from is not None and i == timed_from:
                vio.timing.clear()  # drop compile-time spikes from stats
            if timed_from is not None and i >= timed_from:
                frame_times.append(dt_frame)
            if i % 25 == 0:
                print(f"[bench] frame {i}/{len(sim.frames)} "
                      f"({dt_frame * 1e3:.0f} ms)", file=sys.stderr, flush=True)
    if args.profile:
        print(f"[bench] profiler trace -> {logdir}", file=sys.stderr)

    vio.flush()  # drain in-flight summaries (stream mode)
    est, gt = np.asarray(est), np.asarray(gt)
    # skip the online-calibration transient; standard 4-DoF-aligned ATE
    err = ate_rmse(est[10:], gt[10:], align="yaw")
    ld_err = abs(vio.traj.line_delay - sim.cfg.line_delay)
    print(f"[bench] frames={len(est)} ATE={err * 100:.2f} cm "
          f"ld={vio.traj.line_delay * 1e6:.2f} us (true {sim.cfg.line_delay * 1e6:.2f}, "
          f"err {ld_err * 1e6:.2f} us)", file=sys.stderr)

    ate_gate = 0.10 if args.preset == "tpu" else 0.06
    if err > ate_gate or ld_err > 5e-6:
        print(f"[bench] FAIL accuracy gates (ATE<{ate_gate}m, ld_err<5us)",
              file=sys.stderr)
        sys.exit(1)

    n_timed = max(len(frame_times), 1)
    phases = {k: round(v / n_timed * 1e3, 1) for k, v in vio.timing.items()}
    print(f"[bench] per-frame phase ms: {phases}", file=sys.stderr)
    if args.preset == "cpu-smoke":
        # per-factor-type residual report (≙ the reference's per-solve
        # ResidualSummary, its de-facto regression signal)
        print(vio.residual_summary().report(), file=sys.stderr)

    per_frame = float(np.median(frame_times))
    fps = 1.0 / per_frame
    print(f"[bench] median frame time {per_frame * 1e3:.1f} ms "
          f"({fps:.1f} fps, keyframe rate 10 Hz)", file=sys.stderr)

    print(json.dumps({
        "metric": "frames_per_sec_per_chip",
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
    warmup = 12  # GT bootstrap: short precision warmup suffices

    sims = [synthetic.generate(synthetic.SimConfig(
        duration=duration, n_landmarks=300, seed=args.seed + i))
        for i in range(B)]
    n_frames = min(len(s.frames) for s in sims)
    vios = []
    for sim in sims:
        cfg = VIOConfig(
            window_config=WindowConfig(KW=32, NB=11, LM=256, OBS=768,
                                       MIMU=256),
            fix_ld=False, ld_init=0.0, dtype=np.float32, stream=True,
            stream_warmup=warmup)
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
        if k >= timed_from:
            times.append(time.perf_counter() - t0)
        if k % 25 == 0:
            print(f"[bench-serve] frame {k}/{n_frames}", file=sys.stderr,
                  flush=True)
    coord.flush()

    # accuracy gates per lane
    for vio, sim in zip(vios, sims):
        t_eval = [f.t_ns for f in sim.frames[timed_from + 6 : n_frames]]
        est = np.stack([vio.traj.pose(t)[1][0] for t in t_eval])
        gt = np.stack([sim.pose_at(t * 1e-9)[1] for t in t_eval])
        err = ate_rmse(est, gt, align="yaw")
        ld_err = abs(vio.traj.line_delay - sim.cfg.line_delay)
        if err > 0.10 or ld_err > 5e-6:
            print(f"[bench-serve] FAIL lane accuracy (ATE {err:.3f} m, "
                  f"ld_err {ld_err * 1e6:.2f} us)", file=sys.stderr)
            sys.exit(1)
    per_step = float(np.median(times))
    agg = B / per_step
    print(f"[bench-serve] B={B}: {per_step * 1e3:.1f} ms/lockstep frame -> "
          f"{agg:.1f} aggregate frames/s ({agg / 10.0:.1f}x realtime "
          f"sequences per chip)", file=sys.stderr)
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
