#!/usr/bin/env python
"""Op-level device profile of the serve-mode vmapped megastep.

Runs a short single-lane streaming replay to capture a REALISTIC steady
state (device window state + one frame's upload blob), stacks it B times,
then traces `vmap(megastep)` with jax.profiler and prints device time per
XLA op aggregated from the xplane proto (TensorBoard-free parse — the
installed tensorboard_plugin_profile converter is broken against this TF).

Usage:  python tools/profile_serve.py [--batch 16] [--reps 5]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture_state(duration=6.0, warmup=10):
    """Short GT-bootstrapped streaming run; returns (vio, dev_state, blob)."""
    import jax
    import jax.numpy as jnp

    from ctrlvio_tpu.estimator.initializer import bootstrap_from_sim
    from ctrlvio_tpu.estimator.odometry import CtrlVIO, VIOConfig
    from ctrlvio_tpu.ops import so3
    from ctrlvio_tpu.sim import synthetic
    from ctrlvio_tpu.solver.layout import WindowConfig

    jax.config.update("jax_enable_x64", True)
    sim = synthetic.generate(synthetic.SimConfig(
        duration=duration, n_landmarks=300, seed=3))
    cfg = VIOConfig(
        window_config=WindowConfig(KW=32, NB=11, LM=256, OBS=768, MIMU=256),
        fix_ld=False, ld_init=sim.cfg.line_delay, dtype=np.float32,
        stream=True, stream_warmup=warmup)
    q_CtoI = np.asarray(so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))))
    vio = CtrlVIO(cfg, q_CtoI, np.array(sim.cfg.ext_pos))
    init = bootstrap_from_sim(sim)
    for k in range(len(sim.imu_t_ns)):
        vio.process_imu(sim.imu_t_ns[k], sim.gyro[k], sim.accel[k])
    vio.set_initial_state(init.t_ns, init.q, init.p, init.bg, init.ba,
                          init.gravity, v0=init.v)

    grabbed = {}
    orig = vio._megastep

    def capture(st, blob, *a, **k):
        grabbed["blob"] = np.asarray(blob)
        return orig(st, blob, *a, **k)

    vio._megastep = capture
    for i, fr in enumerate(sim.frames):
        vio.process_frame(fr.t_ns, fr.ids, fr.pts, fr.rows)
        if i % 10 == 0:
            print(f"[capture] frame {i}/{len(sim.frames)}", file=sys.stderr,
                  flush=True)
    vio.flush()
    assert "blob" in grabbed, "stream never dispatched"
    return vio, vio._dev_state, grabbed["blob"]


def parse_xplane(logdir):
    """Aggregate device-op durations from the newest xplane.pb under
    logdir. Returns [(op_name, total_ms, count)] sorted desc."""
    import glob
    import os

    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True),
                   key=os.path.getmtime)
    assert paths, f"no xplane.pb under {logdir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())
    agg = {}
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                t, c = agg.get(name, (0.0, 0))
                agg[name] = (t + ev.duration_ps * 1e-9, c + 1)
    return sorted(((k, v[0], v[1]) for k, v in agg.items()),
                  key=lambda x: -x[1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--logdir", default="/tmp/ctrlvio_serve_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--sweep", action="store_true",
                    help="time (untraced) a sweep of batch sizes, no trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from ctrlvio_tpu.estimator import stream as stream_mod

    vio, dev_state, blob = capture_state()
    print(f"[profile] captured steady state; backend={jax.default_backend()}",
          file=sys.stderr)

    if args.sweep:
        for B in (1, 2, 4, 8, 16):
            stacked = jax.tree_util.tree_map(
                lambda x: jnp.stack([x] * B), dev_state)
            blobs = jnp.stack([jnp.asarray(blob)] * B)
            vmega = jax.jit(jax.vmap(
                partial(stream_mod.megastep, cfg=vio.wc, opts=vio._ba_opts),
                in_axes=(0, 0, None, None, None, None)))
            a = (vio._ext, vio._gravity_j, vio._imu_info, vio._sqrt_info_img)
            st, out = stacked, None
            for _ in range(3):
                st, out = vmega(st, blobs, *a)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                st, out = vmega(st, blobs, *a)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.reps
            print(f"[sweep] B={B:2d}: {dt * 1e3:7.1f} ms/step "
                  f"({B / dt:6.1f} frames/s aggregate, "
                  f"{dt / B * 1e3:6.2f} ms/lane)", flush=True)
        return

    B = args.batch
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * B), dev_state)
    blobs = jnp.stack([jnp.asarray(blob)] * B)
    vmega = jax.jit(jax.vmap(
        partial(stream_mod.megastep, cfg=vio.wc, opts=vio._ba_opts),
        in_axes=(0, 0, None, None, None, None)))
    a = (vio._ext, vio._gravity_j, vio._imu_info, vio._sqrt_info_img)

    st, out = stacked, None
    for _ in range(3):  # compile + warm
        st, out = vmega(st, blobs, *a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        st, out = vmega(st, blobs, *a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.reps
    print(f"[profile] B={B}: {dt * 1e3:.1f} ms/step untraced "
          f"({B / dt:.1f} frames/s)", file=sys.stderr)

    jax.profiler.start_trace(args.logdir)
    for _ in range(args.reps):
        st, out = vmega(st, blobs, *a)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    rows = parse_xplane(args.logdir)
    tot = sum(r[1] for r in rows)
    print(f"[profile] total device op time {tot:.1f} ms over {args.reps} "
          f"steps ({tot / args.reps:.1f} ms/step)", file=sys.stderr)
    for name, ms, cnt in rows[: args.top]:
        print(f"  {ms / args.reps:9.3f} ms/step  x{cnt:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
