"""Multi-host (DCN) validation harness.

The reference has no distributed layer at all (SURVEY §2.2); the TPU-native
equivalent is `jax.distributed` + a mesh spanning hosts, with the same
`seq`/`fac` shardings — collectives ride ICI within a host and DCN across
hosts. Real pods are unavailable in this environment, so this harness runs
the REAL multi-process path on CPU: N python processes, each a "host" with
its own local devices, coordinated by `jax.distributed.initialize`, solving
a globally-sharded batch of windows with `ctrlvio_tpu.parallel.batch`.

Run directly (spawns workers):

    python -m ctrlvio_tpu.parallel.multihost --processes 2 --local-devices 4
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def worker(process_id: int, num_processes: int, local_devices: int,
           coordinator: str, bench_iters: int = 0) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as g
    from ctrlvio_tpu.parallel import batch, mesh as mesh_mod
    from ctrlvio_tpu.solver.layout import SolveOptions

    devices = jax.devices()  # GLOBAL device list across processes
    n_global = num_processes * local_devices
    assert len(devices) == n_global, (len(devices), n_global)

    cfg, params, img, imu, bias, fixed, aux, prior = g._tiny_problem(
        np.float32)
    ext, gravity, imu_info, sqrt_info_img = aux
    opts = SolveOptions(max_iters=2)
    mesh = mesh_mod.make_mesh(n_seq=n_global, n_fac=1, devices=devices)

    B = n_global
    stack = lambda tree: jax.tree_util.tree_map(
        lambda x: jnp.stack([jnp.asarray(x)] * B), tree)
    solve_b = batch.make_batched_solver(mesh, cfg, opts)
    out, stats = solve_b(stack(params), stack(img), stack(imu), stack(bias),
                         stack(prior), stack(fixed), ext, gravity, imu_info,
                         sqrt_info_img)
    jax.block_until_ready(out)
    # the batch axis spans processes: gather before reading (host-local
    # reads of non-addressable shards are illegal in multi-process jax)
    from jax.experimental import multihost_utils

    c0 = float(np.asarray(multihost_utils.process_allgather(
        stats.cost0, tiled=True))[0])
    c1 = float(np.asarray(multihost_utils.process_allgather(
        stats.cost, tiled=True))[0])
    assert c1 < c0, (c0, c1)
    if process_id == 0:
        print(f"[multihost] {num_processes} processes x {local_devices} "
              f"devices: global mesh {dict(mesh.shape)}, B={B} "
              f"cost {c0:.3e} -> {c1:.3e} OK", flush=True)

    if bench_iters:
        # scaling measurement: per-process work is CONSTANT (B = global
        # device count, so one window per device); deviation of
        # throughput/process from the 1-process run is pure coordination /
        # DCN-protocol overhead (the SURVEY §2.2 efficiency question)
        import time

        # production solve depth (cfg.ba_iters=12): the efficiency number
        # must reflect the real coordination-overhead-to-work ratio
        opts_b = SolveOptions(max_iters=12)
        solve_t = batch.make_batched_solver(mesh, cfg, opts_b)
        args_t = (stack(params), stack(img), stack(imu), stack(bias),
                  stack(prior), stack(fixed), ext, gravity, imu_info,
                  sqrt_info_img)
        jax.block_until_ready(solve_t(*args_t)[0])  # compile
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("bench_start")
        t0 = time.perf_counter()
        for _ in range(bench_iters):
            out, _ = solve_t(*args_t)
        jax.block_until_ready(out)
        multihost_utils.sync_global_devices("bench_end")
        dt = time.perf_counter() - t0
        if process_id == 0:
            wps = B * bench_iters / dt
            print(f"[multihost-bench] procs={num_processes} B={B} "
                  f"iters={bench_iters} wall={dt:.2f}s "
                  f"wps={wps:.2f} wps_per_proc={wps / num_processes:.2f}",
                  flush=True)
    jax.distributed.shutdown()


def launch(num_processes: int = 2, local_devices: int = 4,
           port: int = 39713, timeout: float = 600.0,
           bench_iters: int = 0, pin_cores: bool = False,
           core_map=None) -> str:
    """Spawn the worker processes and wait for success. Returns process-0
    output (contains the [multihost-bench] line when bench_iters > 0).

    pin_cores: give each worker ONE core (taskset) so the scaling curve
    isolates coordination overhead — without it, XLA CPU's intra-op thread
    pool makes a single process consume every core and the curve measures
    core contention instead.
    core_map: optional explicit worker->core list (overrides the default
    pid%n_cores assignment; used by the contention-isolation experiments)."""
    coordinator = f"localhost:{port}"
    procs = []
    env = dict(os.environ)
    n_cores = os.cpu_count() or 1
    for pid in range(num_processes):
        cmd = [sys.executable, "-m", "ctrlvio_tpu.parallel.multihost",
               "--worker", str(pid), "--processes", str(num_processes),
               "--local-devices", str(local_devices),
               "--coordinator", coordinator,
               "--bench-iters", str(bench_iters)]
        if core_map is not None:
            cmd = ["taskset", "-c", str(core_map[pid])] + cmd
        elif pin_cores:
            cmd = ["taskset", "-c", str(pid % n_cores)] + cmd
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT))
    out0 = procs[0].communicate(timeout=timeout)[0].decode()
    codes = [out0] and [p.wait(timeout=timeout) for p in procs]
    print(out0)
    if any(codes):
        raise RuntimeError(f"multihost workers failed: {codes}\n{out0}")
    if "[multihost]" not in out0:
        raise RuntimeError(f"no success line from process 0:\n{out0}")
    return out0


def scaling(process_counts=(1, 2, 4), local_devices: int = 1,
            bench_iters: int = 40, port_base: int = 39741,
            repeats: int = 2, core_maps=None) -> dict:
    """Weak-scaling efficiency curve over process counts: one window per
    device, so ideal scaling keeps wps/process constant. Each point takes
    the best of `repeats` launches (the per-launch measurement window is
    seconds; transient scheduler noise otherwise dominates the ratio).
    core_maps: optional {procs: core list} explicit pinnings.
    Returns {procs: (wps, efficiency_vs_1proc)}."""
    import re

    results = {}
    base = None
    for i, n in enumerate(process_counts):
        wps = 0.0
        for r in range(repeats):
            out = launch(n, local_devices, port=port_base + 2 * i + r,
                         bench_iters=bench_iters, pin_cores=True,
                         core_map=(core_maps or {}).get(n))
            m = re.search(r"wps=([0-9.]+)", out)
            wps = max(wps, float(m.group(1)))
        per = wps / n
        if base is None:
            base = per
        results[n] = (wps, per / base)
        print(f"[scaling] procs={n} x {local_devices} dev: "
              f"{wps:.2f} windows/s, efficiency {per / base:.2f}", flush=True)
    return results


def scaling_artifact(path: str = None, bench_iters: int = 20) -> dict:
    """Run the weak-scaling matrix and write a machine-checkable JSON
    artifact (SCALING.json by default, next to MULTICHIP_r*.json):

    - 1/2/3/4 processes x 1 device (the DCN-protocol-overhead curve). The
      3-proc point leaves one core free for the coordinator service threads
      + OS: if eff(3) holds >=0.8 while eff(4) drops, the 4-proc knee is
      exactly where cores run out — host contention, not protocol.
    - 1/2/4 processes x 2 devices (per-process work doubled on the same
      pinned core): protocol overhead is constant per step, so if
      efficiency RECOVERS with bigger work quanta the overhead is a fixed
      host tax, not a per-byte protocol cost.
    - contention control: 2 processes deliberately pinned to the SAME core
      — calibrates what pure core contention does to this workload
      (expected ~0.5; protocol overhead at 2 procs is separately known
      from the clean 2-proc point).

    North star: >=80% efficiency at 2+ hosts (BASELINE.md:34)."""
    import json
    import re
    import time

    n_cores = os.cpu_count() or 1
    counts = tuple(n for n in (1, 2, 3, 4) if n <= n_cores)
    # leave core 0 (the busiest: OS + coordinator gRPC) free below full
    # occupancy: procs 1..n map to cores n_cores-1 downward
    maps = {n: [n_cores - 1 - i for i in range(n)] for n in counts
            if n < n_cores}
    curve_1dev = scaling(counts, local_devices=1, bench_iters=bench_iters,
                         port_base=39741, core_maps=maps)
    curve_2dev = scaling(tuple(n for n in (1, 2, 4) if n <= n_cores),
                         local_devices=2, bench_iters=bench_iters,
                         port_base=39771, core_maps=maps)
    # contention control: both workers on one core
    wps_ctl = 0.0
    for r in range(2):
        out = launch(2, 1, port=39791 + r, bench_iters=bench_iters,
                     pin_cores=True, core_map=[n_cores - 1, n_cores - 1])
        m = re.search(r"wps=([0-9.]+)", out)
        wps_ctl = max(wps_ctl, float(m.group(1)))
    eff_ctl = (wps_ctl / 2) / (curve_1dev[1][0] / 1)
    print(f"[scaling] contention control (2 procs, ONE core): "
          f"{wps_ctl:.2f} windows/s, efficiency {eff_ctl:.2f}", flush=True)
    art = {
        "what": "weak-scaling efficiency, jax.distributed multi-process CPU "
                "(protocol-true DCN stand-in; pods unavailable), one pinned "
                "core per worker, one window per device",
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "host_cores": n_cores,
        "x1dev": {str(n): {"windows_per_s": round(w, 2),
                           "efficiency": round(e, 3)}
                  for n, (w, e) in curve_1dev.items()},
        "x2dev": {str(n): {"windows_per_s": round(w, 2),
                           "efficiency": round(e, 3)}
                  for n, (w, e) in curve_2dev.items()},
        "contention_control_2procs_1core": {
            "windows_per_s": round(wps_ctl, 2),
            "efficiency": round(eff_ctl, 3),
            "reads": "pure core-contention calibration: two workers "
                     "sharing one core",
        },
        "north_star": ">=0.80 efficiency at 2+ processes (BASELINE.md:34)",
    }
    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "SCALING.json")
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    print(f"[scaling] artifact -> {path}", flush=True)
    return art


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--coordinator", default="localhost:39713")
    ap.add_argument("--bench-iters", type=int, default=0)
    ap.add_argument("--scaling", action="store_true",
                    help="run the weak-scaling matrix and write SCALING.json")
    args = ap.parse_args(argv)
    if args.scaling:
        scaling_artifact()
    elif args.worker is None:
        launch(args.processes, args.local_devices,
               bench_iters=args.bench_iters)
    else:
        worker(args.worker, args.processes, args.local_devices,
               args.coordinator, bench_iters=args.bench_iters)


if __name__ == "__main__":
    main()
