#!/usr/bin/env python
"""A/B the normal-equation builder on-chip: dense-J vs chunked accumulation.

Captures one realistic steady state (same as profile_serve), then times the
vmapped streaming megastep at the given batch sizes under each CTRLVIO_NE
mode (env read at trace time, so one process can trace both).

Usage: python tools/ne_ab.py [--batches 1,16] [--modes dense,chunked]
                             [--chunks 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_serve import capture_state  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,16")
    ap.add_argument("--modes", default="dense,chunked")
    ap.add_argument("--chunks", default="128",
                    help="chunk sizes to try for the chunked mode")
    ap.add_argument("--solvers", default="chol",
                    help="schur solver variants, e.g. chol,cg16,cg48")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from ctrlvio_tpu.estimator import stream as stream_mod

    vio, dev_state, blob = capture_state()
    print(f"[ne_ab] captured; backend={jax.default_backend()}",
          file=sys.stderr, flush=True)

    variants = []
    for m in args.modes.split(","):
        chunks = [int(c) for c in args.chunks.split(",")] \
            if m == "chunked" else [0]
        for c in chunks:
            for sv in args.solvers.split(","):
                variants.append((m, c, sv))

    results = {}
    for mode, chunk, sv in variants:
        os.environ["CTRLVIO_NE"] = mode
        os.environ["CTRLVIO_NE_CHUNK"] = str(chunk)
        if sv.startswith("cg"):
            os.environ["CTRLVIO_SOLVE"] = "cg"
            os.environ["CTRLVIO_CG_ITERS"] = sv[2:] or "48"
        else:
            os.environ["CTRLVIO_SOLVE"] = "chol"
        for B in (int(b) for b in args.batches.split(",")):
            stacked = jax.tree_util.tree_map(
                lambda x: jnp.stack([x] * B), dev_state)
            blobs = jnp.stack([jnp.asarray(blob)] * B)

            # a fresh partial per variant defeats the jit cache (env is
            # read at trace time inside solve_window)
            def mega(st, bl, a1, a2, a3, a4, _tag=(mode, chunk, sv, B)):
                return stream_mod.megastep(st, bl, a1, a2, a3, a4,
                                           cfg=vio.wc, opts=vio._ba_opts)

            vmega = jax.jit(jax.vmap(mega,
                                     in_axes=(0, 0, None, None, None, None)))
            a = (vio._ext, vio._gravity_j, vio._imu_info, vio._sqrt_info_img)
            t0 = time.perf_counter()
            st, out = vmega(stacked, blobs, *a)
            jax.block_until_ready(out)
            t_compile = time.perf_counter() - t0
            for _ in range(3):
                st, out = vmega(st, blobs, *a)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                st, out = vmega(st, blobs, *a)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.reps
            tag = f"{mode}{'' if not chunk else f'/{chunk}'}/{sv}"
            results[(tag, B)] = dt
            print(f"[ne_ab] {tag:14s} B={B:2d}: {dt * 1e3:7.1f} ms/step "
                  f"({B / dt:7.1f} frames/s aggregate) "
                  f"[compile+first {t_compile:.0f}s]", flush=True)
    return results


if __name__ == "__main__":
    main()
