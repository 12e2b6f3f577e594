"""Batched multi-sequence streaming replay: B full estimators on one chip.

BASELINE config 5's real implementation: B independent sliding-window
estimators replay B sequences in lockstep, and every frame runs ONE
`vmap`-ped streaming megastep over the stacked device states — the per-
window dense algebra becomes batched MXU matmuls, amortizing both the
kernel launch and the transport round trips across sequences. The host
side stays per-sequence (feature tables, packing, mirrors); the device
side is a single (B, ...) pytree owned by this coordinator.

Use:

    vios = [CtrlVIO(cfg, qci, pci) for _ in range(B)]   # cfg.stream=True
    coord = BatchedStream(vios)
    ... feed IMU per instance as usual ...
    outs = coord.step([(t_ns, ids, pts, rows), ...])    # one frame per seq

All instances must share the VIOConfig (the megastep jit is one program)
and initialize at the same frame index (lockstep), which a serving
deployment arranges by starting sequences together (or padding).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ctrlvio_tpu.estimator import stream as stream_mod


class BatchedStream:
    def __init__(self, vios: List):
        assert len(vios) >= 1
        cfg0 = vios[0].cfg
        for v in vios:
            assert v.cfg.stream, "BatchedStream requires cfg.stream=True"
            assert v.cfg.window_config == cfg0.window_config
            v._dispatch_hook = self._on_dispatch
        self.vios = vios
        self.B = len(vios)
        self._slots: List[Optional[tuple]] = [None] * self.B
        self._stacked: Optional[stream_mod.DevState] = None
        v0 = vios[0]
        self._vmega = jax.jit(jax.vmap(
            partial(stream_mod.megastep, cfg=v0.wc, opts=v0._ba_opts),
            in_axes=(0, 0, None, None, None, None)))

    # ------------------------------------------------------------------
    def _on_dispatch(self, vio, blob, host_seeds, meta):
        i = self.vios.index(vio)
        self._slots[i] = (blob, host_seeds, meta)

    # ------------------------------------------------------------------
    def step(self, frames):
        """Feed one frame per sequence; returns the per-sequence outputs of
        `process_frame`. Runs the single vmapped megastep once every
        instance has dispatched this frame."""
        import time as _time

        if not hasattr(self, "timing"):
            from collections import defaultdict

            self.timing = defaultdict(float)
        assert len(frames) == self.B
        self._slots = [None] * self.B
        t0 = _time.perf_counter()
        outs = [v.process_frame(*f) for v, f in zip(self.vios, frames)]
        t1 = _time.perf_counter()
        self.timing["host_lanes"] += t1 - t0

        filled = [s is not None for s in self._slots]
        if not any(filled):
            return outs  # warmup / pre-init frames (sync path)
        if not all(filled):
            raise RuntimeError(
                "lockstep violated: only a subset of sequences dispatched "
                "this frame (mismatched init timing or warmup lengths)")

        if self._stacked is None:
            states = [v._initial_dev_state() for v in self.vios]
            self._stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *states)
        blobs = jnp.stack([jnp.asarray(s[0]) for s in self._slots])
        v0 = self.vios[0]
        self._last_args = (self._stacked, blobs, v0._ext, v0._gravity_j,
                           v0._imu_info, v0._sqrt_info_img)
        t2 = _time.perf_counter()
        self.timing["stack_upload"] += t2 - t1
        self._stacked, summaries = self._vmega(*self._last_args)
        t3 = _time.perf_counter()
        self.timing["dispatch"] += t3 - t2
        for i, v in enumerate(self.vios):
            v._stream_complete(summaries[i], self._slots[i][2])
        self.timing["complete"] += _time.perf_counter() - t3
        self._n_steps = getattr(self, "_n_steps", 0) + 1
        return outs

    # ------------------------------------------------------------------
    def device_steady_ms(self, reps: int = 20):
        """Pure-device steady-state cost of one vmapped megastep: chain the
        LAST step's blob through the jitted megastep `reps` times (state
        feeding back, fully on device) and sync once. Separates chip time
        from the host feed — the step() wall clock is max(host, device)
        when pipelined."""
        import time as _time

        if getattr(self, "_last_args", None) is None:
            return None
        st, blobs, *rest = self._last_args
        out = None
        jax.block_until_ready(st)
        t0 = _time.perf_counter()
        for _ in range(reps):
            st, out = self._vmega(st, blobs, *rest)
        jax.block_until_ready(out)
        return (_time.perf_counter() - t0) / reps * 1e3

    # ------------------------------------------------------------------
    def cost_analysis(self):
        """XLA-reported cost of ONE vmapped megastep (all B lanes):
        {'flops': ..., 'bytes accessed': ...} — the numerator of the MFU /
        HBM-utilization accounting in `bench.py --mode serve`."""
        if getattr(self, "_last_args", None) is None:
            return None
        c = self._vmega.lower(*self._last_args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return c

    # ------------------------------------------------------------------
    def flush(self):
        for v in self.vios:
            v.flush()
