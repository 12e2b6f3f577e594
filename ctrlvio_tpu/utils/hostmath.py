"""Host-side math placement: pin small bookkeeping computations to CPU.

The estimator's host layer (sim generation, pose queries, triangulation,
dead-reckoning) issues many tiny jnp ops. On a remote-attached TPU (axon)
each dispatch pays tunnel latency, so these must run on the local CPU
backend while the solver's jitted programs run on the TPU. `cpu_device()`
returns a CPU device if one is registered (it always is alongside the TPU
plugin); `on_cpu()` is a context manager pinning jax's default device.
"""

from __future__ import annotations

import contextlib
from functools import lru_cache

import jax


@lru_cache(maxsize=1)
def cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def on_cpu():
    """Context manager: run enclosed jax ops on CPU (no-op if unavailable)."""
    dev = cpu_device()
    if dev is None:
        return contextlib.nullcontext()
    return jax.default_device(dev)
