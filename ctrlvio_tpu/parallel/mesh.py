"""Device mesh construction for multi-chip / multi-host scale-out.

The reference has no distributed layer (SURVEY §2.2); its only parallelism is
4 pthreads summing partial Hessians (`marginalization_factor.cpp:209-238`).
The TPU-native equivalents built on this mesh:

- `seq` axis: data parallelism over sequences (many bag replays at once),
- `fac` axis: factor sharding of the Gauss-Newton assembly inside one
  window, reduced with psum over ICI (the hardware version of the pthread
  partial-H sum).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_seq: int = None, n_fac: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_seq is None:
        n_seq = n // n_fac
    assert n_seq * n_fac <= n, f"need {n_seq}x{n_fac} devices, have {n}"
    dev = np.asarray(devices[: n_seq * n_fac]).reshape(n_seq, n_fac)
    return Mesh(dev, ("seq", "fac"))


def seq_sharding(mesh: Mesh):
    """Batch-of-sequences sharding: leading axis over 'seq'."""
    return NamedSharding(mesh, P("seq"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
