"""Matmul-precision control for the estimator's numerical core.

On TPU, JAX's default matmul precision feeds the MXU with bfloat16-rounded
inputs (~8 mantissa bits). That is the right trade for the image front-end,
but it is catastrophic for the estimator core: the normal equations
H = J^T J, the Schur products, and above all the QR square-root
marginalization — whose output becomes the *prior* and feeds back into
every subsequent solve with no accept-gate protecting it. Measured on a
v5e: the full streaming replay converges to the same trajectory as the f64
CPU oracle with float32 matmuls, and diverges (ld pinned at its bound,
unbounded ATE) with the bf16 default.

`f32_matmuls` wraps a traced function body in
`jax.default_matmul_precision("float32")` so every JAX-traced dot/einsum/
conv inside runs the MXU in full f32 (3-pass) mode. (XLA's QR/Cholesky
expander custom calls carry their own internal precision config — already
highest — so the decorator's job is the solver's explicit dots/einsums,
not the factorization internals.) The solver's matmuls are small (C≈373
dense system), so the cost is noise next to dispatch/HBM; correctness is
not negotiable.

The image front-end (pyramids, LK windows) deliberately stays at the bf16
default — pixel-level robustness tolerates it and it is the only place
with MXU-bound matmul volume.

Every estimator-core jit entry point must be wrapped; CPU CI cannot catch
a missed site (matmul precision only matters on TPU), so
`tests/test_packing.py::test_estimator_entry_points_pin_f32_matmuls`
asserts the wrap marker on each entry point instead.
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Decorator: trace `fn` under full-f32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    wrapped.__f32_matmuls__ = True  # marker checked by the guard test
    return wrapped
