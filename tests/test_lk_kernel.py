"""Pallas LK kernel (interpret mode on CPU) vs known shifts and the pure-JAX
reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlvio_tpu.ops.pallas import lk_kernel
from tests.test_frontend import make_texture, shift_image


def test_lk_kernel_recovers_small_shift():
    img0 = make_texture(h=200, w=320, seed=4)
    dx, dy = 2.4, -1.7
    img1 = shift_image(img0, dx, dy)
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(70, 250, 24), rng.uniform(50, 150, 24)], axis=1)

    out, eig = lk_kernel.lk_refine(
        jnp.asarray(img0, jnp.float32), jnp.asarray(img1, jnp.float32),
        jnp.asarray(pts, jnp.float32), jnp.asarray(pts, jnp.float32),
        iters=12, interpret=True)
    flow = np.asarray(out) - pts
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=0.15)
    assert np.asarray(eig).min() > 0


def test_lk_kernel_matches_jax_reference():
    from ctrlvio_tpu.frontend import klt

    img0 = make_texture(h=200, w=320, seed=9)
    img1 = shift_image(img0, 1.3, 0.8)
    rng = np.random.default_rng(1)
    pts = np.stack([rng.uniform(70, 250, 16), rng.uniform(50, 150, 16)], axis=1)

    out_k, eig_k = lk_kernel.lk_refine(
        jnp.asarray(img0, jnp.float32), jnp.asarray(img1, jnp.float32),
        jnp.asarray(pts, jnp.float32), jnp.asarray(pts, jnp.float32),
        iters=10, interpret=True)

    cfg = klt.KLTConfig(iters=10)
    ref = []
    for p in pts:
        g, _ = klt._track_level(jnp.asarray(img0, jnp.float32),
                                jnp.asarray(img1, jnp.float32),
                                jnp.asarray(p, jnp.float32),
                                jnp.asarray(p, jnp.float32), cfg)
        ref.append(np.asarray(g))
    ref = np.stack(ref)
    # same algorithm, slightly different sampling path -> sub-0.1px agreement
    np.testing.assert_allclose(np.asarray(out_k), ref, atol=0.1)
