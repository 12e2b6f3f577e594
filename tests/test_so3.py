import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlvio_tpu.ops import so3


def rand_phi(key, n, scale=2.5):
    return jax.random.normal(key, (n, 3), dtype=jnp.float64) * scale


def test_exp_log_roundtrip():
    phi = rand_phi(jax.random.PRNGKey(0), 64, scale=0.9)
    q = so3.quat_exp(phi)
    np.testing.assert_allclose(so3.quat_log(q), phi, atol=1e-12)


def test_exp_log_small_angle():
    phi = rand_phi(jax.random.PRNGKey(1), 16, scale=1e-9)
    q = so3.quat_exp(phi)
    np.testing.assert_allclose(so3.quat_log(q), phi, atol=1e-15)
    # gradients are finite at zero
    g = jax.grad(lambda p: jnp.sum(so3.quat_exp(p)))(jnp.zeros(3))
    assert np.all(np.isfinite(g))
    g2 = jax.grad(lambda p: jnp.sum(so3.quat_log(so3.quat_exp(p))))(jnp.zeros(3))
    np.testing.assert_allclose(g2, np.ones(3), atol=1e-8)


def test_rotate_matches_matrix():
    key = jax.random.PRNGKey(2)
    phi = rand_phi(key, 32)
    v = jax.random.normal(jax.random.PRNGKey(3), (32, 3), dtype=jnp.float64)
    q = so3.quat_exp(phi)
    R = so3.quat_to_matrix(q)
    np.testing.assert_allclose(
        so3.quat_rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-12
    )


def test_matrix_quat_roundtrip():
    phi = rand_phi(jax.random.PRNGKey(4), 64)
    q = so3.quat_exp(phi)
    # canonical w>=0
    sign = jnp.where(q[:, :1] < 0, -1.0, 1.0)
    q_can = q * sign
    q2 = so3.matrix_to_quat(so3.quat_to_matrix(q))
    np.testing.assert_allclose(q2, q_can, atol=1e-12)


def test_mul_matches_matrix_product():
    qa = so3.quat_exp(rand_phi(jax.random.PRNGKey(5), 8))
    qb = so3.quat_exp(rand_phi(jax.random.PRNGKey(6), 8))
    Rab = so3.quat_to_matrix(so3.quat_mul(qa, qb))
    np.testing.assert_allclose(
        Rab, so3.quat_to_matrix(qa) @ so3.quat_to_matrix(qb), atol=1e-12
    )


@pytest.mark.parametrize("scale", [2.0, 1e-5])
def test_left_jacobian_fd(scale):
    """J_l: exp(phi + d) ≈ exp(J_l(phi) d) exp(phi)."""
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.normal(size=3) * scale)
    Jl = so3.left_jacobian(phi)
    eps = 1e-7
    for k in range(3):
        d = np.zeros(3)
        d[k] = eps
        lhs = so3.quat_exp(phi + d)
        rhs = so3.quat_mul(so3.quat_exp(Jl @ jnp.asarray(d)), so3.quat_exp(phi))
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)


@pytest.mark.parametrize("scale", [2.0, 1e-5])
def test_right_jacobian_fd(scale):
    """J_r: exp(phi + d) ≈ exp(phi) exp(J_r(phi) d)."""
    rng = np.random.default_rng(1)
    phi = jnp.asarray(rng.normal(size=3) * scale)
    Jr = so3.right_jacobian(phi)
    eps = 1e-7
    for k in range(3):
        d = np.zeros(3)
        d[k] = eps
        lhs = so3.quat_exp(phi + d)
        rhs = so3.quat_mul(so3.quat_exp(phi), so3.quat_exp(Jr @ jnp.asarray(d)))
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)


def test_jacobian_inverses():
    phi = rand_phi(jax.random.PRNGKey(7), 16, scale=1.5)
    eye = jnp.eye(3)
    for J, Ji in [
        (so3.left_jacobian(phi), so3.left_jacobian_inv(phi)),
        (so3.right_jacobian(phi), so3.right_jacobian_inv(phi)),
    ]:
        np.testing.assert_allclose(J @ Ji, jnp.broadcast_to(eye, (16, 3, 3)), atol=1e-10)


def test_boxplus_boxminus():
    q0 = so3.quat_exp(rand_phi(jax.random.PRNGKey(8), 8))
    phi = rand_phi(jax.random.PRNGKey(9), 8, scale=0.5)
    q = so3.boxplus(q0, phi)
    np.testing.assert_allclose(so3.boxminus(q, q0), phi, atol=1e-12)


def test_hat_vee():
    v = rand_phi(jax.random.PRNGKey(10), 4)
    np.testing.assert_allclose(so3.vee(so3.hat(v)), v, atol=0)
    w = jax.random.normal(jax.random.PRNGKey(11), (4, 3), dtype=jnp.float64)
    np.testing.assert_allclose(
        jnp.einsum("nij,nj->ni", so3.hat(v), w), jnp.cross(v, w), atol=1e-14
    )
