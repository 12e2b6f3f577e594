"""SO(3) primitives on quaternions and rotation vectors.

TPU-native replacement for the reference's vendored Sophus SO3 and the
right/left Jacobian helpers (`/root/reference/src/utils/sophus_utils.hpp:166-335`,
`/root/reference/src/sophus_lib/so3.hpp`). Everything here is:

- pure, dtype-polymorphic (runs f32 on TPU, f64 on CPU for oracle tests),
- batched over arbitrary leading axes (all ops are written element-wise /
  einsum-style so `jax.vmap` is free),
- numerically safe at the phi -> 0 singularity via the double-`where` trick
  (so autodiff through the small-angle branch never sees NaN).

Quaternion convention: (w, x, y, z), unit norm, Hamilton product.
Rotation action: `quat_rotate(q, v) = R(q) @ v` with R the world-from-body
matrix when q is a body-to-world rotation.
Tangent convention: *right* perturbation, `q ⊞ phi = q * exp(phi)`.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = {jnp.float32.dtype: 1e-6, jnp.float64.dtype: 1e-10}


def _small(x):
    return x < _EPS.get(x.dtype, 1e-6)


def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(q1, q2):
    """Hamilton product, broadcasting over leading axes."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_exp(phi):
    """Rotation vector (..., 3) -> unit quaternion (..., 4). exp(phi)."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    eps = _EPS.get(theta2.dtype, 1e-6)
    small = theta2 < eps * eps
    # shield sqrt from 0 so grad stays finite (double-where trick)
    safe_theta = jnp.sqrt(jnp.where(small, jnp.ones_like(theta2), theta2))
    half = 0.5 * safe_theta
    # sin(t/2)/t with Taylor fallback 1/2 - t^2/48
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / safe_theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * phi], axis=-1)


def quat_log(q):
    """Unit quaternion (..., 4) -> rotation vector (..., 3). log(q)."""
    w = q[..., :1]
    v = q[..., 1:]
    # force w >= 0 (shortest arc)
    sign = jnp.where(w < 0, -jnp.ones_like(w), jnp.ones_like(w))
    w = w * sign
    v = v * sign
    v2 = jnp.sum(v * v, axis=-1, keepdims=True)
    eps = _EPS.get(v2.dtype, 1e-6)
    small = v2 < eps * eps
    # shield sqrt from 0 so grad stays finite (double-where trick)
    safe_vnorm = jnp.sqrt(jnp.where(small, jnp.ones_like(v2), v2))
    angle = 2.0 * jnp.arctan2(safe_vnorm, w)
    # k = angle / ||v||; Taylor: 2/w * (1 - ||v||^2 / (3 w^2))
    w_safe = jnp.maximum(w, jnp.asarray(1e-3, dtype=w.dtype))
    k = jnp.where(
        small,
        2.0 / w_safe * (1.0 - v2 / (3.0 * w_safe * w_safe)),
        angle / safe_vnorm,
    )
    return k * v


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_rotate_inv(q, v):
    return quat_rotate(quat_conj(q), v)


def quat_to_matrix(q):
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(R):
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), w >= 0.

    Branch-free Shepperd-style recovery: compute all four candidate columns
    and select the best-conditioned one.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    norms2 = jnp.sum(cand * cand, axis=-1)
    best = jnp.argmax(norms2, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    q = quat_normalize(q)
    sign = jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q * sign


def hat(v):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def vee(M):
    return jnp.stack([M[..., 2, 1], M[..., 0, 2], M[..., 1, 0]], axis=-1)


def _jac_coeffs(phi):
    """Shared coefficients for the SO(3) Jacobians.

    Returns (theta2, A, B) with
      J_l(phi)  = I + A * hat(phi) + B * hat(phi)^2
      A = (1-cos t)/t^2,  B = (t - sin t)/t^3
    """
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    eps = _EPS.get(theta2.dtype, 1e-6)
    small = theta2 < eps * eps
    safe_t2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    safe_t = jnp.sqrt(safe_t2)
    A = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_t)) / safe_t2)
    B = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (safe_t - jnp.sin(safe_t)) / (safe_t2 * safe_t)
    )
    return theta2, A, B


def left_jacobian(phi):
    """J_l(phi): d/d eps [ exp(phi + J_l eps) ] — (..., 3, 3)."""
    _, A, B = _jac_coeffs(phi)
    P = hat(phi)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye + A * P + B * (P @ P)


def right_jacobian(phi):
    """J_r(phi) = J_l(-phi) = J_l(phi)^T."""
    _, A, B = _jac_coeffs(phi)
    P = hat(phi)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye - A * P + B * (P @ P)


def _inv_jac_coeff(phi):
    """C = 1/t^2 - (1+cos t)/(2 t sin t), with Taylor 1/12 + t^2/720."""
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = theta2 < 1e-6
    safe_t2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    safe_t = jnp.sqrt(safe_t2)
    C = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / safe_t2 - (1.0 + jnp.cos(safe_t)) / (2.0 * safe_t * jnp.sin(safe_t)),
    )
    return C


def left_jacobian_inv(phi):
    """J_l(phi)^{-1} = I - hat(phi)/2 + C hat(phi)^2."""
    C = _inv_jac_coeff(phi)
    P = hat(phi)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye - 0.5 * P + C * (P @ P)


def right_jacobian_inv(phi):
    """J_r(phi)^{-1} = I + hat(phi)/2 + C hat(phi)^2."""
    C = _inv_jac_coeff(phi)
    P = hat(phi)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye + 0.5 * P + C * (P @ P)


def boxplus(q, phi):
    """Right-tangent update q * exp(phi)."""
    return quat_normalize(quat_mul(q, quat_exp(phi)))


def boxminus(q, q0):
    """Right-tangent difference log(q0^{-1} q); boxplus(q0, boxminus(q, q0)) == q."""
    return quat_log(quat_mul(quat_conj(q0), q))
