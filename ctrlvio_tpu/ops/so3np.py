"""Pure-numpy SO(3) mini-ops for the host/bookkeeping layer.

The estimator's host side (pose queries, window slides, dead-reckoning,
triangulation) runs per-frame python code; going through jnp there costs a
re-trace + dispatch per call (~100 ms/frame measured). These are the same
formulas as ops/so3.py in plain numpy. Device code keeps using ops/so3.py.
"""

from __future__ import annotations

import numpy as np


def quat_mul(q1, q2):
    w1, x1, y1, z1 = np.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = np.moveaxis(q2, -1, 0)
    return np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_conj(q):
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def quat_normalize(q):
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def quat_exp(phi):
    phi = np.asarray(phi, dtype=np.float64)
    t2 = np.sum(phi * phi, axis=-1, keepdims=True)
    t = np.sqrt(t2)
    small = t < 1e-10
    ts = np.where(small, 1.0, t)
    k = np.where(small, 0.5 - t2 / 48.0, np.sin(0.5 * ts) / ts)
    w = np.where(small, 1.0 - t2 / 8.0, np.cos(0.5 * ts))
    return np.concatenate([w, k * phi], axis=-1)


def quat_log(q):
    w = q[..., :1]
    v = q[..., 1:]
    sign = np.where(w < 0, -1.0, 1.0)
    w, v = w * sign, v * sign
    vn = np.linalg.norm(v, axis=-1, keepdims=True)
    small = vn < 1e-10
    vns = np.where(small, 1.0, vn)
    angle = 2.0 * np.arctan2(vn, w)
    k = np.where(small, 2.0 / np.maximum(w, 1e-3), angle / vns)
    return k * v


def quat_rotate(q, v):
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * np.cross(qv, v)
    return v + w * t + np.cross(qv, t)


def quat_rotate_inv(q, v):
    return quat_rotate(quat_conj(q), v)


def quat_to_matrix(q):
    w, x, y, z = np.moveaxis(q, -1, 0)
    m = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def boxplus(q, phi):
    return quat_normalize(quat_mul(q, quat_exp(phi)))


def boxminus(q, q0):
    return quat_log(quat_mul(quat_conj(q0), q))


# --- spline evaluation (order 4, host) -------------------------------------

_M_CUM = None
_M_STD = None


def _mats():
    global _M_CUM, _M_STD
    if _M_CUM is None:
        from ctrlvio_tpu.ops.spline import _M_CUM as MC, _M_STD as MS

        _M_CUM, _M_STD = np.asarray(MC), np.asarray(MS)
    return _M_CUM, _M_STD


def _u_pow(u, deriv):
    from ctrlvio_tpu.ops.spline import _BASE

    u = np.asarray(u, dtype=np.float64)
    cols = []
    for j in range(4):
        cols.append(np.zeros_like(u) if j < deriv
                    else _BASE[deriv, j] * u ** (j - deriv))
    return np.stack(cols, axis=-1)


def so3_eval(q4, u):
    """Batched cumulative SO(3) spline value. q4: (..., 4, 4), u: (...)."""
    MC, _ = _mats()
    lam = _u_pow(u, 0) @ MC.T
    d = quat_log(quat_mul(quat_conj(q4[..., :-1, :]), q4[..., 1:, :]))
    q = q4[..., 0, :]
    for i in range(3):
        q = quat_mul(q, quat_exp(lam[..., i + 1 : i + 2] * d[..., i, :]))
    return quat_normalize(q)


def rd_eval(p4, u, inv_dt, deriv=0):
    _, MS = _mats()
    lam = _u_pow(u, deriv) @ MS.T * (inv_dt**deriv)
    return np.einsum("...k,...kd->...d", lam, p4)


def so3_vel_body(q4, u, inv_dt):
    """Body angular velocity of the cumulative SO(3) spline (numpy)."""
    MC, _ = _mats()
    lam = _u_pow(u, 0) @ MC.T
    dlam = _u_pow(u, 1) @ MC.T * inv_dt
    d = quat_log(quat_mul(quat_conj(q4[..., :-1, :]), q4[..., 1:, :]))
    w = np.zeros(q4.shape[:-2] + (3,))
    for i in range(3):
        kd = lam[..., i + 1 : i + 2] * d[..., i, :]
        w = quat_rotate(quat_exp(-kd), w) + dlam[..., i + 1 : i + 2] * d[..., i, :]
    return w
