"""Uniform B-spline evaluation on SO(3) x R^3 — the trajectory representation.

TPU-native re-design of the basalt-derived spline core
(`/root/reference/src/spline/{so3,rd}_spline.h`, `spline_common.h`) and the
stateless "spline views" used by the analytic factors
(`/root/reference/src/estimator/factor/analytic_diff/{so3,rd}_spline_view.h`).

Design differences from the reference:

- Knots live in fixed-shape arrays `(K, 4)` (quat wxyz) / `(K, 3)`; all
  evaluators take a *local* window of `N=4` knots, so callers batch with a
  gather + `vmap` — no deques, no pointers.
- Time on device is knot-grid coordinates `(i0:int32, u:f32)` with
  `t = t0 + (i0 + u) * dt`; the int64-ns arithmetic of the reference
  (`so3_spline.h:119-135`) happens host-side in numpy. When a factor shifts
  time by `row * line_delay` (rolling shutter), it perturbs `u` and re-floors
  in-kernel — the same recompute-the-segment-index invariant as
  `image_feature_factor.h:84-101`.
- Loops over the 3 knot differences are unrolled Python loops: XLA sees a
  straight-line fused expression, vmap makes it a wide vector program.

The spline order is fixed at 4 (cubic), matching `spline_common.h:47`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import so3

N = 4  # spline order
DEG = N - 1


def _binom(n, k):
    from math import comb

    return comb(n, k)


def _blending_matrix(order: int, cumulative: bool) -> np.ndarray:
    """De Boor–Cox uniform B-spline blending matrix (order x order), f64.

    Same standard construction as `spline_common.h:77-115` (published in
    arXiv:1911.08860); coefficients for order 4:
      M = 1/6 * [[1,4,1,0],[-3,0,3,0],[3,-6,3,0],[-1,3,-3,1]]^T (column form).
    """
    m = np.zeros((order, order), dtype=np.float64)
    for i in range(order):
        for j in range(order):
            s = sum(
                (-1.0) ** (k - j) * _binom(order, k - j) * (order - k - 1.0) ** (order - 1.0 - i)
                for k in range(j, order)
            )
            m[j, i] = _binom(order - 1, order - 1 - i) * s
    if cumulative:
        for i in range(order):
            for j in range(i + 1, order):
                m[i] += m[j]
    from math import factorial

    return m / factorial(order - 1)


_M_CUM = _blending_matrix(N, cumulative=True)  # SO(3) cumulative blending
_M_STD = _blending_matrix(N, cumulative=False)  # R^3 blending

# base_coefficients[d, j] = coefficient of u^{j-d} in d-th derivative of u^j
_BASE = np.zeros((N, N), dtype=np.float64)
_BASE[0] = 1.0
for _d in range(1, N):
    for _j in range(_d, N):
        _BASE[_d, _j] = (_j - _d + 1) * _BASE[_d - 1, _j]


def _u_powers(u, deriv: int):
    """Row vector p with p[j] = d^deriv/du^deriv u^j  (length N). u: (...)."""
    dtype = u.dtype
    cols = []
    for j in range(N):
        if j < deriv:
            cols.append(jnp.zeros_like(u))
        else:
            cols.append(jnp.asarray(_BASE[deriv, j], dtype=dtype) * u ** (j - deriv))
    return jnp.stack(cols, axis=-1)


def blend_coeffs(u, deriv: int, cumulative: bool):
    """Blending coefficients lambda(u) (..., N) — WITHOUT the 1/dt^deriv factor."""
    M = _M_CUM if cumulative else _M_STD
    Mj = jnp.asarray(M, dtype=u.dtype)
    return _u_powers(u, deriv) @ Mj.T


# ---------------------------------------------------------------------------
# R^3 spline (local, 4 knots)
# ---------------------------------------------------------------------------


def rd_eval(p4, u, inv_dt, deriv: int = 0):
    """Evaluate R^d spline (value/vel/accel) from 4 local knots.

    p4: (..., 4, D), u: (...,) in [0,1), inv_dt: scalar 1/dt_seconds.
    ≙ `rd_spline_view.h:64-94`. Jacobian w.r.t. knots is just the blending
    coefficients (linear), so autodiff is exact and cheap.
    """
    lam = blend_coeffs(u, deriv, cumulative=False) * (inv_dt**deriv)
    return jnp.einsum("...k,...kd->...d", lam, p4)


# ---------------------------------------------------------------------------
# SO(3) cumulative spline (local, 4 knots)
# ---------------------------------------------------------------------------


def so3_deltas(q4):
    """d_i = log(q_i^{-1} q_{i+1}), i = 0..2. q4: (..., 4, 4) -> (..., 3, 3vec)."""
    q0, q1 = q4[..., :-1, :], q4[..., 1:, :]
    return so3.quat_log(so3.quat_mul(so3.quat_conj(q0), q1))


def so3_eval(q4, u):
    """R(t) as quaternion from 4 local knots: q0 * prod_i exp(lam_{i+1} d_i).

    ≙ `so3_spline.h:240-289` (value only; Jacobians via autodiff or the
    analytic kernels in ops/reproj_factor.py).
    """
    lam = blend_coeffs(u, 0, cumulative=True)
    d = so3_deltas(q4)
    q = q4[..., 0, :]
    for i in range(DEG):
        q = so3.quat_mul(q, so3.quat_exp(lam[..., i + 1 : i + 2] * d[..., i, :]))
    return so3.quat_normalize(q)


def so3_vel_body(q4, u, inv_dt):
    """Body-frame angular velocity omega(t) (..., 3).

    Recursion ≙ `so3_spline.h:291-320`:
      w <- exp(-lam_{i+1} d_i) * w + dlam_{i+1} d_i
    """
    lam = blend_coeffs(u, 0, cumulative=True)
    dlam = blend_coeffs(u, 1, cumulative=True) * inv_dt
    d = so3_deltas(q4)
    w = jnp.zeros_like(q4[..., 0, 1:])
    for i in range(DEG):
        kd = lam[..., i + 1 : i + 2] * d[..., i, :]
        w = so3.quat_rotate(so3.quat_exp(-kd), w) + dlam[..., i + 1 : i + 2] * d[..., i, :]
    return w


def so3_accel_body(q4, u, inv_dt):
    """Body-frame angular acceleration (and velocity) ≙ `so3_spline.h:322-367`."""
    lam = blend_coeffs(u, 0, cumulative=True)
    dlam = blend_coeffs(u, 1, cumulative=True) * inv_dt
    ddlam = blend_coeffs(u, 2, cumulative=True) * (inv_dt**2)
    d = so3_deltas(q4)
    w = jnp.zeros_like(q4[..., 0, 1:])
    a = jnp.zeros_like(w)
    for i in range(DEG):
        kd = lam[..., i + 1 : i + 2] * d[..., i, :]
        rot = so3.quat_exp(-kd)
        w = so3.quat_rotate(rot, w)
        v_cur = dlam[..., i + 1 : i + 2] * d[..., i, :]
        w = w + v_cur
        a = so3.quat_rotate(rot, a)
        a = a + ddlam[..., i + 1 : i + 2] * d[..., i, :] + jnp.cross(w, v_cur)
    return a, w


def se3_eval(q4, p4, u, inv_dt):
    """Pose (quat, pos) at u. Convenience for pose queries."""
    return so3_eval(q4, u), rd_eval(p4, u, inv_dt, 0)


# ---------------------------------------------------------------------------
# Array-level gather helpers
# ---------------------------------------------------------------------------


def gather_local(knots, i0):
    """Gather N=4 consecutive knots starting at i0.

    knots: (K, D); i0: (...,) int32 -> (..., 4, D).
    """
    idx = i0[..., None] + jnp.arange(N, dtype=i0.dtype)
    # clip, don't fill-with-NaN: padded/invalid factor slots gather garbage-but-
    # finite knots and are masked out downstream, never poisoning reductions.
    return jnp.take(knots, idx, axis=0, mode="clip")


def refloor(i0, u):
    """Re-normalize grid coordinates so u in [0,1): used after the rolling
    shutter time shift u += row*ld/dt pushes u past the segment boundary
    (≙ the in-factor `ComputeSplineIndex` recompute, `image_feature_factor.h:84-101`).
    """
    shift = jnp.floor(u)
    return i0 + shift.astype(i0.dtype), u - shift
