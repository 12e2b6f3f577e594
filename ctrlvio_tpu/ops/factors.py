"""Residual kernels for the continuous-time VIO sliding-window problem.

TPU-native re-design of the reference's analytic Ceres factors:

- IMU factor (6-dim: spline gyro/accel vs measurement minus bias)
  ≙ `/root/reference/src/estimator/factor/analytic_diff/trajectory_value_factor.h:107-254`
  and the fused spline evaluation `split_spline_view.h:67-214`.
- Rolling-shutter reprojection factor with per-row line-delay time shift
  (2-dim), including the d/d(line_delay) dependence through the evaluation
  time `t + row * ld`
  ≙ `image_feature_factor.h:32-285`.
- Bias random-walk factor (6-dim)
  ≙ `trajectory_value_factor.h:36-105`.

Design: each factor is a *pure function* of explicitly gathered local spline
knots (4 per touched segment window) and small parameters. Jacobians come
from `jax.jacfwd` over right-tangent perturbations — at trace time this
produces the same block-sparse analytic structure as the reference's
hand-derived 3x3 products, but fused by XLA and trivially `vmap`-batched
over thousands of factors. The factor's time argument is knot-grid
coordinates `(i0, u)`; the line-delay time shift enters as
`u(ld) = f + row * ld / dt - shift` with the integer segment `shift` frozen
at the linearization point, matching the reference's treatment (the segment
index has zero derivative; the continuous dependence flows through the
body angular velocity / world translational velocity terms that
`image_feature_factor.h:250-264` writes out by hand).

All functions are single-factor; batch with `jax.vmap`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import so3, spline


# ---------------------------------------------------------------------------
# IMU factor
# ---------------------------------------------------------------------------


def imu_residual(q4, p4, u, inv_dt, bg, ba, gyro_meas, accel_meas, gravity, info6):
    """6-dim weighted IMU residual at one sample.

    r[:3] = w_body(t) - (gyro_meas - bg)
    r[3:] = R(t)^T (a_world(t) + g) - (accel_meas - ba)
    weighted elementwise by info6 (1/sigma vec, ≙ OptWeight.imu_info_vec).
    """
    w = spline.so3_vel_body(q4, u, inv_dt)
    q = spline.so3_eval(q4, u)
    a_world = spline.rd_eval(p4, u, inv_dt, 2)
    a_body = so3.quat_rotate_inv(q, a_world + gravity)
    r = jnp.concatenate([w - (gyro_meas - bg), a_body - (accel_meas - ba)])
    return info6 * r


def imu_residual_tangent(xi_r, xi_p, d_bg, d_ba, q4, p4, u, inv_dt, bg, ba,
                         gyro_meas, accel_meas, gravity, info6):
    """Residual under right-tangent perturbation; jacfwd at zeros gives the
    block Jacobians w.r.t. (4 SO3 knots, 4 pos knots, bg, ba)."""
    return imu_residual(
        so3.boxplus(q4, xi_r), p4 + xi_p, u, inv_dt, bg + d_bg, ba + d_ba,
        gyro_meas, accel_meas, gravity, info6,
    )


# ---------------------------------------------------------------------------
# Rolling-shutter reprojection factor with line delay
# ---------------------------------------------------------------------------


class CamExtrinsics(NamedTuple):
    """Camera-to-IMU extrinsics (static during VIO, ≙ ImageFeatureDelayFactor
    statics S_CtoI / p_CinI, `image_feature_factor.h:273-274`)."""

    q_CtoI: jnp.ndarray  # (4,)
    p_CinI: jnp.ndarray  # (3,)


def reproj_residual(q4i, p4i, ui, q4j, p4j, uj, inv_dt, pt_i, pt_j, dinv, ext,
                    sqrt_info):
    """2-dim weighted rolling-shutter reprojection residual.

    Feature with normalized coords pt_i (3, z=1) seen at spline time ui in
    window i with inverse depth dinv is transferred through the world frame
    into frame j and compared against pt_j. Math ≙
    `image_feature_factor.h:103-163`:

      x_ci = pt_i / dinv
      p_Ii = R_CtoI x_ci + p_CinI          (feature in IMU frame i)
      p_G  = R_IitoG p_Ii + p_IiinG        (world)
      x_j  = R_ItoC ( R_GtoIj (p_G - p_IjinG) - p_CinI )
      r    = x_j.xy / x_j.z - pt_j.xy
    """
    q_i = spline.so3_eval(q4i, ui)
    p_i = spline.rd_eval(p4i, ui, inv_dt, 0)
    q_j = spline.so3_eval(q4j, uj)
    p_j = spline.rd_eval(p4j, uj, inv_dt, 0)

    # guard: |dinv| is floored so a landmark crossing zero inverse depth
    # yields a huge-but-FINITE point (Cauchy squashes it). Without this,
    # pt_i/0 = inf and the robust weight's 0*inf = NaN poisons the whole
    # cost, deadlocking the LM accept gate (observed in the lagged stream).
    dinv = jnp.where(jnp.abs(dinv) < 1e-5,
                     jnp.where(dinv < 0, -1e-5, 1e-5), dinv)
    x_ci = pt_i / dinv
    p_Ii = so3.quat_rotate(ext.q_CtoI, x_ci) + ext.p_CinI
    p_G = so3.quat_rotate(q_i, p_Ii) + p_i
    p_Ij = so3.quat_rotate_inv(q_j, p_G - p_j)
    x_j = so3.quat_rotate_inv(ext.q_CtoI, p_Ij - ext.p_CinI)

    z = x_j[2]
    # guard: behind-camera points give huge-but-finite residuals; robust loss
    # + masking handle them (the reference relies on Ceres returning inf-free
    # values since depths stay positive in practice).
    z_safe = jnp.where(jnp.abs(z) < 1e-6, jnp.sign(z) * 1e-6 + (z == 0) * 1e-6, z)
    r = x_j[:2] / z_safe - pt_j[:2]
    return sqrt_info * r


def reproj_residual_ld(q4i, p4i, q4j, p4j, dinv, ld, fi, fj, shift_i, shift_j,
                       row_i, row_j, inv_dt, pt_i, pt_j, ext, sqrt_info):
    """Reprojection residual as an explicit function of the line delay.

    u_k(ld) = f_k + row_k * ld / dt - shift_k, with shift_k the integer
    segment correction frozen at the linearization point. Autodiff through
    this path yields exactly the reference's analytic d r / d ld
    (`image_feature_factor.h:250-264`) — the velocity terms appear via the
    chain rule through the spline basis polynomials.
    """
    ui = fi + row_i * ld * inv_dt - shift_i
    uj = fj + row_j * ld * inv_dt - shift_j
    return reproj_residual(q4i, p4i, ui, q4j, p4j, uj, inv_dt, pt_i, pt_j,
                           dinv, ext, sqrt_info)


def reproj_residual_tangent(xi_ri, xi_pi, xi_rj, xi_pj, d_dinv, d_ld,
                            q4i, p4i, q4j, p4j, dinv, ld, fi, fj,
                            shift_i, shift_j, row_i, row_j, inv_dt,
                            pt_i, pt_j, ext, sqrt_info):
    """Tangent-perturbed residual; jacfwd at zeros -> blocks w.r.t.
    (SO3 knots i, pos knots i, SO3 knots j, pos knots j, dinv, ld)."""
    return reproj_residual_ld(
        so3.boxplus(q4i, xi_ri), p4i + xi_pi,
        so3.boxplus(q4j, xi_rj), p4j + xi_pj,
        dinv + d_dinv, ld + d_ld,
        fi, fj, shift_i, shift_j, row_i, row_j, inv_dt, pt_i, pt_j, ext,
        sqrt_info,
    )


# ---------------------------------------------------------------------------
# Bias random-walk factor
# ---------------------------------------------------------------------------


def bias_residual(bg_i, bg_j, ba_i, ba_j, sqrt_info6):
    """6-dim random-walk residual between consecutive keyframe biases,
    ≙ BiasFactor (`trajectory_value_factor.h:36-105`); sqrt_info6 already
    includes the 1/sqrt(dt) scaling done by the caller."""
    r = jnp.concatenate([bg_j - bg_i, ba_j - ba_i])
    return sqrt_info6 * r
