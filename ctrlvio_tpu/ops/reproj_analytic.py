"""Analytic Jacobians for the rolling-shutter reprojection factor.

The vectorized counterpart of the reference's hand-derived factor math
(`/root/reference/src/estimator/factor/analytic_diff/image_feature_factor.h:182-264`
and the cumulative-spline per-knot Jacobians `so3_spline_view.h:136-198`),
re-derived for this codebase's conventions (right-tangent perturbations
q ⊞ φ = q exp(φ), wxyz quaternions) and verified against the jacfwd oracle
in tests. Replaces a 26-dimensional forward-mode sweep per factor with
closed-form 2x3 blocks — the dominant cost of each LM iteration.

All functions are single-factor; batch with vmap.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import so3, spline


def so3_value_knot_jac(q4, u):
    """R(u) (quat) and per-knot right-tangent Jacobians J (4, 3, 3):
    R(u) ⊞ (J[k] @ delta_k) ~= R(u) evaluated with knot k perturbed by
    q_k exp(delta_k)."""
    lam = spline.blend_coeffs(u, 0, cumulative=True)
    d = spline.so3_deltas(q4)  # (3, 3)

    A = [so3.quat_exp(lam[..., i + 1, None] * d[..., i, :]) for i in range(3)]
    # suffix products P_m = R(A_{m+1} ... A_3), m = 0..3
    P3 = jnp.eye(3, dtype=q4.dtype)
    R3 = so3.quat_to_matrix(A[2])
    P2 = R3
    P1 = so3.quat_to_matrix(A[1]) @ R3
    P0 = so3.quat_to_matrix(A[0]) @ P1

    q = q4[..., 0, :]
    for Ai in A:
        q = so3.quat_mul(q, Ai)
    q = so3.quat_normalize(q)

    Jr = [so3.right_jacobian(lam[..., i + 1, None] * d[..., i, :]) for i in range(3)]
    Jr_inv_d = [so3.right_jacobian_inv(d[..., i, :]) for i in range(3)]
    Jl_inv_d = [so3.left_jacobian_inv(d[..., i, :]) for i in range(3)]

    P = [P0, P1, P2, P3]
    Jk = []
    for k in range(4):
        Jv = jnp.zeros((3, 3), dtype=q4.dtype)
        if k == 0:
            Jv = P[0].T
        if k >= 1:
            # own term via d_{k-1}
            i = k - 1
            Jv = Jv + lam[..., i + 1, None, None] * P[i + 1].T @ Jr[i] @ Jr_inv_d[i]
        if k <= 2:
            # next-delta term via d_k
            i = k
            Jv = Jv - lam[..., i + 1, None, None] * P[i + 1].T @ Jr[i] @ Jl_inv_d[i]
        Jk.append(Jv)
    return q, jnp.stack(Jk, axis=-3)


def reproj_analytic(q4i, p4i, q4j, p4j, dinv, ld, fi, fj, shift_i, shift_j,
                    row_i, row_j, inv_dt, pt_i, pt_j, ext, sqrt_info):
    """Residual (2,) + analytic Jacobian blocks.

    Returns (r, J_ri (2,4,3), J_pi (2,4,3), J_rj (2,4,3), J_pj (2,4,3),
    J_dinv (2,), J_ld (2,)). Matches the jacfwd of
    `factors.reproj_residual_tangent` to machine precision.
    """
    dtype = p4i.dtype
    ui = fi + row_i * ld * inv_dt - shift_i
    uj = fj + row_j * ld * inv_dt - shift_j

    q_i, Jk_i = so3_value_knot_jac(q4i, ui)
    q_j, Jk_j = so3_value_knot_jac(q4j, uj)
    p_i = spline.rd_eval(p4i, ui, inv_dt, 0)
    p_j = spline.rd_eval(p4j, uj, inv_dt, 0)
    lam_pi = spline.blend_coeffs(ui, 0, cumulative=False)  # (4,)
    lam_pj = spline.blend_coeffs(uj, 0, cumulative=False)

    R_CtoI = so3.quat_to_matrix(ext.q_CtoI)
    R_i = so3.quat_to_matrix(q_i)
    R_j = so3.quat_to_matrix(q_j)

    # guard: |dinv| is floored so a landmark crossing zero inverse depth
    # yields a huge-but-FINITE point (Cauchy squashes it). Without this,
    # pt_i/0 = inf and the robust weight's 0*inf = NaN poisons the whole
    # cost, deadlocking the LM accept gate (observed in the lagged stream).
    dinv = jnp.where(jnp.abs(dinv) < 1e-5,
                     jnp.where(dinv < 0, -1e-5, 1e-5), dinv)
    x_ci = pt_i / dinv
    p_Ii = R_CtoI @ x_ci + ext.p_CinI
    p_G = R_i @ p_Ii + p_i
    y = p_G - p_j
    Rjt_y = R_j.T @ y
    x_j = R_CtoI.T @ (Rjt_y - ext.p_CinI)

    z = x_j[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, jnp.sign(z) * 1e-6 + (z == 0) * 1e-6, z)
    r = sqrt_info * (x_j[:2] / z_safe - pt_j[:2])

    # d r / d x_j, premultiplied by sqrt_info
    J_v = sqrt_info * jnp.stack([
        jnp.stack([1.0 / z_safe, jnp.zeros_like(z), -x_j[0] / z_safe**2]),
        jnp.stack([jnp.zeros_like(z), 1.0 / z_safe, -x_j[1] / z_safe**2]),
    ])  # (2, 3)

    M = R_CtoI.T @ R_j.T  # world -> camera j rotation

    # rotation knots, frame i: psi_i -> x_j  is  -M R_i hat(p_Ii)
    A_i = -(M @ R_i) @ so3.hat(p_Ii)
    J_ri = jnp.einsum("ab,bc,kcd->akd", J_v, A_i, Jk_i)  # (2,4,3)
    # rotation knots, frame j: psi_j -> x_j  is  R_CtoI^T hat(R_j^T y)
    A_j = R_CtoI.T @ so3.hat(Rjt_y)
    J_rj = jnp.einsum("ab,bc,kcd->akd", J_v, A_j, Jk_j)
    # position knots
    JvM = J_v @ M  # (2,3)
    J_pi = JvM[:, None, :] * lam_pi[None, :, None]
    J_pj = -JvM[:, None, :] * lam_pj[None, :, None]
    # inverse depth
    J_dinv = J_v @ (-(M @ R_i @ R_CtoI) @ x_ci / dinv)
    # line delay: time derivative at both frames
    w_i = spline.so3_vel_body(q4i, ui, inv_dt)
    w_j = spline.so3_vel_body(q4j, uj, inv_dt)
    v_i = spline.rd_eval(p4i, ui, inv_dt, 1)
    v_j = spline.rd_eval(p4j, uj, inv_dt, 1)
    dxdti = M @ (R_i @ (so3.hat(w_i) @ p_Ii) + v_i)
    dxdtj = -(R_CtoI.T @ (so3.hat(w_j) @ Rjt_y)) - M @ v_j
    J_ld = J_v @ (row_i * dxdti + row_j * dxdtj)

    return r, J_ri, J_pi, J_rj, J_pj, J_dinv, J_ld
