"""4-DoF gauge restoration after each sliding-window solve.

VIO leaves yaw + global translation unobservable; the reference restores the
pre-solve yaw and position of the window's first control point by rigidly
transforming all optimized knots (`trajectory_manager.cpp:485-516`,
`double2vector`). Without this, the whole trajectory drifts in the gauge
directions between solves and the marginalization prior becomes inconsistent.
"""

from __future__ import annotations

import jax.numpy as jnp

from ctrlvio_tpu.ops import so3


def r2ypr(R):
    """Rotation matrix -> (yaw, pitch, roll), ≙ Utility::R2ypr
    (`visual_odometry/utility.h`)."""
    n = R[..., :, 0]
    o = R[..., :, 1]
    a = R[..., :, 2]
    y = jnp.arctan2(n[..., 1], n[..., 0])
    p = jnp.arctan2(-n[..., 2], n[..., 0] * jnp.cos(y) + n[..., 1] * jnp.sin(y))
    r = jnp.arctan2(
        a[..., 0] * jnp.sin(y) - a[..., 1] * jnp.cos(y),
        -o[..., 0] * jnp.sin(y) + o[..., 1] * jnp.cos(y),
    )
    return jnp.stack([y, p, r], axis=-1)


def yaw_quat(yaw):
    half = 0.5 * yaw
    z = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), z, z, jnp.sin(half)], axis=-1)


def restore_gauge(knots_q, knots_p, q_ref, p_ref, anchor_idx, start_idx):
    """Rigidly transform knots[i >= start_idx] so that knot[anchor_idx]
    recovers the yaw and position it had before the solve ((q_ref, p_ref)).

    Near the pitch singularity (|pitch| ~ 90 deg) falls back to the full
    rotation difference, exactly like the reference (:501-505).
    """
    q00 = knots_q[anchor_idx]
    t00 = knots_p[anchor_idx]
    R0 = so3.quat_to_matrix(q_ref)
    R00 = so3.quat_to_matrix(q00)
    ypr0 = r2ypr(R0)
    ypr00 = r2ypr(R00)
    y_diff = ypr0[0] - ypr00[0]

    q_yaw = yaw_quat(y_diff)
    singular = jnp.logical_or(
        jnp.abs(jnp.abs(ypr0[1]) - jnp.pi / 2) < jnp.deg2rad(1.0),
        jnp.abs(jnp.abs(ypr00[1]) - jnp.pi / 2) < jnp.deg2rad(1.0),
    )
    q_full = so3.quat_mul(q_ref, so3.quat_conj(q00))
    q_diff = jnp.where(singular, q_full, q_yaw)
    t_diff = p_ref - so3.quat_rotate(q_diff, t00)

    idx = jnp.arange(knots_q.shape[0])
    sel = (idx >= start_idx)[:, None]
    q_new = so3.quat_normalize(so3.quat_mul(q_diff[None, :], knots_q))
    p_new = so3.quat_rotate(q_diff[None, :], knots_p) + t_diff[None, :]
    return (
        jnp.where(sel, q_new, knots_q),
        jnp.where(sel, p_new, knots_p),
    )
