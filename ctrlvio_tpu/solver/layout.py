"""Window problem layout: parameter pytree, packed factor arrays, tangent map.

The sliding-window NLLS state of the reference — spline knots in a deque,
biases in a time-keyed map, Ceres parameter-block pointers
(`trajectory_manager.h:96-110`) — becomes one fixed-shape pytree plus a
fixed *local-coordinate layout*:

    [ 0        , 3*KW      )   SO(3) knot tangents (right perturbation)
    [ 3*KW     , 6*KW      )   position knots
    [ 6*KW     , 6*KW+3*NB )   gyro biases (NB = WINDOW_SIZE+1 keyframes)
    [ ...      , 6*KW+6*NB )   accel biases
    [ C-1      , C         )   line delay
    C = 6*KW + 6*NB + 1

Landmark inverse depths live outside this layout (Schur-eliminated).
The marginalization prior's Jacobian columns are expressed directly in this
layout, so a window slide is a column roll instead of the reference's
pointer-identity bookkeeping (`marginalization_factor.cpp:267-311`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ctrlvio_tpu.ops import so3


class WindowConfig(NamedTuple):
    """Static configuration (shapes / constants baked into the jit cache)."""

    KW: int = 40          # window knot capacity
    NB: int = 11          # keyframes in window (WINDOW_SIZE+1, ≙ parameters.h:8)
    LM: int = 256         # landmark slots; covers max_cnt<=~85 at full churn.
    #                       Overflow fails loudly (packing warns, extra
    #                       landmarks dropped) — size with
    #                       packing.auto_landmark_slots(max_cnt) (~3x cap;
    #                       the reference reserves NUM_OF_F=2000 for
    #                       max_cnt=150, parameters.h:10)
    OBS: int = 2048       # image pair-factor slots
    MIMU: int = 512       # IMU factor slots
    dt: float = 0.05      # knot spacing seconds (≙ config knot_distance)

    @property
    def C(self) -> int:
        return 6 * self.KW + 6 * self.NB + 1

    @property
    def n_rows(self) -> int:
        # image + imu + bias-pair + prior rows
        return 2 * self.OBS + 6 * self.MIMU + 6 * (self.NB - 1) + self.C

    def col_so3(self, k):
        return 3 * k

    def col_pos(self, k):
        return 3 * self.KW + 3 * k

    def col_bg(self, b):
        return 6 * self.KW + 3 * b

    def col_ba(self, b):
        return 6 * self.KW + 3 * self.NB + 3 * b

    @property
    def col_ld(self):
        return self.C - 1


class WindowParams(NamedTuple):
    """Optimization variables (the device-side window state)."""

    knots_q: jnp.ndarray  # (KW, 4) wxyz, IMU-to-world
    knots_p: jnp.ndarray  # (KW, 3)
    bg: jnp.ndarray       # (NB, 3)
    ba: jnp.ndarray       # (NB, 3)
    dinv: jnp.ndarray     # (LM,) inverse depths
    ld: jnp.ndarray       # () line delay, seconds/row


class ImageFactors(NamedTuple):
    """Packed rolling-shutter reprojection pair factors (one per (landmark,
    observation-j) with i = first observation, ≙ the loop in
    `trajectory_manager.cpp:360-385`)."""

    i0_i: jnp.ndarray    # (OBS,) int32 base segment = floor(t_i/dt), window-relative
    f_i: jnp.ndarray     # (OBS,) fractional part of t_i/dt
    row_i: jnp.ndarray   # (OBS,)
    pt_i: jnp.ndarray    # (OBS, 3) normalized, z=1
    i0_j: jnp.ndarray
    f_j: jnp.ndarray
    row_j: jnp.ndarray
    pt_j: jnp.ndarray
    lm_idx: jnp.ndarray  # (OBS,) int32 landmark slot
    valid: jnp.ndarray   # (OBS,) bool
    marg_drop: jnp.ndarray  # (OBS,) bool — factor enters marginalization with
                            # its inverse depth dropped (start_frame==0 case)


class ImuFactors(NamedTuple):
    i0: jnp.ndarray      # (MIMU,) int32 window-relative segment
    u: jnp.ndarray       # (MIMU,)
    gyro: jnp.ndarray    # (MIMU, 3)
    accel: jnp.ndarray   # (MIMU, 3)
    bias_idx: jnp.ndarray  # (MIMU,) int32 keyframe interval
    valid: jnp.ndarray
    marg_drop: jnp.ndarray  # t < ts[1] factors enter marginalization


class BiasFactors(NamedTuple):
    sqrt_info: jnp.ndarray  # (NB-1, 6) per-pair diag sqrt info (already /sqrt(dt))
    valid: jnp.ndarray      # (NB-1,)


class PriorFactor(NamedTuple):
    """Linearized marginalization prior r = r0 + J (x ⊟ x0) over the window
    layout (≙ MarginalizationFactor::Evaluate, `marginalization_factor.cpp:326-373`)."""

    J: jnp.ndarray        # (C, C) rows padded with zeros beyond rank
    r0: jnp.ndarray       # (C,)
    knots_q0: jnp.ndarray  # (KW, 4) linearization point
    knots_p0: jnp.ndarray
    bg0: jnp.ndarray
    ba0: jnp.ndarray
    ld0: jnp.ndarray


class SolveOptions(NamedTuple):
    """≙ TrajectoryEstimatorOptions + per-call solve settings."""

    max_iters: int = 15
    lock_bias: bool = False      # ≙ lock_ab/lock_wb
    fix_ld: bool = False
    ld_lower: float = 0.0
    ld_upper: float = 3.5e-5
    cauchy_c: float = 2.0        # Cauchy loss scale for image factors
    lm_lambda_init: float = 1e-4
    lm_lambda_up: float = 4.0
    lm_lambda_down: float = 0.5
    # early termination: stop once an accepted step improves the cost by
    # less than tol (relative). 0 = always run max_iters (≙ Ceres'
    # function_tolerance, default 1e-6, `trajectory_estimator.cpp:379-383`)
    tol: float = 0.0
    # per-path Schur solver: "chol" (exact blocked Cholesky — sync / init /
    # predict paths) or "cg" (fixed-iteration block-Jacobi PCG — an option
    # for the streaming megastep, where steps are incremental and the LM
    # accept loop absorbs inexactness). Static (opts is a static jit arg).
    solver: str = "chol"
    cg_iters: int = 48


def empty_params(cfg: WindowConfig, dtype=jnp.float32) -> WindowParams:
    q = jnp.zeros((cfg.KW, 4), dtype=dtype).at[:, 0].set(1.0)
    return WindowParams(
        knots_q=q,
        knots_p=jnp.zeros((cfg.KW, 3), dtype=dtype),
        bg=jnp.zeros((cfg.NB, 3), dtype=dtype),
        ba=jnp.zeros((cfg.NB, 3), dtype=dtype),
        dinv=jnp.full((cfg.LM,), 0.2, dtype=dtype),
        ld=jnp.zeros((), dtype=dtype),
    )


def empty_prior(cfg: WindowConfig, dtype=jnp.float32) -> PriorFactor:
    p = empty_params(cfg, dtype)
    return PriorFactor(
        J=jnp.zeros((cfg.C, cfg.C), dtype=dtype),
        r0=jnp.zeros((cfg.C,), dtype=dtype),
        knots_q0=p.knots_q,
        knots_p0=p.knots_p,
        bg0=p.bg,
        ba0=p.ba,
        ld0=p.ld,
    )


def retract(params: WindowParams, delta: jnp.ndarray, cfg: WindowConfig,
            opts: SolveOptions) -> WindowParams:
    """Apply a local step delta (C,) to the camera-system parameters.

    SO(3) knots update by right perturbation q * exp(phi); ld is projected
    into its box (≙ `trajectory_estimator.cpp:316-318`).
    """
    KW, NB = cfg.KW, cfg.NB
    d_so3 = delta[: 3 * KW].reshape(KW, 3)
    d_pos = delta[3 * KW : 6 * KW].reshape(KW, 3)
    d_bg = delta[6 * KW : 6 * KW + 3 * NB].reshape(NB, 3)
    d_ba = delta[6 * KW + 3 * NB : 6 * KW + 6 * NB].reshape(NB, 3)
    d_ld = delta[cfg.col_ld]
    ld_new = jnp.clip(params.ld + d_ld, opts.ld_lower, opts.ld_upper)
    return params._replace(
        knots_q=so3.boxplus(params.knots_q, d_so3),
        knots_p=params.knots_p + d_pos,
        bg=params.bg + d_bg,
        ba=params.ba + d_ba,
        ld=jnp.where(jnp.asarray(opts.fix_ld), params.ld, ld_new),
    )


def boxminus_full(params: WindowParams, q0, p0, bg0, ba0, ld0,
                  cfg: WindowConfig) -> jnp.ndarray:
    """x ⊟ x0 in the window layout (C,) — used by the prior factor."""
    d_so3 = so3.boxminus(params.knots_q, q0).reshape(-1)
    d_pos = (params.knots_p - p0).reshape(-1)
    d_bg = (params.bg - bg0).reshape(-1)
    d_ba = (params.ba - ba0).reshape(-1)
    d_ld = (params.ld - ld0)[None]
    return jnp.concatenate([d_so3, d_pos, d_bg, d_ba, d_ld])


def column_mask(cfg: WindowConfig, opts: SolveOptions, fixed_knots) -> jnp.ndarray:
    """(C,) 0/1 mask: 0 for frozen coordinates (fixed knots, locked biases,
    fixed line delay). ≙ SetParameterBlockConstant logic in
    `trajectory_estimator.cpp:134-138,236-245,311-318`."""
    KW, NB = cfg.KW, cfg.NB
    knot_m = jnp.repeat(1.0 - fixed_knots.astype(jnp.float32), 3)
    bias_m = jnp.full((6 * NB,), 0.0 if opts.lock_bias else 1.0)
    ld_m = jnp.asarray([0.0 if opts.fix_ld else 1.0])
    return jnp.concatenate([knot_m, knot_m, bias_m, ld_m])
