"""Device-resident streaming estimator core.

The whole per-frame update — merge uploads → LM solve → 4-DoF gauge →
square-root marginalization → window slide (knot roll, bias roll, landmark
depth handoff) — is ONE jitted device program (`megastep`) chained
frame-to-frame through a device-resident `DevState`, with **zero host
synchronization on the critical path**.

Why (measured on this TPU transport): any synchronous host↔device round
trip costs the ~35-45 ms tunnel RTT, while chained execs pipeline at
dispatch cost and the true device compute per frame is ~10 ms. The
reference's per-frame loop (`/root/reference/src/estimator/
odometry_manager.cpp:167-299` + `trajectory_manager.cpp:317-483`) is
re-cast as a stream: the host feeds one consolidated feed-forward upload
per frame (factor arrays, knot seeds, slide directives — everything packed
into a single flat buffer because each transferred leaf pays a full RTT)
and consumes solve summaries asynchronously LAG frames later to maintain
its numpy mirror (triangulation seeds, dead-reckon extension, export).

The marginalization runs on-device in the solver dtype using the QR
square-root form (`solver/marginalize.py::build_prior_sqrt`) — the f64
host build the synchronous path needs would put an RTT back on the
critical path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ctrlvio_tpu.ops import so3, spline
from ctrlvio_tpu.solver import gauge, lm, marginalize
from ctrlvio_tpu.utils.precision import f32_matmuls
from ctrlvio_tpu.solver.layout import (BiasFactors, ImageFactors, ImuFactors,
                                       PriorFactor, SolveOptions, WindowConfig,
                                       WindowParams)

INIT_DEPTH = 5.0  # ≙ parameters.cpp INIT_DEPTH (see features.py)


class DevState(NamedTuple):
    """Device-resident estimator state chained between megasteps."""

    params: WindowParams
    prior: PriorFactor


class StreamScalars(NamedTuple):
    """Per-frame slide directives (float-encoded in the upload blob)."""

    marg_old: jnp.ndarray   # bool: MARGIN_OLD (slide + marginalize)
    knot_shift: jnp.ndarray  # int32: window roll on MARGIN_OLD
    t0_i0: jnp.ndarray      # int32 grid coords of kf_t[0] (pre-slide) ...
    t0_f: jnp.ndarray
    t1_i0: jnp.ndarray      # ... and kf_t[1]: camera poses for depth handoff
    t1_f: jnp.ndarray
    old_hi: jnp.ndarray     # int32: window-relative knot count before extend
    new_hi: jnp.ndarray     # int32: ... and after (n_active)
    host_seeds: jnp.ndarray  # bool: take knot seeds from the upload (warmup
    #                          handoff) instead of the in-graph dead-reckon


# ---------------------------------------------------------------------------
# blob pack / unpack (one flat buffer per frame: each device_put leaf pays a
# full tunnel RTT, so everything rides in a single upload)
# ---------------------------------------------------------------------------


def pack_stream_blob(img: ImageFactors, imu: ImuFactors, bias: BiasFactors,
                     fixed, seed_q, seed_p, seed_mask, dinv_perm, dinv_seed,
                     drop_knots, marg_old: bool, knot_shift: int,
                     t0_grid, t1_grid, old_hi: int = 0, new_hi: int = 0,
                     host_seeds: bool = True, dtype=np.float32) -> np.ndarray:
    """Host-side: concatenate all per-frame inputs into one flat buffer.
    Integers are float-encoded (all values << 2^24, exact in f32)."""
    parts = []
    for t in (img, imu, bias):
        for f in t:
            parts.append(np.asarray(f, dtype).ravel())
    parts.append(np.asarray(fixed, dtype))
    parts.append(np.asarray(seed_q, dtype).ravel())
    parts.append(np.asarray(seed_p, dtype).ravel())
    parts.append(np.asarray(seed_mask, dtype))
    parts.append(np.asarray(dinv_perm, dtype))
    parts.append(np.asarray(dinv_seed, dtype))
    parts.append(np.asarray(drop_knots, dtype))
    parts.append(np.asarray(
        [1.0 if marg_old else 0.0, knot_shift,
         t0_grid[0], t0_grid[1], t1_grid[0], t1_grid[1],
         old_hi, new_hi, 1.0 if host_seeds else 0.0], dtype))
    return np.concatenate(parts)


def unpack_stream_blob(blob, cfg: WindowConfig, dtype):
    """In-graph inverse of pack_stream_blob."""
    OBS, M, NB, KW, LM = cfg.OBS, cfg.MIMU, cfg.NB, cfg.KW, cfg.LM
    o = [0]

    def take(shape, dt=None):
        n = int(np.prod(shape))
        x = jax.lax.dynamic_slice_in_dim(blob, o[0], n).reshape(shape)
        o[0] += n
        if dt is not None:
            x = x.astype(dt)
        return x

    img = ImageFactors(
        i0_i=take((OBS,), jnp.int32), f_i=take((OBS,)), row_i=take((OBS,)),
        pt_i=take((OBS, 3)), i0_j=take((OBS,), jnp.int32), f_j=take((OBS,)),
        row_j=take((OBS,)), pt_j=take((OBS, 3)),
        lm_idx=take((OBS,), jnp.int32), valid=take((OBS,), jnp.bool_),
        marg_drop=take((OBS,), jnp.bool_))
    imu = ImuFactors(
        i0=take((M,), jnp.int32), u=take((M,)), gyro=take((M, 3)),
        accel=take((M, 3)), bias_idx=take((M,), jnp.int32),
        valid=take((M,), jnp.bool_), marg_drop=take((M,), jnp.bool_))
    bias = BiasFactors(sqrt_info=take((NB - 1, 6)),
                       valid=take((NB - 1,), jnp.bool_))
    fixed = take((KW,), jnp.bool_)
    seed_q = take((KW, 4), dtype)
    seed_p = take((KW, 3), dtype)
    seed_mask = take((KW,), jnp.bool_)
    dinv_perm = take((LM,), jnp.int32)
    dinv_seed = take((LM,), dtype)
    drop_knots = take((KW,), jnp.bool_)
    s = take((9,))
    sc = StreamScalars(
        marg_old=s[0] > 0.5, knot_shift=s[1].astype(jnp.int32),
        t0_i0=s[2].astype(jnp.int32), t0_f=s[3],
        t1_i0=s[4].astype(jnp.int32), t1_f=s[5],
        old_hi=s[6].astype(jnp.int32), new_hi=s[7].astype(jnp.int32),
        host_seeds=s[8] > 0.5)
    return img, imu, bias, fixed, seed_q, seed_p, seed_mask, dinv_perm, \
        dinv_seed, drop_knots, sc


# ---------------------------------------------------------------------------
# in-graph slide pieces
# ---------------------------------------------------------------------------


def _roll_clamp(a, shift):
    """Roll rows forward by a traced shift, repeating the last row at the
    tail (finite placeholder; overwritten by host seeds at the next merge)."""
    n = a.shape[0]
    idx = jnp.clip(jnp.arange(n) + shift, 0, n - 1)
    return jnp.take(a, idx, axis=0)


def _camera_pose_at(p: WindowParams, i0, f, ext, cfg: WindowConfig):
    """Camera pose at grid time (i0, f) from the window spline
    (≙ `Trajectory::GetCameraPose`, global-shutter frame time)."""
    inv_dt = jnp.asarray(1.0 / cfg.dt, p.knots_p.dtype)
    i0c = jnp.clip(i0, 0, cfg.KW - 4)
    q4 = spline.gather_local(p.knots_q, i0c)
    p4 = spline.gather_local(p.knots_p, i0c)
    qi = spline.so3_eval(q4, f.astype(p.knots_p.dtype))
    pi = spline.rd_eval(p4, f.astype(p.knots_p.dtype), inv_dt, 0)
    qc = so3.quat_mul(qi, ext.q_CtoI)
    pc = pi + so3.quat_rotate(qi, ext.p_CinI)
    return qc, pc


def _depth_handoff(p: WindowParams, img: ImageFactors, sc: StreamScalars,
                   ext, cfg: WindowConfig):
    """Re-anchor inverse depths of landmarks whose anchor frame leaves the
    window (≙ removeBackShiftDepth, `feature_manager.cpp:341-381`).

    The affected landmark set and the anchor observation come straight from
    the uploaded factors: marg_drop marks exactly the start_frame==0,
    depth>0 observations, and their pt_i is the anchor bearing."""
    dtype = p.knots_p.dtype
    m = jnp.logical_and(img.valid, img.marg_drop).astype(dtype)  # (OBS,)
    oh = (jnp.arange(cfg.LM, dtype=jnp.int32)[None, :]
          == img.lm_idx[:, None]).astype(dtype) * m[:, None]     # (OBS, LM)
    cnt = jnp.sum(oh, axis=0)
    pt_old = (oh.T @ img.pt_i) / jnp.maximum(cnt, 1.0)[:, None]  # (LM, 3)

    qc0, pc0 = _camera_pose_at(p, sc.t0_i0, sc.t0_f, ext, cfg)
    qc1, pc1 = _camera_pose_at(p, sc.t1_i0, sc.t1_f, ext, cfg)

    dinv = p.dinv
    pos = dinv > 1e-6
    depth = 1.0 / jnp.where(pos, dinv, 1.0)
    X0 = pt_old * depth[:, None]
    w = so3.quat_rotate(qc0[None], X0) + pc0[None]
    X1 = so3.quat_rotate(so3.quat_conj(qc1)[None], w - pc1[None])
    d_new = jnp.where(X1[:, 2] > 0, X1[:, 2],
                      jnp.asarray(INIT_DEPTH, dtype))
    apply = jnp.logical_and(cnt > 0, pos)
    return jnp.where(apply, 1.0 / d_new, dinv)


def _extend_inertial(params: WindowParams, imu: ImuFactors,
                     sc: StreamScalars, gravity, cfg: WindowConfig):
    """In-graph dead-reckon seeds for knots appended this frame
    (≙ ExtendTrajectory + InitTrajectory, `trajectory_manager.cpp:108-120` +
    `odometry_manager.cpp:268`): integrate the uploaded IMU samples from the
    device spline's end state and place knot i at the pose of t=(i-1)·dt
    (the cubic B-spline offset). Seeding from the DEVICE state — not the
    host mirror — keeps the prediction path lag-free: host-side seeds chain
    through the lagged mirror and were measured to feed back into
    divergence."""
    dtype = params.knots_p.dtype
    dt = jnp.asarray(cfg.dt, dtype)
    inv_dt = 1.0 / dt
    KW = cfg.KW

    # Anchor WELL INSIDE the image-constrained region: the last ~3 knots
    # before old_hi are only weakly IMU-constrained (no samples beyond the
    # newest image time), so they are RE-seeded each frame from this solid
    # anchor — otherwise the tip knot's drift compounds frame-over-frame
    # (measured: metres within ~25 frames, then divergence once it gains
    # image factors). ≙ the reference re-running InitTrajectory over the
    # trajectory tail every frame.
    re_lo = jnp.maximum(sc.old_hi - 3, 4)
    i0q = jnp.clip(re_lo - 4, 0, KW - 4)
    q4 = spline.gather_local(params.knots_q, i0q)
    p4 = spline.gather_local(params.knots_p, i0q)
    zero = jnp.asarray(0.0, dtype)
    q0 = spline.so3_eval(q4, zero)
    p0 = spline.rd_eval(p4, zero, inv_dt, 0)
    v0 = spline.rd_eval(p4, zero, inv_dt, 1)
    bg = params.bg[cfg.NB - 1]
    ba = params.ba[cfg.NB - 1]

    t0 = i0q.astype(dtype) * dt
    t_hi = (sc.new_hi - 3).astype(dtype) * dt
    t_m = (imu.i0.astype(dtype) + imu.u) * dt           # (M,) window-rel
    in_rng = jnp.logical_and(imu.valid,
                             jnp.logical_and(t_m > t0, t_m <= t_hi + dt))

    # per-sample step sizes (samples are packed chronologically; the
    # in-range span is contiguous, so diffs against the previous sample —
    # clamped at t0 for the first in-range one — are the step sizes)
    t_prev = jnp.concatenate([t0[None], t_m[:-1]])
    dts = jnp.where(in_rng,
                    jnp.clip(t_m - jnp.maximum(t_prev, t0), 0.0, 0.05), 0.0)

    # orientation chain via log-depth prefix products (a 256-step
    # sequential scan costs ~4 ms on the TPU; this is ~8 fused steps)
    dq = so3.quat_exp((imu.gyro - bg[None, :]) * dts[:, None])  # (M, 4)
    chain = jax.lax.associative_scan(so3.quat_mul, dq, axis=0)
    qs = so3.quat_normalize(so3.quat_mul(q0[None, :], chain))
    q_prev = jnp.concatenate([q0[None, :], qs[:-1]], axis=0)

    a_w = so3.quat_rotate(q_prev, imu.accel - ba[None, :]) - gravity[None, :]
    dv = a_w * dts[:, None]
    vs = v0[None, :] + jnp.cumsum(dv, axis=0)
    v_prev = jnp.concatenate([v0[None, :], vs[:-1]], axis=0)
    dp = v_prev * dts[:, None] + 0.5 * a_w * dts[:, None] ** 2
    ps = p0[None, :] + jnp.cumsum(dp, axis=0)

    # knot i carries the pose at (i-1)*dt: last in-range sample <= query
    iota = jnp.arange(KW, dtype=jnp.int32)
    t_q = (iota - 1).astype(dtype) * dt                 # (KW,)
    m_iota = jnp.arange(cfg.MIMU, dtype=jnp.int32)
    hit = jnp.logical_and(in_rng[None, :],
                          t_m[None, :] <= t_q[:, None] + 1e-9)  # (KW, M)
    idx = jnp.max(jnp.where(hit, m_iota[None, :], -1), axis=1)
    found = idx >= 0
    idx = jnp.clip(idx, 0, cfg.MIMU - 1)
    seed_q = jnp.where(found[:, None], qs[idx], q0[None, :])
    seed_p = jnp.where(found[:, None], ps[idx], p0[None, :])
    return seed_q, seed_p


# ---------------------------------------------------------------------------
# the megastep
# ---------------------------------------------------------------------------


@f32_matmuls
def megastep(state: DevState, blob, ext, gravity, imu_info, sqrt_info_img,
             cfg: WindowConfig, opts: SolveOptions):
    """One frame, entirely on device. Returns (next state, flat summary).

    Order ≙ the reference per-frame pipeline: factor assembly + solve
    (`UpdateTrajectory`), gauge restore (`double2vector`), marginalization
    (`UpdateVIOPrior`), slide (`SlideWindow{Old,New}`)."""
    dtype = state.params.knots_p.dtype
    (img, imu, bias, fixed, seed_q, seed_p, seed_mask, dinv_perm, dinv_seed,
     drop_knots, sc) = unpack_stream_blob(blob, cfg, dtype)

    # ---- merge host uploads into the device window state ----------------
    params = state.params
    # new-knot seeds: in-graph IMU dead-reckon from the DEVICE spline end
    # (lag-free); host values only at the warmup handoff, where the mirror
    # is authoritative
    dr_q, dr_p = _extend_inertial(params, imu, sc, gravity, cfg)
    seed_q2 = jnp.where(sc.host_seeds, seed_q, dr_q)
    seed_p2 = jnp.where(sc.host_seeds, seed_p, dr_p)
    sm = seed_mask[:, None]
    params = params._replace(
        knots_q=jnp.where(sm, seed_q2, params.knots_q),
        knots_p=jnp.where(sm, seed_p2, params.knots_p),
        dinv=jnp.where(
            dinv_perm >= 0,
            params.dinv[jnp.clip(dinv_perm, 0, cfg.LM - 1)], dinv_seed),
    )

    # ---- solve + gauge ---------------------------------------------------
    q_ref = params.knots_q[0]
    p_ref = params.knots_p[0]
    p_out, stats = lm.solve_window(params, img, imu, bias, state.prior, fixed,
                                   ext, gravity, imu_info, sqrt_info_img,
                                   cfg, opts)
    q_new, p_new = gauge.restore_gauge(p_out.knots_q, p_out.knots_p,
                                       q_ref, p_ref, 0, 0)
    p_out = p_out._replace(knots_q=q_new, knots_p=p_new)

    # ---- marginalize + slide (branch: only MARGIN_OLD pays the QR) -------
    def slide_old(_):
        # the host's marg_drop flag gates on its LAGGED depth estimate; a
        # landmark whose device depth has since failed (dinv <= 0 or
        # near-zero) must not be absorbed into the prior — its garbage
        # linearization would poison every subsequent solve (≙ the
        # reference's estimated_depth > 0 gate, `trajectory_manager.cpp:
        # 211-213`, evaluated here against the CURRENT device state)
        img_m = img._replace(marg_drop=jnp.logical_and(
            img.marg_drop, p_out.dinv[img.lm_idx] > 1e-4))
        prior_new, ovf = marginalize.build_prior_sqrt(
            p_out, img_m, imu, bias, state.prior, drop_knots, ext, gravity,
            imu_info, sqrt_info_img, cfg, opts._replace(cauchy_c=1.0),
            knot_shift=sc.knot_shift, bias_shift=jnp.asarray(1, jnp.int32),
            return_overflow=True)
        dinv_h = _depth_handoff(p_out, img, sc, ext, cfg)
        one = jnp.asarray(1, jnp.int32)
        new_params = p_out._replace(
            knots_q=_roll_clamp(p_out.knots_q, sc.knot_shift),
            knots_p=_roll_clamp(p_out.knots_p, sc.knot_shift),
            bg=_roll_clamp(p_out.bg, one),
            ba=_roll_clamp(p_out.ba, one),
            dinv=dinv_h)
        return (DevState(params=new_params, prior=prior_new), dinv_h,
                ovf.astype(jnp.int32))

    def slide_second_new(_):
        nb = cfg.NB
        new_params = p_out._replace(
            bg=p_out.bg.at[nb - 2].set(p_out.bg[nb - 1]),
            ba=p_out.ba.at[nb - 2].set(p_out.ba[nb - 1]))
        return (DevState(params=new_params, prior=state.prior), p_out.dinv,
                jnp.zeros((3,), jnp.int32))

    state2, dinv_sum, marg_ovf = jax.lax.cond(
        sc.marg_old, slide_old, slide_second_new, None)

    # per-type residual RMS at the solution (≙ the reference's per-solve
    # ResidualSummary, `trajectory_estimator.cpp:69-95`): the streaming
    # path's regression signal, one extra residual pass per frame
    from ctrlvio_tpu.solver import assemble as _assemble

    rms4 = _assemble.residual_rms(p_out, img, imu, bias, state.prior, ext,
                                  gravity, imu_info, sqrt_info_img, cfg, opts)

    # summary: PRE-slide layout (this frame's window), post-handoff depths
    summary = jnp.concatenate([
        q_new.reshape(-1), p_new.reshape(-1),
        p_out.bg.reshape(-1), p_out.ba.reshape(-1),
        dinv_sum.astype(dtype),
        p_out.ld[None].astype(dtype),
        jnp.stack([stats.cost0, stats.cost,
                   stats.accepted.astype(dtype)]).astype(dtype),
        rms4.astype(dtype),
        marg_ovf.astype(dtype),  # >0: marg subset overflowed [obs, imu, lm]
    ])
    return state2, summary


def summary_size(cfg: WindowConfig) -> int:
    return 7 * cfg.KW + 6 * cfg.NB + cfg.LM + 11


def unpack_summary(host: np.ndarray, cfg: WindowConfig):
    """Host-side summary split. Returns dict of numpy views."""
    KW, NB, LM = cfg.KW, cfg.NB, cfg.LM
    o = 0

    def take(n, shape=None):
        nonlocal o
        x = host[o : o + n]
        o += n
        return x.reshape(shape) if shape else x

    return dict(
        knots_q=take(4 * KW, (KW, 4)), knots_p=take(3 * KW, (KW, 3)),
        bg=take(3 * NB, (NB, 3)), ba=take(3 * NB, (NB, 3)),
        dinv=take(LM), ld=float(take(1)[0]), cost0=float(take(1)[0]),
        cost=float(take(1)[0]), accepted=float(take(1)[0]),
        rms=take(4),  # per-type residual RMS [image, imu, bias, prior]
        marg_ovf=take(3))  # marg-cap overflow counts [obs, imu, lm]
