"""Texture-mapped world rendering + front-end robustness.

The reference's front end earns its refill/mask/RANSAC machinery on real
texture (`feature_tracker.cpp:112-169, 201-235`); these tests run the full
CLAHE -> KLT -> refill -> F-RANSAC stack on ray-cast imagery of a textured
box room with occluder quads — no corners are drawn at landmark
projections, the tracker must find and keep its own.

Covers:
- geometric consistency: LK tracks on textured frames match the renderer's
  exact ground-truth optical flow (ray-cast world points re-projected),
- the epipolar gate demonstrably rejecting PLANTED outlier tracks (a
  moving occluder quad in view) while keeping static-scene inliers,
- image-driven e2e on textured frames: ATE + online line-delay calibration.
"""

import numpy as np
import pytest

from ctrlvio_tpu.frontend.fused import FusedTracker, rotation_flow
from ctrlvio_tpu.frontend.tracker import TrackerConfig
from ctrlvio_tpu.models.cameras import Pinhole
from ctrlvio_tpu.ops import so3np
from ctrlvio_tpu.sim import render, synthetic

H, W, FX, CX, CY = 256, 320, 200.0, 160.0, 128.0
LD = 1.15e-4  # total readout H*ld ~ 29 ms, the TUM-RSVI scale


def _sim(duration=3.0, seed=5):
    return synthetic.generate(synthetic.SimConfig(
        duration=duration, n_landmarks=50, seed=seed, line_delay=LD,
        image_h=H, image_w=W, fx=FX, fy=FX, cx=CX, cy=CY))


def _cam_pose(sim, t_sec, R_CtoI):
    q, p = sim.pose_at(t_sec)
    R = so3np.quat_to_matrix(q if q.ndim == 2 else q[None])[0]
    cw = (p[0] if p.ndim == 2 else p) + R @ np.asarray(sim.cfg.ext_pos)
    return (R @ R_CtoI).astype(np.float32), cw.astype(np.float32)


def test_textured_flow_matches_ray_geometry():
    """LK flow on textured frames vs exact GT flow: cast each tracked
    corner's ray at its own rolling-shutter row time, hit the world,
    re-project the hit point into the next frame (fixed-point on the row).
    Median error must be sub-pixel — proves renderer geometry + tracker
    agree end to end."""
    sim = _sim(duration=1.6, seed=7)
    cam = Pinhole(FX, FX, CX, CY)
    world = render.make_world(sim, seed=3, n_occluders=0)
    imgs = render.render_textured_sequence(sim, H, W, cam, world=world,
                                           seed=3, photometric=False,
                                           pixel_noise=0.0)
    R_CtoI = so3np.quat_to_matrix(
        so3np.quat_exp(np.asarray(sim.cfg.ext_rot))[None])[0]
    dirs = render._unproject_np(cam, H, W)

    tcfg = TrackerConfig(max_cnt=90, min_dist=14, freq=100.0)
    tr = FusedTracker(tcfg, cam, (H, W))
    prev = None
    errs = []
    prev_t = None
    for i, fr in enumerate(sim.frames):
        M = (rotation_flow(sim.imu_t_ns, sim.gyro, prev_t, fr.t_ns, R_CtoI)
             if prev_t else None)
        out = tr.step(fr.t_ns, imgs[i], R_rel=M)
        prev_t = fr.t_ns
        if prev is not None and out is not None:
            t_prev, uv_prev, ids_prev = prev
            common, ia, ib = np.intersect1d(ids_prev, out["ids"],
                                            return_indices=True)
            if len(common) >= 10:
                # GT: ray-cast the previous-frame corner (exact subpixel
                # dir — the camera is a distortion-free pinhole here) at
                # its own row time
                uv0 = uv_prev[ia]
                t0s = t_prev * 1e-9 + np.clip(uv0[:, 1], 0, H - 1) * LD
                X = []
                for k in range(len(uv0)):
                    Rc, cw = _cam_pose(sim, t0s[k], R_CtoI)
                    d = np.array([(uv0[k, 0] - CX) / FX,
                                  (uv0[k, 1] - CY) / FX, 1.0], np.float32)
                    d = (d / np.linalg.norm(d)) @ Rc.T
                    tb = world._box_t(cw[None, :], d[None, :])[0]
                    X.append(cw + tb * d)
                X = np.asarray(X)
                # project into the current frame with row fixed-point
                v = np.full(len(X), CY)
                for _ in range(4):
                    uv1 = []
                    for k in range(len(X)):
                        Rc, cw = _cam_pose(sim, out["t_ns"] * 1e-9
                                           + v[k] * LD, R_CtoI)
                        Xc = Rc.T @ (X[k] - cw)
                        uv1.append([FX * Xc[0] / Xc[2] + CX,
                                    FX * Xc[1] / Xc[2] + CY])
                    uv1 = np.asarray(uv1)
                    v = np.clip(uv1[:, 1], 0, H - 1)
                e = np.linalg.norm(out["uv"][ib] - uv1, axis=1)
                errs.extend(e.tolist())
        if out is not None:
            prev = (out["t_ns"], out["uv"], out["ids"])
    errs = np.asarray(errs)
    assert len(errs) > 200
    assert np.median(errs) < 0.5, f"median flow err {np.median(errs):.2f} px"


@pytest.mark.slow
def test_f_gate_rejects_planted_moving_occluder():
    """A textured quad moving through the camera's view plants tracks that
    violate the static scene's epipolar geometry; with reject_wf on, the
    F-gate must kill them (short lifetimes, ~none published) while static
    texture tracks survive. ≙ rejectWithF, `feature_tracker.cpp:201-235`."""
    sim = _sim(duration=3.0, seed=5)
    cam = Pinhole(FX, FX, CX, CY)
    R_CtoI = so3np.quat_to_matrix(
        so3np.quat_exp(np.asarray(sim.cfg.ext_rot))[None])[0]
    world = render.make_world(sim, seed=2, n_occluders=2)
    # plant a 1.2 x 1.2 m quad 2.5 m straight ahead of the mid-sequence
    # camera, sweeping sideways at 0.6 m/s
    t_mid = sim.frames[len(sim.frames) // 2].t_ns * 1e-9
    Rc, cw = _cam_pose(sim, t_mid, R_CtoI)
    c = cw + Rc @ np.array([0.0, 0.0, 2.5], np.float32)
    world.add_quad(c, Rc @ np.array([1.0, 0, 0]), Rc @ np.array([0, 1.0, 0]),
                   (0.6, 0.6), vel=Rc @ np.array([0.6, 0.0, 0.0]))
    imgs = render.render_textured_sequence(sim, H, W, cam, world=world,
                                           seed=2)
    dirs = render._unproject_np(cam, H, W)

    stats = {}
    for gate in (False, True):
        tr = FusedTracker(TrackerConfig(max_cnt=110, min_dist=12, freq=100.0,
                                        reject_wf=gate, f_threshold=1.0),
                          cam, (H, W))
        prev_t = None
        occ_pub = 0
        occ_long = 0
        n_pub = 0
        for i, fr in enumerate(sim.frames):
            M = (rotation_flow(sim.imu_t_ns, sim.gyro, prev_t, fr.t_ns,
                               R_CtoI) if prev_t else None)
            out = tr.step(fr.t_ns, imgs[i], R_rel=M)
            prev_t = fr.t_ns
            if out is None or not len(out["ids"]):
                continue
            t0 = fr.t_ns * 1e-9
            Rcf, cwf = _cam_pose(sim, t0, R_CtoI)
            uv = out["uv"].astype(int)
            d_w = (dirs[np.clip(uv[:, 1], 0, H - 1),
                        np.clip(uv[:, 0], 0, W - 1)] @ Rcf.T)
            m = world.occluder_mask(cwf, d_w.astype(np.float32), t0)
            n_pub += len(uv)
            occ_pub += int(m.sum())
            if m.any():
                cnt = tr.track_cnt[np.isin(tr.ids, out["ids"][m])]
                occ_long += int((np.asarray(cnt) >= 4).sum())
        stats[gate] = (occ_pub, occ_long, n_pub, tr.n_rejected)

    off, on = stats[False], stats[True]
    # without the gate the moving quad is tracked like scenery
    assert off[0] > 30, f"planted occluder was barely tracked: {off}"
    assert off[1] > 10, f"no long-lived outlier tracks without gate: {off}"
    # with the gate: outlier tracks die young and (almost) none get old
    assert on[3] > 0, "gate never fired"
    assert on[1] <= off[1] * 0.2, \
        f"long-lived outlier tracks survived the F gate: {on} vs {off}"
    # the gate must not starve the tracker of static-scene features
    assert on[2] > 0.5 * off[2], f"gate over-rejects: {on} vs {off}"
