"""FusedTracker: single-dispatch front end matches the reference pipeline
semantics (track persistence, refill, undistortion), its gyro-predicted
initial flow absorbs fast rotation, and lag=1 pipelined mode is a pure
delay of lag=0."""

import numpy as np

from ctrlvio_tpu.frontend.fused import FusedTracker, rotation_flow
from ctrlvio_tpu.frontend.tracker import TrackerConfig
from ctrlvio_tpu.models.cameras import Pinhole
from ctrlvio_tpu.ops import so3np
from ctrlvio_tpu.sim import render, synthetic

H, W, FX, CX, CY = 256, 320, 200.0, 160.0, 128.0


def _sequence(duration=2.0):
    sim = synthetic.generate(synthetic.SimConfig(
        duration=duration, n_landmarks=400, seed=5, line_delay=1.15e-4,
        image_h=H, image_w=W, fx=FX, fy=FX, cx=CX, cy=CY))
    imgs = render.render_sequence(sim, H, W, FX, FX, CX, CY, seed=1,
                                  big_every=6, texture=6.0)
    R_CtoI = so3np.quat_to_matrix(
        so3np.quat_exp(np.asarray(sim.cfg.ext_rot)[None]))[0]
    return sim, imgs, R_CtoI


def _drive(tr, sim, imgs, R_CtoI, n=None):
    outs, prev_t = [], None
    for i, fr in enumerate(sim.frames[:n]):
        M = (rotation_flow(sim.imu_t_ns, sim.gyro, prev_t, fr.t_ns, R_CtoI)
             if prev_t else None)
        out = tr.step(fr.t_ns, imgs[i], R_rel=M)
        prev_t = fr.t_ns
        if out is not None:
            outs.append(out)
    return outs


def test_fused_tracks_and_refills():
    sim, imgs, R_CtoI = _sequence(3.0)
    cam = Pinhole(FX, FX, CX, CY)
    tr = FusedTracker(TrackerConfig(max_cnt=110, min_dist=12), cam, (H, W))
    outs = _drive(tr, sim, imgs, R_CtoI)
    assert len(outs) == len(sim.frames)
    n_live = [len(o["ids"]) for o in outs]
    assert min(n_live[1:]) >= 30, n_live
    # gyro-predicted LK keeps tracks alive through ~35 px/frame motion
    assert tr.track_cnt[tr.track_cnt > 0].mean() > 2.0
    out = outs[-1]
    # undistortion consistency: norm == lift(uv); ids unique
    norm_ref = np.asarray(cam.lift(out["uv"]))
    assert np.allclose(out["pts"], norm_ref, atol=1e-5)
    assert len(set(out["ids"])) == len(out["ids"])
    assert out["t_ns"] == sim.frames[-1].t_ns


def test_fused_lag1_is_pure_delay():
    sim, imgs, R_CtoI = _sequence()
    cam = Pinhole(FX, FX, CX, CY)
    tr0 = FusedTracker(TrackerConfig(max_cnt=96, min_dist=12), cam, (H, W))
    tr1 = FusedTracker(TrackerConfig(max_cnt=96, min_dist=12), cam, (H, W),
                       lag=1)
    outs0 = _drive(tr0, sim, imgs, R_CtoI, n=8)
    outs1 = _drive(tr1, sim, imgs, R_CtoI, n=8)
    outs1.append(tr1.flush())
    assert len(outs0) == len(outs1)
    for a, b in zip(outs0, outs1):
        assert a["t_ns"] == b["t_ns"]
        np.testing.assert_array_equal(a["ids"], b["ids"])
        np.testing.assert_allclose(a["uv"], b["uv"], atol=1e-6)
        np.testing.assert_allclose(a["vel"], b["vel"], atol=1e-6)
