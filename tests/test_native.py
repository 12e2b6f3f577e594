"""Native (C++) feature table vs the python implementation: identical
keyframe decisions, packed factors, triangulated depths, and slides."""

import numpy as np
import pytest

from ctrlvio_tpu.estimator import native, packing
from ctrlvio_tpu.estimator.features import FeatureTable
from ctrlvio_tpu.ops import so3np
from ctrlvio_tpu.sim import synthetic
from ctrlvio_tpu.solver.layout import WindowConfig

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


@pytest.fixture(scope="module")
def sim():
    return synthetic.generate(synthetic.SimConfig(duration=3.0, n_landmarks=120, seed=5))


def test_native_matches_python(sim):
    cfg = WindowConfig(KW=40, NB=11, LM=128, OBS=1024, MIMU=256)
    py = FeatureTable(cfg.NB - 1)
    nat = native.NativeFeatureTable(cfg.NB - 1)

    frames = sim.frames[: cfg.NB]
    kf_t_ns = np.array([f.t_ns for f in frames], dtype=np.int64)
    for i, fr in enumerate(frames):
        kf_py = py.add_frame(i, fr.ids, fr.pts, fr.rows)
        kf_nat = nat.add_frame(i, fr.ids, fr.pts, fr.rows)
        assert kf_py == kf_nat, i
    assert nat.n_tracks == len(py.tracks)
    assert nat.last_track_num == py.last_track_num

    # triangulate with GT camera poses
    qs, ps = [], []
    for t in kf_t_ns:
        q, p = sim.pose_at(t * 1e-9)
        R = so3np.quat_to_matrix(q)
        R_CtoI = so3np.quat_to_matrix(so3np.quat_exp(np.array(sim.cfg.ext_rot)))
        qs.append(R @ R_CtoI)
        ps.append(p + R @ np.array(sim.cfg.ext_pos))
    cam_R = np.stack(qs)
    cam_p = np.stack(ps)

    # python path wants quaternions
    def mat2quat(R):
        from ctrlvio_tpu.estimator.vio_init import _R_to_quat
        return np.stack([_R_to_quat(r) for r in R])

    py.triangulate(mat2quat(cam_R), cam_p)
    nat._lib.ft_triangulate(nat._h, len(cam_p),
                            np.ascontiguousarray(cam_R), np.ascontiguousarray(cam_p))

    img_py, dinv_py, cands = packing.pack_image_factors(
        list(py.tracks.values()), kf_t_ns, cfg.dt, 0, cfg, np.float32)
    img_nat, dinv_nat, ncand = nat.pack_image_factors(kf_t_ns, cfg.dt, 0, cfg)

    assert ncand == len(cands)
    n_py = int(img_py.valid.sum())
    n_nat = int(img_nat.valid.sum())
    assert n_py == n_nat
    np.testing.assert_array_equal(img_py.i0_i[:n_py], img_nat.i0_i[:n_nat])
    np.testing.assert_array_equal(img_py.lm_idx[:n_py], img_nat.lm_idx[:n_nat])
    np.testing.assert_allclose(img_py.pt_i[:n_py], img_nat.pt_i[:n_nat], atol=1e-6)
    np.testing.assert_allclose(img_py.row_j[:n_py], img_nat.row_j[:n_nat], atol=0)
    np.testing.assert_allclose(img_py.f_j[:n_py], img_nat.f_j[:n_nat], atol=1e-6)
    np.testing.assert_array_equal(img_py.marg_drop[:n_py], img_nat.marg_drop[:n_nat])
    # triangulated depths agree (different SVD implementations -> loose tol)
    np.testing.assert_allclose(dinv_py[:ncand], dinv_nat[:ncand], rtol=2e-3)

    # depths write-back + slides stay consistent
    new_dinv = dinv_py * 1.1
    py.set_depths(new_dinv.astype(np.float64), cands)
    nat.set_depths(new_dinv)

    R0, p0 = cam_R[0], cam_p[0]
    R1, p1 = cam_R[1], cam_p[1]
    py.slide_old(R0, p0, R1, p1)
    nat.slide_old(R0, p0, R1, p1)
    assert nat.n_tracks == len(py.tracks)

    py.slide_second_new(cfg.NB - 1)
    nat.slide_second_new(cfg.NB - 1)
    assert nat.n_tracks == len(py.tracks)

    # re-pack after slides: still identical
    img_py2, dinv_py2, c2 = packing.pack_image_factors(
        list(py.tracks.values()), kf_t_ns, cfg.dt, 0, cfg, np.float32)
    img_nat2, dinv_nat2, nc2 = nat.pack_image_factors(kf_t_ns, cfg.dt, 0, cfg)
    assert int(img_py2.valid.sum()) == int(img_nat2.valid.sum())
    np.testing.assert_allclose(dinv_py2[:nc2], dinv_nat2[:nc2], rtol=2e-3)


def test_native_pack_speed(sim):
    cfg = WindowConfig(KW=40, NB=11, LM=256, OBS=1024, MIMU=256)
    nat = native.NativeFeatureTable(cfg.NB - 1)
    frames = sim.frames[: cfg.NB]
    kf_t_ns = np.array([f.t_ns for f in frames], dtype=np.int64)
    for i, fr in enumerate(frames):
        nat.add_frame(i, fr.ids, fr.pts, fr.rows)
    import time

    t0 = time.perf_counter()
    for _ in range(20):
        nat.pack_image_factors(kf_t_ns, cfg.dt, 0, cfg)
    dt = (time.perf_counter() - t0) / 20
    assert dt < 0.005, f"native pack too slow: {dt * 1e3:.2f} ms"
