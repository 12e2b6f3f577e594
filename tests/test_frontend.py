"""Frontend tests: LK flow recovers known shifts on synthetic texture;
corner detection finds high-contrast corners with min-distance spacing;
CLAHE flattens the histogram; full tracker maintains ids across frames."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlvio_tpu.frontend import clahe, corners, klt, tracker
from ctrlvio_tpu.models import cameras


def make_texture(h=240, w=320, seed=0, block=8, sigma=1.5):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, size=(h // block, w // block))
    img = np.kron(img, np.ones((block, block)))  # blocky texture, strong gradients
    # smooth so gradients are well-defined (and pyramid levels stay textured)
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(img * 255.0, sigma)


def shift_image(img, dx, dy):
    from scipy.ndimage import shift as ndi_shift

    return ndi_shift(img, (dy, dx), order=3, mode="nearest")


def test_klt_recovers_translation():
    img0 = make_texture()
    dx, dy = 3.3, -2.6
    img1 = shift_image(img0, dx, dy)
    pyr0 = klt.pyramid(jnp.asarray(img0, jnp.float32), 3)
    pyr1 = klt.pyramid(jnp.asarray(img1, jnp.float32), 3)

    rng = np.random.default_rng(1)
    pts = np.stack([rng.uniform(30, 290, 50), rng.uniform(30, 210, 50)], axis=1)
    out, ok = klt.track(pyr0, pyr1, jnp.asarray(pts, jnp.float32))
    out = np.asarray(out)
    ok = np.asarray(ok)
    assert ok.sum() > 35
    flow = out[ok] - pts[ok]
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=0.15)


def test_klt_large_motion_via_pyramid():
    img0 = make_texture(seed=3, block=16, sigma=2.5)
    dx, dy = 14.0, 9.0  # beyond single-level 21x21 window
    img1 = shift_image(img0, dx, dy)
    pyr0 = klt.pyramid(jnp.asarray(img0, jnp.float32), 4)
    pyr1 = klt.pyramid(jnp.asarray(img1, jnp.float32), 4)
    rng = np.random.default_rng(2)
    pts = np.stack([rng.uniform(40, 270, 40), rng.uniform(40, 190, 40)], axis=1)
    out, ok = klt.track(pyr0, pyr1, jnp.asarray(pts, jnp.float32))
    flow = np.asarray(out)[np.asarray(ok)] - pts[np.asarray(ok)]
    assert np.asarray(ok).sum() > 20
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=0.3)


def test_fb_check_rejects_occlusion():
    img0 = make_texture(seed=5)
    img1 = shift_image(img0, 2.0, 1.0)
    img1[100:140, 150:200] = 0.0  # occlude a region
    pyr0 = klt.pyramid(jnp.asarray(img0, jnp.float32), 3)
    pyr1 = klt.pyramid(jnp.asarray(img1, jnp.float32), 3)
    pts = np.asarray([[170.0, 115.0], [60.0, 60.0]])
    out, ok = klt.track(pyr0, pyr1, jnp.asarray(pts, jnp.float32))
    ok = np.asarray(ok)
    assert ok[1]  # clean point tracked
    # occluded point: either rejected or tracked somewhere weird — must not
    # be confidently wrong (fb check guards it)
    if ok[0]:
        np.testing.assert_allclose(np.asarray(out)[0] - pts[0], [2, 1], atol=1.0)


def test_corner_detection_spacing():
    img = make_texture(seed=7)
    pts, ok = corners.detect(jnp.asarray(img, jnp.float32), max_corners=60,
                             min_dist=12)
    pts = np.asarray(pts)[np.asarray(ok)]
    assert len(pts) >= 40
    # min-distance property (grid-cell suppression: no two in the same cell)
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.fill_diagonal(d, 1e9)
    assert d.min() >= 6  # at least half the cell size apart


def test_clahe_flattens_histogram():
    rng = np.random.default_rng(0)
    # low-contrast image concentrated in [100, 140]
    img = np.clip(rng.normal(120, 8, size=(256, 256)), 0, 255)
    out = np.asarray(clahe.clahe(jnp.asarray(img, jnp.float32)))
    assert out.std() > img.std() * 1.5
    assert out.min() >= 0 and out.max() <= 255


def test_tracker_end_to_end_ids():
    cam = cameras.Pinhole(fx=200.0, fy=200.0, cx=160.0, cy=120.0)
    cfg = tracker.TrackerConfig(max_cnt=80, min_dist=12, freq=1000.0)
    tr = tracker.FeatureTracker(cfg, cam, (240, 320))

    img0 = make_texture(seed=9)
    out0 = tr.process(0, img0)
    assert out0 is not None and len(out0["ids"]) > 30

    img1 = shift_image(img0, 2.0, -1.5)
    out1 = tr.process(100_000_000, img1)
    common = np.intersect1d(out0["ids"], out1["ids"])
    assert len(common) > 20
    # tracked motion is the shift
    m0 = {i: p for i, p in zip(out0["ids"], out0["uv"])}
    flows = np.asarray([out1["uv"][list(out1["ids"]).index(i)] - m0[i]
                        for i in common])
    np.testing.assert_allclose(np.median(flows, axis=0), [2.0, -1.5], atol=0.3)
