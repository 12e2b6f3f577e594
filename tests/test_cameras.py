import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlvio_tpu.models import cameras


def rand_points(n, seed=0, fov=0.8):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-fov, fov, size=(n, 2))
    z = rng.uniform(0.5, 10.0, size=(n, 1))
    return jnp.asarray(np.concatenate([xy * z, z], axis=1))


# parameters shaped like the TUM-RSVI calibration (`config/tumrs/cam_tumrs.yaml`)
KB = cameras.Equidistant(mu=739.2, mv=739.1, u0=625.9, v0=517.3,
                         k2=0.0034, k3=0.0007, k4=-0.0015, k5=0.0005)
PIN = cameras.Pinhole(fx=460.0, fy=458.0, cx=367.2, cy=248.4,
                      k1=-0.28, k2=0.07, p1=2e-4, p2=1.8e-5)
MEI = cameras.Mei(xi=1.8, fx=1200.0, fy=1198.0, cx=640.0, cy=512.0,
                  k1=-0.1, k2=0.02, p1=1e-4, p2=-2e-4)


@pytest.mark.parametrize("cam,fov", [(KB, 1.2), (PIN, 0.5), (MEI, 0.7)])
def test_project_lift_roundtrip(cam, fov):
    X = rand_points(256, fov=fov)
    uv = cam.project(X)
    xy = cam.lift(uv)
    xy_true = X[:, :2] / X[:, 2:3]
    np.testing.assert_allclose(np.asarray(xy), np.asarray(xy_true), atol=1e-8)


def test_kb_matches_closed_form_on_axis():
    # a point on the optical axis projects to the principal point
    uv = KB.project(jnp.asarray([0.0, 0.0, 2.0]))
    np.testing.assert_allclose(np.asarray(uv), [KB.u0, KB.v0], atol=1e-9)


def test_yaml_factory():
    cam = cameras.from_yaml_dict({
        "model_type": "KANNALA_BRANDT",
        "projection_parameters": dict(mu=739.2, mv=739.1, u0=625.9, v0=517.3,
                                      k2=0.0034, k3=0.0007, k4=-0.0015, k5=0.0005),
    })
    assert isinstance(cam, cameras.Equidistant)
    assert cam.mu == 739.2


def test_vmap_jit_project():
    X = rand_points(64, fov=1.0)
    f = jax.jit(KB.project)
    np.testing.assert_allclose(np.asarray(f(X)), np.asarray(KB.project(X)), atol=1e-10)


def test_scaramuzza_roundtrip_and_factory():
    """OCam model (≙ ScaramuzzaCamera.cc): project/lift must round-trip to
    sub-0.1 px over the field of view; YAML factory parity."""
    import numpy as np
    import jax.numpy as jnp

    from ctrlvio_tpu.models.cameras import Scaramuzza, fit_inv_poly, \
        from_yaml_dict

    # plausible OCamCalib calibration for a ~640x480 fisheye
    poly = (-216.9657, 0.0, 1.797e-3, 2.779e-7, 5.05e-10)
    inv_poly = fit_inv_poly(poly, rho_max=320.0)
    cam = Scaramuzza(poly=poly, inv_poly=inv_poly, c=1.0005, d=1.2e-4,
                     e=-0.8e-4, cx=321.5, cy=243.2)

    rng = np.random.default_rng(0)
    X = np.stack([rng.uniform(-1.2, 1.2, 200), rng.uniform(-0.9, 0.9, 200),
                  np.ones(200)], axis=1) * rng.uniform(2, 8, (200, 1))
    uv = np.asarray(cam.project(jnp.asarray(X)))
    inb = (np.abs(uv[:, 0] - 321.5) < 300) & (np.abs(uv[:, 1] - 243.2) < 230)
    assert inb.sum() > 100
    norm = np.asarray(cam.lift(jnp.asarray(uv[inb])))
    gt_norm = X[inb, :2] / X[inb, 2:3]
    # angular consistency of the lifted ray
    np.testing.assert_allclose(norm, gt_norm, atol=2e-3)
    # pixel round trip: re-project the lifted ray
    uv2 = np.asarray(cam.project(jnp.asarray(
        np.concatenate([norm, np.ones((inb.sum(), 1))], axis=1))))
    assert np.abs(uv2 - uv[inb]).max() < 0.1

    d = dict(
        model_type="scaramuzza",
        poly_parameters={f"p{i}": poly[i] for i in range(5)},
        inv_poly_parameters={f"p{i}": inv_poly[i] for i in range(20)},
        affine_parameters=dict(ac=1.0005, ad=1.2e-4, ae=-0.8e-4,
                               cx=321.5, cy=243.2))
    cam2 = from_yaml_dict(d)
    uv3 = np.asarray(cam2.project(jnp.asarray(X[inb])))
    np.testing.assert_allclose(uv3, uv[inb], atol=1e-9)
