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
