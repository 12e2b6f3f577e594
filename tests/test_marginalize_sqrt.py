"""Square-root (QR) marginalization must carry the same information as the
f64 normal-equation build — it is the f32/TPU-safe path used by the
device-resident streaming pipeline.

Equivalence is on the information matrix JᵀJ and gradient Jᵀr0 (the square
root itself is only unique up to an orthogonal row transform).
≙ `marginalization_factor.cpp:209-263` (the reference's H-build +
eigendecomposition sqrt)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ctrlvio_tpu.solver import lm, marginalize
from ctrlvio_tpu.solver.layout import SolveOptions

from test_solver import problem  # noqa: F401  (fixture)


@pytest.fixture(scope="module")
def solved(problem):  # noqa: F811
    cfg, sim, img, imu, bias, params0, kq_gt, kp_gt, aux = problem
    opts = SolveOptions(max_iters=8)
    p, _ = lm.solve_window(params0, img, imu, bias, aux["prior"],
                           aux["fixed"], aux["ext"], aux["gravity"],
                           aux["imu_info"], aux["sqrt_info_img"], cfg, opts)
    drop = np.zeros(cfg.KW, bool)
    drop[:2] = True
    margs = dict(ext=aux["ext"], gravity=aux["gravity"],
                 imu_info=aux["imu_info"], sqrt_info_img=aux["sqrt_info_img"],
                 cfg=cfg, opts=opts._replace(cauchy_c=1.0))
    return cfg, img, imu, bias, aux, p, drop, margs


def _info(prior):
    J = np.asarray(prior.J, np.float64)
    r = np.asarray(prior.r0, np.float64)
    return J.T @ J, J.T @ r


def test_sqrt_matches_normal_equations_f64(solved):
    cfg, img, imu, bias, aux, p, drop, margs = solved
    ph = marginalize.build_prior(p, img, imu, bias, aux["prior"], drop, **margs)
    ps = marginalize.build_prior_sqrt(p, img, imu, bias, aux["prior"], drop,
                                      **margs)
    Hh, gh = _info(ph)
    Hs, gs = _info(ps)
    scale = np.abs(Hh).max()
    assert scale > 0
    assert np.abs(Hs - Hh).max() / scale < 1e-6
    assert np.abs(gs - gh).max() / max(np.abs(gh).max(), 1e-12) < 1e-5
    # dropped coordinates carry no information in the sqrt prior
    dm = np.asarray(marginalize.drop_mask(cfg, jnp.asarray(drop), True))[: cfg.C]
    assert np.abs(np.asarray(ps.J)[:, dm]).max() < np.sqrt(scale) * 1e-7


def test_sqrt_f32_stays_close_to_f64(solved):
    cfg, img, imu, bias, aux, p, drop, margs = solved
    to32 = lambda t: jnp.asarray(np.asarray(t), jnp.float32)
    tree32 = lambda t: type(t)(*(
        to32(x) if np.asarray(x).dtype.kind == "f" else jnp.asarray(x)
        for x in t))
    ps64 = marginalize.build_prior_sqrt(p, img, imu, bias, aux["prior"], drop,
                                        **margs)
    m32 = dict(margs, ext=type(margs["ext"])(*(to32(x) for x in margs["ext"])),
               gravity=to32(margs["gravity"]), imu_info=to32(margs["imu_info"]),
               sqrt_info_img=to32(margs["sqrt_info_img"]))
    ps32 = marginalize.build_prior_sqrt(
        tree32(p), tree32(img), tree32(imu), tree32(bias),
        tree32(aux["prior"]), drop, **m32)
    H64, _ = _info(ps64)
    H32, _ = _info(ps32)
    scale = np.abs(H64).max()
    # information matrix: f32 QR holds ~1e-8 relative (vs the H-form's
    # catastrophic digit loss — 198 cm ATE measured in round 2)
    assert np.abs(H32 - H64).max() / scale < 1e-5

    # the gradient can only be compared through the curvature: raw Jᵀr0
    # differs legitimately (different f32-quantized linearization points,
    # and noise in ~1e14-information directions displaces nothing). The
    # meaningful metric is the state bias the f32 prior injects per step.
    from ctrlvio_tpu.solver.layout import boxminus_full

    def grad_at(pr, state):
        J = np.asarray(pr.J, np.float64)
        f64 = lambda a: jnp.asarray(np.asarray(a), jnp.float64)
        dx = np.asarray(boxminus_full(
            state, f64(pr.knots_q0), f64(pr.knots_p0), f64(pr.bg0),
            f64(pr.ba0), f64(pr.ld0), cfg))
        return J.T @ (np.asarray(pr.r0, np.float64) + J @ dx)

    dg = grad_at(ps32, p) - grad_at(ps64, p)
    bias_x = np.linalg.lstsq(H64 + 1e-6 * np.eye(cfg.C), dg, rcond=None)[0]
    assert np.abs(bias_x).max() < 1e-3, np.abs(bias_x).max()


def test_sqrt_recursion_second_step(solved):
    """Chaining: use the sqrt prior as old_prior for a second marg step and
    compare against the H-form chain (both f64)."""
    cfg, img, imu, bias, aux, p, drop, margs = solved
    ph = marginalize.build_prior(p, img, imu, bias, aux["prior"], drop, **margs)
    ps = marginalize.build_prior_sqrt(p, img, imu, bias, aux["prior"], drop,
                                      **margs)
    drop2 = np.zeros(cfg.KW, bool)
    drop2[2:4] = True
    ph2 = marginalize.build_prior(p, img, imu, bias, ph, drop2, **margs)
    ps2 = marginalize.build_prior_sqrt(p, img, imu, bias, ps, drop2, **margs)
    Hh, gh = _info(ph2)
    Hs, gs = _info(ps2)
    scale = np.abs(Hh).max()
    assert np.abs(Hs - Hh).max() / scale < 1e-6
    assert np.abs(gs - gh).max() / max(np.abs(gh).max(), 1e-12) < 1e-5


def test_sqrt_rolled_layout_matches(solved):
    cfg, img, imu, bias, aux, p, drop, margs = solved
    ks = jnp.asarray(2, jnp.int32)
    bs = jnp.asarray(1, jnp.int32)
    ps = marginalize.build_prior_sqrt(p, img, imu, bias, aux["prior"], drop,
                                      knot_shift=ks, bias_shift=bs, **margs)
    ph = marginalize.build_prior(p, img, imu, bias, aux["prior"], drop,
                                 knot_shift=ks, bias_shift=bs, **margs)
    Hh, gh = _info(ph)
    Hs, gs = _info(ps)
    scale = np.abs(Hh).max()
    assert np.abs(Hs - Hh).max() / scale < 1e-6
