"""Analytic reprojection Jacobians vs the autodiff oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlvio_tpu.ops import factors as F
from ctrlvio_tpu.ops import reproj_analytic as RA
from ctrlvio_tpu.ops import so3, spline
from ctrlvio_tpu.sim import synthetic

from tests.test_factors import _reproj_setup, sim  # fixture reuse


def test_so3_knot_jacobian_matches_fd(sim):
    kq = jnp.asarray(sim.knots_q)
    q4 = kq[5:9]
    u = jnp.asarray(0.37, dtype=jnp.float64)
    qv, Jk = RA.so3_value_knot_jac(q4, u)
    np.testing.assert_allclose(
        np.abs(np.dot(np.asarray(qv), np.asarray(spline.so3_eval(q4, u)))),
        1.0, atol=1e-12)
    eps = 1e-7
    for k in range(4):
        for d in range(3):
            dq = np.zeros((4, 3)); dq[k, d] = eps
            qp = spline.so3_eval(so3.boxplus(q4, jnp.asarray(dq)), u)
            qm = spline.so3_eval(so3.boxplus(q4, jnp.asarray(-dq)), u)
            fd = np.asarray(so3.boxminus(qp, qm)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(Jk[k, :, d]), fd, atol=1e-6)


def test_reproj_analytic_matches_autodiff(sim):
    for pair in [(1, 3), (0, 5), (2, 8)]:
        args = _reproj_setup(sim, *pair)
        r_a, J_ri, J_pi, J_rj, J_pj, J_d, J_ld = RA.reproj_analytic(**args)

        z = jnp.zeros((4, 3), dtype=jnp.float64)
        z1 = jnp.asarray(0.0, dtype=jnp.float64)

        def f(xi_ri, xi_pi, xi_rj, xi_pj, d_dinv, d_ld):
            return F.reproj_residual_tangent(
                xi_ri, xi_pi, xi_rj, xi_pj, d_dinv, d_ld, **args)

        r_o = f(z, z, z, z, z1, z1)
        jac = jax.jacfwd(f, argnums=(0, 1, 2, 3, 4, 5))(z, z, z, z, z1, z1)

        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_o), atol=1e-12)
        np.testing.assert_allclose(np.asarray(J_ri), np.asarray(jac[0]).transpose(0, 1, 2), atol=1e-8)
        np.testing.assert_allclose(np.asarray(J_pi), np.asarray(jac[1]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(J_rj), np.asarray(jac[2]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(J_pj), np.asarray(jac[3]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(J_d), np.asarray(jac[4]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(J_ld), np.asarray(jac[5]), rtol=1e-6, atol=1e-4)
