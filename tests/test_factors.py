import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlvio_tpu.ops import so3, spline, factors
from ctrlvio_tpu.sim import synthetic


@pytest.fixture(scope="module")
def sim():
    cfg = synthetic.SimConfig(duration=4.0, n_landmarks=120, seed=3)
    return synthetic.generate(cfg)


def _grid(t_ns, dt):
    dt_ns = np.int64(np.round(dt * 1e9))
    i0 = int(np.int64(t_ns) // dt_ns)
    u = float(np.int64(t_ns) % dt_ns) / float(dt_ns)
    return i0, u


def test_imu_residual_zero_on_perfect_data(sim):
    dt = sim.cfg.knot_dt
    kq = jnp.asarray(sim.knots_q)
    kp = jnp.asarray(sim.knots_p)
    info = jnp.ones(6, dtype=jnp.float64)
    g = jnp.asarray(sim.gravity_vec)
    # every 10th sample
    for m in range(0, len(sim.imu_t_ns), 50):
        i0, u = _grid(sim.imu_t_ns[m], dt)
        r = factors.imu_residual(
            kq[i0 : i0 + 4], kp[i0 : i0 + 4], jnp.asarray(u), 1.0 / dt,
            jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(sim.gyro[m]), jnp.asarray(sim.accel[m]), g, info,
        )
        np.testing.assert_allclose(np.asarray(r), np.zeros(6), atol=1e-9)


def test_imu_residual_bias_shift(sim):
    """Adding a bias to the measurement is cancelled by the bias parameter."""
    dt = sim.cfg.knot_dt
    kq, kp = jnp.asarray(sim.knots_q), jnp.asarray(sim.knots_p)
    i0, u = _grid(sim.imu_t_ns[100], dt)
    bg = jnp.asarray([0.01, -0.02, 0.005])
    ba = jnp.asarray([0.1, 0.05, -0.2])
    r = factors.imu_residual(
        kq[i0 : i0 + 4], kp[i0 : i0 + 4], jnp.asarray(u), 1.0 / dt,
        bg, ba,
        jnp.asarray(sim.gyro[100]) + bg, jnp.asarray(sim.accel[100]) + ba,
        jnp.asarray(sim.gravity_vec), jnp.ones(6, dtype=jnp.float64),
    )
    np.testing.assert_allclose(np.asarray(r), np.zeros(6), atol=1e-9)


def test_imu_jacobian_matches_fd(sim):
    dt = sim.cfg.knot_dt
    kq, kp = jnp.asarray(sim.knots_q), jnp.asarray(sim.knots_p)
    i0, u = _grid(sim.imu_t_ns[77], dt)
    args = (
        kq[i0 : i0 + 4], kp[i0 : i0 + 4], jnp.asarray(u), 1.0 / dt,
        jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(sim.gyro[77]), jnp.asarray(sim.accel[77]),
        jnp.asarray(sim.gravity_vec), jnp.ones(6, dtype=jnp.float64),
    )
    z_r = jnp.zeros((4, 3), dtype=jnp.float64)
    jac = jax.jacfwd(factors.imu_residual_tangent, argnums=(0, 1, 2, 3))(
        z_r, z_r, jnp.zeros(3), jnp.zeros(3), *args
    )
    eps = 1e-7
    # finite-diff each tangent dim of the SO3 knots
    for k in range(4):
        for d in range(3):
            xi = np.zeros((4, 3))
            xi[k, d] = eps
            rp = factors.imu_residual_tangent(jnp.asarray(xi), z_r, jnp.zeros(3), jnp.zeros(3), *args)
            rm = factors.imu_residual_tangent(jnp.asarray(-xi), z_r, jnp.zeros(3), jnp.zeros(3), *args)
            fd = (rp - rm) / (2 * eps)
            np.testing.assert_allclose(np.asarray(jac[0][:, k, d]), np.asarray(fd), atol=1e-6)
    # pos knots
    for k in range(4):
        for d in range(3):
            xi = np.zeros((4, 3))
            xi[k, d] = eps
            rp = factors.imu_residual_tangent(z_r, jnp.asarray(xi), jnp.zeros(3), jnp.zeros(3), *args)
            rm = factors.imu_residual_tangent(z_r, jnp.asarray(-xi), jnp.zeros(3), jnp.zeros(3), *args)
            fd = (rp - rm) / (2 * eps)
            np.testing.assert_allclose(np.asarray(jac[1][:, k, d]), np.asarray(fd), atol=1e-6)


def _reproj_setup(sim, frame_a=2, frame_b=4):
    """Build one reprojection factor from GT sim data; returns (args, dinv)."""
    dt = sim.cfg.knot_dt
    fa, fb = sim.frames[frame_a], sim.frames[frame_b]
    common = np.intersect1d(fa.ids, fb.ids)
    assert len(common) > 0
    lid = common[0]
    ia = int(np.nonzero(fa.ids == lid)[0][0])
    ib = int(np.nonzero(fb.ids == lid)[0][0])
    ld = sim.cfg.line_delay

    # ground-truth inverse depth in camera at obs time of frame a
    t_rowa = fa.t_ns * 1e-9 + fa.rows[ia] * ld
    qa, pa = sim.pose_at(t_rowa)
    R_CtoI = np.asarray(so3.quat_to_matrix(jnp.asarray(so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))))))
    R_a = np.asarray(so3.quat_to_matrix(jnp.asarray(qa)))
    X_i = R_a.T @ (sim.landmarks[lid] - pa)
    X_c = R_CtoI.T @ (X_i - np.array(sim.cfg.ext_pos))
    dinv = 1.0 / X_c[2]

    i0a, ua = _grid(fa.t_ns, dt)
    i0b, ub = _grid(fb.t_ns, dt)
    # grid coords of the row-shifted times, with shift frozen
    ua_s = ua + fa.rows[ia] * ld / dt
    ub_s = ub + fb.rows[ib] * ld / dt
    sa, sb = np.floor(ua_s), np.floor(ub_s)

    kq, kp = jnp.asarray(sim.knots_q), jnp.asarray(sim.knots_p)
    ext = factors.CamExtrinsics(
        q_CtoI=so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))),
        p_CinI=jnp.asarray(np.array(sim.cfg.ext_pos)),
    )
    pt_i = jnp.asarray([fa.pts[ia, 0], fa.pts[ia, 1], 1.0])
    pt_j = jnp.asarray([fb.pts[ib, 0], fb.pts[ib, 1], 1.0])
    args = dict(
        q4i=kq[i0a + int(sa) : i0a + int(sa) + 4],
        p4i=kp[i0a + int(sa) : i0a + int(sa) + 4],
        q4j=kq[i0b + int(sb) : i0b + int(sb) + 4],
        p4j=kp[i0b + int(sb) : i0b + int(sb) + 4],
        dinv=jnp.asarray(dinv),
        ld=jnp.asarray(ld),
        fi=jnp.asarray(ua),
        fj=jnp.asarray(ub),
        shift_i=jnp.asarray(sa),
        shift_j=jnp.asarray(sb),
        row_i=jnp.asarray(fa.rows[ia]),
        row_j=jnp.asarray(fb.rows[ib]),
        inv_dt=1.0 / dt,
        pt_i=pt_i,
        pt_j=pt_j,
        ext=ext,
        sqrt_info=jnp.asarray(1.0),
    )
    return args


def test_reproj_residual_zero_on_perfect_data(sim):
    for fa, fb in [(0, 1), (2, 4), (5, 9)]:
        args = _reproj_setup(sim, fa, fb)
        r = factors.reproj_residual_ld(**args)
        np.testing.assert_allclose(np.asarray(r), np.zeros(2), atol=1e-7)


def test_reproj_sensitive_to_line_delay(sim):
    """With the wrong line delay the residual is nonzero — the observability
    that makes online ld calibration work."""
    args = _reproj_setup(sim, 2, 6)
    r_true = factors.reproj_residual_ld(**args)
    args_bad = dict(args)
    args_bad["ld"] = jnp.asarray(0.0)
    r_bad = factors.reproj_residual_ld(**args_bad)
    assert np.linalg.norm(np.asarray(r_bad)) > 10 * max(np.linalg.norm(np.asarray(r_true)), 1e-9)


def test_reproj_jacobian_matches_fd(sim):
    args = _reproj_setup(sim, 1, 3)
    z = jnp.zeros((4, 3), dtype=jnp.float64)
    z1 = jnp.asarray(0.0, dtype=jnp.float64)

    def f(xi_ri, xi_pi, xi_rj, xi_pj, d_dinv, d_ld):
        return factors.reproj_residual_tangent(
            xi_ri, xi_pi, xi_rj, xi_pj, d_dinv, d_ld, **args
        )

    jac = jax.jacfwd(f, argnums=(0, 1, 2, 3, 4, 5))(z, z, z, z, z1, z1)
    eps = 1e-7

    # SO3 knots i
    for k in range(4):
        for d in range(3):
            xi = np.zeros((4, 3)); xi[k, d] = eps
            fd = (f(jnp.asarray(xi), z, z, z, z1, z1) - f(jnp.asarray(-xi), z, z, z, z1, z1)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(jac[0][:, k, d]), np.asarray(fd), atol=1e-5)
    # pos knots j
    for k in range(4):
        for d in range(3):
            xi = np.zeros((4, 3)); xi[k, d] = eps
            fd = (f(z, z, z, jnp.asarray(xi), z1, z1) - f(z, z, z, jnp.asarray(-xi), z1, z1)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(jac[3][:, k, d]), np.asarray(fd), atol=1e-5)
    # dinv
    fd = (f(z, z, z, z, z1 + eps, z1) - f(z, z, z, z, z1 - eps, z1)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(jac[4]), np.asarray(fd), atol=1e-5)
    # line delay (scale eps: ld is ~3e-5)
    eld = 1e-9
    fd = (f(z, z, z, z, z1, z1 + eld) - f(z, z, z, z, z1, z1 - eld)) / (2 * eld)
    np.testing.assert_allclose(np.asarray(jac[5]), np.asarray(fd), rtol=1e-4, atol=1e-3)
    # the ld jacobian must be nonzero (observable)
    assert np.linalg.norm(np.asarray(jac[5])) > 1e-4


def test_bias_residual():
    bg_i, bg_j = jnp.asarray([0.1, 0.0, 0.0]), jnp.asarray([0.1, 0.2, 0.0])
    ba_i, ba_j = jnp.zeros(3), jnp.asarray([0.0, 0.0, -0.3])
    si = jnp.full(6, 2.0)
    r = factors.bias_residual(bg_i, bg_j, ba_i, ba_j, si)
    np.testing.assert_allclose(np.asarray(r), [0, 0.4, 0, 0, 0, -0.6], atol=1e-14)


def test_vmapped_factor_batch(sim):
    """Factors batch with vmap — the production assembly path."""
    dt = sim.cfg.knot_dt
    kq, kp = jnp.asarray(sim.knots_q), jnp.asarray(sim.knots_p)
    idx = [10, 60, 110, 160]
    i0u = [_grid(sim.imu_t_ns[m], dt) for m in idx]
    q4 = jnp.stack([kq[i : i + 4] for i, _ in i0u])
    p4 = jnp.stack([kp[i : i + 4] for i, _ in i0u])
    u = jnp.asarray([u for _, u in i0u])
    gy = jnp.asarray(sim.gyro[idx])
    ac = jnp.asarray(sim.accel[idx])
    r = jax.vmap(
        lambda a, b, c, d, e: factors.imu_residual(
            a, b, c, 1.0 / dt, jnp.zeros(3), jnp.zeros(3), d, e,
            jnp.asarray(sim.gravity_vec), jnp.ones(6, dtype=jnp.float64),
        )
    )(q4, p4, u, gy, ac)
    assert r.shape == (4, 6)
    np.testing.assert_allclose(np.asarray(r), np.zeros((4, 6)), atol=1e-9)
