"""In-graph IMU dead-reckon extension (`stream._extend_inertial`): the
associative-scan integrator must agree with the host-side f64 integrator
(`initializer.dead_reckon_poses`) on the knots it seeds."""

import jax
import jax.numpy as jnp
import numpy as np

from ctrlvio_tpu.estimator import packing, stream
from ctrlvio_tpu.estimator.initializer import InitialState, dead_reckon_poses
from ctrlvio_tpu.sim import synthetic
from ctrlvio_tpu.solver.layout import WindowConfig, WindowParams


def test_extend_inertial_matches_host_deadreckon():
    sim = synthetic.generate(synthetic.SimConfig(
        duration=4.0, n_landmarks=30, seed=3))
    cfg = WindowConfig(KW=32, NB=11, LM=8, OBS=8, MIMU=256, dt=0.05)
    w0, old_hi, new_hi = 10, 20, 22
    dt_ns = int(0.05e9)

    kq = sim.knots_q[w0 : w0 + cfg.KW].copy()
    kp = sim.knots_p[w0 : w0 + cfg.KW].copy()
    kq[old_hi:] = kq[old_hi - 1]  # stale tail the extension must replace
    kp[old_hi:] = kp[old_hi - 1]
    params = WindowParams(
        knots_q=jnp.asarray(kq), knots_p=jnp.asarray(kp),
        bg=jnp.zeros((cfg.NB, 3)), ba=jnp.zeros((cfg.NB, 3)),
        dinv=jnp.zeros(cfg.LM), ld=jnp.asarray(0.0))

    kf_t = np.linspace((w0 + 2) * dt_ns, (w0 + old_hi - 5) * dt_ns,
                       cfg.NB).astype(np.int64)
    t_hi_ns = int((w0 + new_hi - 3) * dt_ns)
    imu = packing.pack_imu_factors(
        sim.imu_t_ns, sim.gyro, sim.accel, kf_t, w0 * dt_ns,
        t_hi_ns + dt_ns, 0.05, w0, cfg, np.float64, on_overflow="subsample")
    sc = stream.StreamScalars(
        marg_old=jnp.asarray(True), knot_shift=jnp.asarray(0, jnp.int32),
        t0_i0=jnp.asarray(0, jnp.int32), t0_f=jnp.asarray(0.0),
        t1_i0=jnp.asarray(0, jnp.int32), t1_f=jnp.asarray(0.0),
        old_hi=jnp.asarray(old_hi, jnp.int32),
        new_hi=jnp.asarray(new_hi, jnp.int32),
        host_seeds=jnp.asarray(False))
    to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    sq, sp = stream._extend_inertial(params, to_j(imu), sc,
                                     jnp.asarray(sim.gravity_vec), cfg)
    sq, sp = np.asarray(sq), np.asarray(sp)

    # host reference: integrate from the same anchor state
    from ctrlvio_tpu.ops import so3np

    re_lo = old_hi - 3
    i0q = re_lo - 4
    t0_rel = i0q * dt_ns
    q4 = kq[i0q : i0q + 4]
    p4 = kp[i0q : i0q + 4]
    q0 = so3np.so3_eval(q4, np.float64(0.0))
    p0 = so3np.rd_eval(p4, np.float64(0.0), 20.0, 0)
    v0 = so3np.rd_eval(p4, np.float64(0.0), 20.0, 1)
    st = InitialState(t_ns=0, q=q0, p=p0, bg=np.zeros(3), ba=np.zeros(3),
                      gravity=sim.gravity_vec, v=v0)
    t_abs0 = (w0 + i0q) * dt_ns
    knot_ts = (np.arange(re_lo, new_hi) - 1 + w0) * dt_ns - t_abs0
    sel = (sim.imu_t_ns > t_abs0) & (sim.imu_t_ns <= t_abs0 + knot_ts.max()
                                     + dt_ns)
    hq, hp = dead_reckon_poses(knot_ts, sim.imu_t_ns[sel] - t_abs0,
                               sim.gyro[sel], sim.accel[sel], st)

    for k, i in enumerate(range(re_lo, new_hi)):
        dp = np.linalg.norm(sp[i] - hp[k])
        dq = np.linalg.norm(so3np.quat_log(so3np.quat_mul(
            so3np.quat_conj(sq[i][None]), hq[k][None]))[0])
        # same anchor, same IMU; Euler-vs-midpoint discretization only
        assert dp < 0.02, (i, dp)
        assert dq < 0.02, (i, dq)
    # and the seeds are close to the TRUE knots (noise-free sim)
    gt_err = np.linalg.norm(sp[re_lo:new_hi]
                            - sim.knots_p[w0 + re_lo : w0 + new_hi], axis=1)
    assert gt_err.max() < 0.05, gt_err
