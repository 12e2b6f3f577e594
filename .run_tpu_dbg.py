import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_cpu_enable_async_dispatch", True)
import numpy as np, jax.numpy as jnp, time
from ctrlvio_tpu.estimator.initializer import bootstrap_from_sim
from ctrlvio_tpu.estimator.odometry import CtrlVIO, VIOConfig
from ctrlvio_tpu.ops import so3
from ctrlvio_tpu.sim import synthetic
from ctrlvio_tpu.solver.layout import WindowConfig

sim = synthetic.generate(synthetic.SimConfig(duration=10.0, n_landmarks=300, seed=3))
cfg = VIOConfig(window_config=WindowConfig(KW=48, NB=11, LM=256, OBS=768, MIMU=512),
                fix_ld=False, ld_init=0.0, dtype=np.float32)
q_CtoI = np.asarray(so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))))
vio = CtrlVIO(cfg, q_CtoI, np.array(sim.cfg.ext_pos))
init = bootstrap_from_sim(sim)
for k in range(len(sim.imu_t_ns)):
    vio.process_imu(sim.imu_t_ns[k], sim.gyro[k], sim.accel[k])
vio.set_initial_state(init.t_ns, init.q, init.p, init.bg, init.ba, init.gravity, v0=init.v)
n_steady = 0; ate = []; times = []
for i, fr in enumerate(sim.frames):
    t0 = time.perf_counter()
    out = vio.process_frame(fr.t_ns, fr.ids, fr.pts, fr.rows)
    dt = time.perf_counter()-t0
    if out is not None:
        _, pg = sim.pose_at(fr.t_ns*1e-9)
        ate.append(np.linalg.norm(out[1]-pg))
    if i == 14: vio.timing.clear()
    if i in (15, 16, 20, 30): print(f"  f{i} prior_cache={vio._build_prior_cpu._cache_size()} dt={dt*1e3:.0f}ms", flush=True)
    if i > 14: n_steady += 1; times.append(dt)
print("steady median ms:", round(np.median(times)*1e3,1), flush=True)
print("steady phases ms:", {k: round(v/max(n_steady,1)*1e3,1) for k,v in vio.timing.items()}, flush=True)
print("ld:", round(vio.traj.line_delay*1e6,3), "pos err tail m:", round(float(np.mean(ate[10:])),5), flush=True)
