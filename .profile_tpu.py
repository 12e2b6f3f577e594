import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_cpu_enable_async_dispatch", True)
import numpy as np, jax.numpy as jnp, time, cProfile, pstats
from ctrlvio_tpu.estimator.initializer import bootstrap_from_sim
from ctrlvio_tpu.estimator.odometry import CtrlVIO, VIOConfig
from ctrlvio_tpu.ops import so3
from ctrlvio_tpu.sim import synthetic
from ctrlvio_tpu.solver.layout import WindowConfig

sim = synthetic.generate(synthetic.SimConfig(duration=8.0, n_landmarks=300, seed=3))
cfg = VIOConfig(window_config=WindowConfig(KW=48, NB=11, LM=256, OBS=768, MIMU=512),
                fix_ld=False, ld_init=0.0, dtype=np.float32)
q_CtoI = np.asarray(so3.quat_exp(jnp.asarray(np.array(sim.cfg.ext_rot))))
vio = CtrlVIO(cfg, q_CtoI, np.array(sim.cfg.ext_pos))
init = bootstrap_from_sim(sim)
for k in range(len(sim.imu_t_ns)):
    vio.process_imu(sim.imu_t_ns[k], sim.gyro[k], sim.accel[k])
vio.set_initial_state(init.t_ns, init.q, init.p, init.bg, init.ba, init.gravity, v0=init.v)
for i, fr in enumerate(sim.frames[:16]):
    vio.process_frame(fr.t_ns, fr.ids, fr.pts, fr.rows)
pr = cProfile.Profile()
pr.enable()
for fr in sim.frames[16:30]:
    vio.process_frame(fr.t_ns, fr.ids, fr.pts, fr.rows)
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(28)
