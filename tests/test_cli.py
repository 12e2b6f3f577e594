"""CLI entry points (`python -m ctrlvio_tpu ...`) ≙ the reference's
odometry_node (`odometry_node.cpp:27-49`): config + sequence in, TUM
trajectory out; plus the bag->npz converter."""

import numpy as np
import pytest

from ctrlvio_tpu.__main__ import main as cli_main
from ctrlvio_tpu.io import dataset
from ctrlvio_tpu.sim import synthetic


def _write_config(tmp_path, ld_upper=3.5e-5):
    cam = tmp_path / "cam.yaml"
    cam.write_text("""%YAML:1.0
---
model_type: PINHOLE
image_width: 1280
image_height: 1024
projection_parameters:
   fx: 739.0
   fy: 739.0
   cx: 640.0
   cy: 512.0
max_cnt: 120
min_dist: 20
freq: 10
""")
    imu = tmp_path / "imu.yaml"
    imu.write_text("imu_topic: /imu\ngravity_mag: 9.80766\n")
    main_y = tmp_path / "main.yaml"
    main_y.write_text(f"""config_path: {tmp_path}/
imu_yaml: imu.yaml
camera_yaml: cam.yaml
knot_distance: 0.05
image_weight: 800
gyroscope_noise_density: 4.0e-3
accelerometer_noise_density: 8.0e-2
gyroscope_random_walk: 2.0e-5
accelerometer_random_walk: 4.0e-4
ld_init: 0.0
fix_ld: 0
ld_lower: 0.0
ld_upper: {ld_upper}
T_CtoI:
  data: [1.0, 0.0, 0.0, 0.007,
         0.0, 1.0, 0.0, -0.057,
         0.0, 0.0, 1.0, -0.042,
         0.0, 0.0, 0.0, 1.0]
""")
    return str(main_y)


@pytest.mark.slow
def test_run_cli_feature_sequence(tmp_path):
    """Full CLI path: reference-schema config + feature npz -> TUM file,
    with the visual (SfM + alignment) bootstrap."""
    sim = synthetic.generate(synthetic.SimConfig(
        duration=5.0, n_landmarks=250, seed=11, ext_rot=(0.0, 0.0, 0.0),
        ext_pos=(0.007, -0.057, -0.042)))
    seq_path = tmp_path / "seq.npz"
    dataset.save_feature_sequence(str(seq_path), dataset.from_sim(sim))
    out = tmp_path / "traj.tum"

    cli_main(["run", _write_config(tmp_path), str(seq_path),
              "--out", str(out), "--bootstrap", "visual"])

    data = np.loadtxt(out)
    assert data.shape[0] > 50 and data.shape[1] == 8
    # stamps monotonic, quaternions normalized
    assert np.all(np.diff(data[:, 0]) > 0)
    qn = np.linalg.norm(data[:, 4:8], axis=1)
    assert np.allclose(qn, 1.0, atol=1e-6)


@pytest.mark.slow
def test_lz4_bag_convert_run_roundtrip(tmp_path):
    """The reference's full operating mode, end to end in-files: an
    lz4-compressed rosbag carrying raw RS imagery + IMU -> `convert` CLI ->
    `run` CLI (front-end in-process, gyro-predicted fused tracker) -> TUM
    trajectory (≙ LoadBag/RunBag + odometry_node, odometry_manager.cpp:97-165)."""
    from test_rosbag import write_bag_chunks, _imu_msg, _image_msg

    from ctrlvio_tpu.sim import render, synthetic

    H, W, FX = 256, 320, 200.0
    # moderate handheld motion: enough excitation for VI alignment, slow
    # enough that KLT tracks span the init window (the pipeline under test
    # is the bag->convert->run round trip, not bootstrap stress)
    sim = synthetic.generate(synthetic.SimConfig(
        duration=5.0, n_landmarks=500, seed=5, line_delay=1.15e-4,
        rot_excite=0.05, pos_excite=0.04,
        image_h=H, image_w=W, fx=FX, fy=FX, cx=W / 2, cy=H / 2,
        ext_rot=(0.0, 0.0, 0.0), ext_pos=(0.007, -0.057, -0.042)))
    imgs = render.render_sequence(sim, H, W, FX, FX, W / 2, H / 2, seed=1,
                                  big_every=6, texture=6.0)
    t0 = 1_500_000_000_000_000_000
    msgs = [(0, "/imu0", "sensor_msgs/Imu", t0 + int(sim.imu_t_ns[k]),
             _imu_msg(t0 + int(sim.imu_t_ns[k]), sim.gyro[k], sim.accel[k]))
            for k in range(len(sim.imu_t_ns))]
    msgs += [(1, "/cam0/image_raw", "sensor_msgs/Image",
              t0 + int(fr.t_ns), _image_msg(t0 + int(fr.t_ns), imgs[i]))
             for i, fr in enumerate(sim.frames)]
    msgs.sort(key=lambda m: m[3])
    # several lz4 chunks, like rosbag record
    n = len(msgs)
    chunks = [msgs[: n // 3], msgs[n // 3 : 2 * n // 3], msgs[2 * n // 3 :]]
    bag = tmp_path / "seq.bag"
    write_bag_chunks(str(bag), chunks, compression=b"lz4")

    npz = tmp_path / "seq.npz"
    cli_main(["convert", str(bag), str(npz)])
    seq = dataset.load_sequence(str(npz))
    assert seq.images.shape == (len(sim.frames), H, W)

    cfg = _write_config(tmp_path, ld_upper=2e-4)
    # image size/intrinsics of this sequence
    (tmp_path / "cam.yaml").write_text(f"""%YAML:1.0
---
model_type: PINHOLE
image_width: {W}
image_height: {H}
projection_parameters:
   fx: {FX}
   fy: {FX}
   cx: {W / 2}
   cy: {H / 2}
max_cnt: 110
min_dist: 12
freq: 11
""")
    out = tmp_path / "traj.tum"
    cli_main(["run", cfg, str(npz), "--out", str(out),
              "--bootstrap", "visual"])
    data = np.loadtxt(out)
    assert data.shape[0] > 20 and data.shape[1] == 8
    assert np.all(np.diff(data[:, 0]) > 0)


def test_convert_cli(tmp_path):
    from test_rosbag import write_bag, _imu_msg, _image_msg

    rng = np.random.default_rng(0)
    msgs = []
    for k in range(40):
        t = int(1e9 + k * 5_000_000)
        msgs.append((0, "/imu", "sensor_msgs/Imu", t,
                     _imu_msg(t, rng.normal(0, 1, 3), rng.normal(0, 1, 3))))
    for k in range(4):
        t = int(1e9 + k * 50_000_000)
        img = rng.integers(0, 255, (24, 32), dtype=np.uint8)
        msgs.append((1, "/cam0/image_raw", "sensor_msgs/Image", t,
                     _image_msg(t, img)))
    msgs.sort(key=lambda m: m[3])
    bag = tmp_path / "t.bag"
    write_bag(str(bag), msgs)
    out = tmp_path / "t.npz"
    cli_main(["convert", str(bag), str(out),
              "--imu-topic", "/imu", "--image-topic", "/cam0/image_raw"])
    seq = dataset.load_sequence(str(out))
    assert len(seq.imu_t_ns) == 40
    assert seq.images.shape == (4, 24, 32)
