import os

import numpy as np
import pytest

from ctrlvio_tpu.io import config as cfg_mod
from ctrlvio_tpu.io import dataset
from ctrlvio_tpu.sim import synthetic


def test_sequence_roundtrip(tmp_path):
    sim = synthetic.generate(synthetic.SimConfig(duration=1.5, n_landmarks=50, seed=2))
    seq = dataset.from_sim(sim)
    p = str(tmp_path / "seq.npz")
    dataset.save_feature_sequence(p, seq)
    seq2 = dataset.load_sequence(p)
    np.testing.assert_array_equal(seq.imu_t_ns, seq2.imu_t_ns)
    np.testing.assert_array_equal(seq.frame_t_ns, seq2.frame_t_ns)
    assert len(seq2.feat_ids) == len(seq.feat_ids)
    np.testing.assert_allclose(seq.feat_pts[3], seq2.feat_pts[3], atol=0)
    np.testing.assert_array_equal(seq.feat_ids[5], seq2.feat_ids[5])


def test_config_loading(tmp_path):
    cam_yaml = tmp_path / "cam.yaml"
    cam_yaml.write_text(
        "%YAML:1.0\n---\nmodel_type: KANNALA_BRANDT\n"
        "projection_parameters:\n  mu: 739.2\n  mv: 739.1\n  u0: 625.9\n"
        "  v0: 517.3\n  k2: 0.003\n  k3: 0.0\n  k4: 0.0\n  k5: 0.0\n")
    imu_yaml = tmp_path / "imu.yaml"
    imu_yaml.write_text("imu_topic: /imu\ngravity_mag: 9.80766\n")
    main = tmp_path / "main.yaml"
    main.write_text(f"""
config_path: {tmp_path}/
imu_yaml: imu.yaml
camera_yaml: cam.yaml
knot_distance: 0.05
image_weight: 800
gyroscope_noise_density: 4.0e-3
accelerometer_noise_density: 8.0e-2
gyroscope_random_walk: 2.0e-5
accelerometer_random_walk: 4.0e-4
ld_init: 0.0
fix_ld: false
ld_lower: 0.0
ld_upper: 3.5e-5
T_CtoI:
  data: [0.0, -1.0, 0.0, 0.007,
         -1.0, 0.0, 0.0, -0.057,
         0.0, 0.0, -1.0, -0.042,
         0.0, 0.0, 0.0, 1.0]
""")
    vio_cfg, cam, q_CtoI, p_CinI, raw = cfg_mod.load_config(str(main))
    assert vio_cfg.knot_dt == 0.05
    assert vio_cfg.image_weight == 800
    assert vio_cfg.gravity_mag == 9.80766
    assert vio_cfg.ld_upper == 3.5e-5
    from ctrlvio_tpu.models.cameras import Equidistant

    assert isinstance(cam, Equidistant) and cam.mu == 739.2
    np.testing.assert_allclose(p_CinI, [0.007, -0.057, -0.042], atol=0)
    # quaternion maps camera axes per the matrix
    from ctrlvio_tpu.estimator.vio_init import _quat_to_R

    R = _quat_to_R(q_CtoI)
    np.testing.assert_allclose(R, [[0, -1, 0], [-1, 0, 0], [0, 0, -1]], atol=1e-12)
