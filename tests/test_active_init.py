"""Active (orientation-based) IMU initializer (≙ ActiveInitialIMUState,
`inertial_initializer.cpp:60-91`): bootstraps from the IMU's attitude
estimate when the static stillness test can't pass."""

import numpy as np

from ctrlvio_tpu.estimator.initializer import ActiveInitializer
from ctrlvio_tpu.ops import so3np


def test_active_init_gravity_aligns_and_zeroes_yaw():
    rng = np.random.default_rng(2)
    # arbitrary attitude with all of yaw/pitch/roll
    q_true = so3np.quat_exp(np.array([[0.3, -0.2, 0.9]]))[0]
    init = ActiveInitializer(gravity_mag=9.80766)
    st = init.feed(10_000, q_true)
    assert st is not None
    R = so3np.quat_to_matrix(st.q[None])[0]
    R_true = so3np.quat_to_matrix(q_true[None])[0]
    # yaw zeroed
    assert abs(np.arctan2(R[1, 0], R[0, 0])) < 1e-9
    # gravity direction preserved: R and R_true agree up to a world-z spin,
    # so the body-frame gravity (R^T e_z) must match
    np.testing.assert_allclose(R.T @ [0, 0, 1], R_true.T @ [0, 0, 1],
                               atol=1e-12)
    assert np.all(st.bg == 0) and np.all(st.ba == 0)


def test_active_init_rejects_identity_orientation():
    init = ActiveInitializer()
    # x component zero => "no attitude in the message" (reference's gate)
    assert init.feed(0, np.array([1.0, 0.0, 0.0, 0.0])) is None
