"""IMU pre-integration between keyframes (midpoint rule).

≙ IntegrationBase (`/root/reference/src/visual_odometry/integration_base.h`)
— used by the visual-inertial initializer (gyro-bias least squares and the
linear alignment need the deltas and d(delta_q)/d(bg)); the continuous-time
solver itself never uses pre-integration factors (the reference's
pre-integration *factor* is declared but dead, SURVEY §2.1 C16).

Host-side numpy (runs once per init attempt over ~1 s of IMU).
"""

from __future__ import annotations

import numpy as np

from ctrlvio_tpu.ops import so3
from ctrlvio_tpu.utils.hostmath import on_cpu
import jax.numpy as jnp


class PreIntegration:
    """Delta pose/velocity between two keyframes with gyro-bias Jacobian."""

    def __init__(self, bg=None, ba=None):
        self.bg = np.zeros(3) if bg is None else np.asarray(bg)
        self.ba = np.zeros(3) if ba is None else np.asarray(ba)
        self.reset()

    def reset(self):
        self.dq = np.array([1.0, 0, 0, 0])
        self.dp = np.zeros(3)
        self.dv = np.zeros(3)
        self.sum_dt = 0.0
        self.J_q_bg = np.zeros((3, 3))   # right-tangent d log / d bg
        self._buf = []  # (dt, acc0, gyr0, acc1, gyr1)
        self._last = None

    def push(self, dt, acc, gyr):
        if self._last is None:
            self._last = (np.asarray(acc), np.asarray(gyr))
            return
        acc0, gyr0 = self._last
        self._buf.append((dt, acc0, gyr0, np.asarray(acc), np.asarray(gyr)))
        self._last = (np.asarray(acc), np.asarray(gyr))
        self._step(dt, acc0, gyr0, acc, gyr)

    def _step(self, dt, acc0, gyr0, acc1, gyr1):
        from ctrlvio_tpu.ops import so3np

        w = 0.5 * (gyr0 + gyr1) - self.bg
        dq_new = so3np.boxplus(self.dq, w * dt)
        a0 = so3np.quat_rotate(self.dq, acc0 - self.ba)
        a1 = so3np.quat_rotate(dq_new, acc1 - self.ba)
        a = 0.5 * (a0 + a1)
        # first-order right-tangent recursion (≙ the theta/bg block of the
        # VINS F matrix, `integration_base.h:140-172`):
        #   d theta' = (I - hat(w_mid dt)) d theta - dt * d bg
        self.J_q_bg = (np.eye(3) - _skew(w * dt)) @ self.J_q_bg - dt * np.eye(3)
        self.dp = self.dp + self.dv * dt + 0.5 * a * dt * dt
        self.dv = self.dv + a * dt
        self.dq = dq_new
        self.sum_dt += dt

    def repropagate(self, bg, ba=None):
        """Re-integrate with new biases (≙ IntegrationBase::repropagate)."""
        self.bg = np.asarray(bg)
        if ba is not None:
            self.ba = np.asarray(ba)
        buf = self._buf
        self.reset()
        self._buf = buf
        for dt, a0, g0, a1, g1 in buf:
            self._step(dt, a0, g0, a1, g1)


def _skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0.0]])
