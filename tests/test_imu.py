"""IMU preintegration tests against analytic trajectories."""

import jax.numpy as jnp
import numpy as np

from dynosam_tpu.frontend import imu
from dynosam_tpu.utils import lie


def make_samples(n, dt, accel, gyro):
    s = np.zeros((n, 7), np.float32)
    s[:, 0] = dt
    s[:, 1:4] = accel
    s[:, 4:7] = gyro
    return jnp.asarray(s), jnp.ones((n,), bool)


def test_pure_rotation():
    params = imu.ImuParams.create(gravity=(0, 0, 0))
    w = np.array([0.0, 0.0, 0.5])  # rad/s about z
    samples, valid = make_samples(100, 0.01, [0, 0, 0], w)
    pim = imu.preintegrate(samples, valid, params)
    R_expected = lie.so3_exp(jnp.asarray(w * 1.0))
    np.testing.assert_allclose(pim.dR, R_expected, atol=1e-4)
    np.testing.assert_allclose(pim.dt, 1.0, atol=1e-6)
    np.testing.assert_allclose(pim.dp, 0.0, atol=1e-6)


def test_constant_accel():
    params = imu.ImuParams.create(gravity=(0, 0, 0))
    a = np.array([1.0, 0.0, 0.0])
    samples, valid = make_samples(200, 0.005, a, [0, 0, 0])
    pim = imu.preintegrate(samples, valid, params)
    # after 1s: v = 1, p = 0.5 (Euler integration converges to these)
    np.testing.assert_allclose(pim.dv, [1.0, 0, 0], atol=1e-3)
    np.testing.assert_allclose(pim.dp, [0.5, 0, 0], atol=5e-3)


def test_gravity_prediction():
    # stationary body measuring +9.81 up (specific force cancels gravity)
    params = imu.ImuParams.create(gravity=(0, 0, -9.81))
    samples, valid = make_samples(100, 0.01, [0, 0, 9.81], [0, 0, 0])
    pim = imu.preintegrate(samples, valid, params)
    X0 = lie.identity()
    X1, v1 = imu.predict(X0, jnp.zeros(3), pim, params)
    np.testing.assert_allclose(lie.translation(X1), 0.0, atol=1e-3)
    np.testing.assert_allclose(v1, 0.0, atol=1e-3)


def test_bias_subtraction():
    params = imu.ImuParams.create(gravity=(0, 0, 0), gyro_bias=[0, 0, 0.1])
    samples, valid = make_samples(100, 0.01, [0, 0, 0], [0, 0, 0.1])
    pim = imu.preintegrate(samples, valid, params)
    np.testing.assert_allclose(pim.dR, jnp.eye(3), atol=1e-5)


def test_padding_mask():
    params = imu.ImuParams.create(gravity=(0, 0, 0))
    samples, valid = make_samples(50, 0.01, [2.0, 0, 0], [0, 0, 0])
    valid = valid.at[25:].set(False)  # only first 25 valid
    pim = imu.preintegrate(samples, valid, params)
    np.testing.assert_allclose(pim.dt, 0.25, atol=1e-6)
    np.testing.assert_allclose(pim.dv, [0.5, 0, 0], atol=1e-4)


def test_buffer_windows():
    buf = imu.ImuBuffer(window_capacity=16)
    for i in range(20):
        buf.add(i * 0.01, [0, 0, 1], [0, 0, 0.2])
    samples, mask = buf.window(0.05, 0.10)
    assert mask.sum() == 5
    np.testing.assert_allclose(samples[mask][:, 0].sum(), 0.05, atol=1e-6)
