"""IMU preintegration (on-manifold, batched).

Reference parity: /root/reference/dynosam/include/dynosam/frontend/imu/
ImuFrontend.hpp:43-58 (a wrapper over GTSAM's PreintegratedImuMeasurements)
and ThreadSafeImuBuffer. Rebuilt as a fixed-size lax.scan over padded IMU
sample windows — the host buffer hands each frame a (S, 7) array of
[dt, ax, ay, az, gx, gy, gz] rows with a validity mask, and preintegration
runs on device:

    dR_{i+1} = dR_i * exp((w_i - bg) dt)
    dv_{i+1} = dv_i + dR_i (a_i - ba) dt
    dp_{i+1} = dp_i + dv_i dt + 0.5 dR_i (a_i - ba) dt^2

The result feeds (a) the ego-motion solver's rotation prior (R_curr_ref,
EgoMotionSolver) and (b) the constant-velocity/IMU fallback pose prediction
(RGBDInstanceFrontendModule.cc:324-370).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from dynosam_tpu.utils import lie


@flax.struct.dataclass
class ImuParams:
    gravity: jnp.ndarray          # (3,) world gravity, e.g. [0, 0, -9.81]
    accel_bias: jnp.ndarray       # (3,)
    gyro_bias: jnp.ndarray        # (3,)

    @classmethod
    def create(cls, gravity=(0.0, 0.0, -9.81), accel_bias=None, gyro_bias=None):
        return cls(
            gravity=jnp.asarray(gravity, jnp.float32),
            accel_bias=jnp.zeros(3) if accel_bias is None else jnp.asarray(accel_bias),
            gyro_bias=jnp.zeros(3) if gyro_bias is None else jnp.asarray(gyro_bias),
        )


@flax.struct.dataclass
class Pim:
    """Preintegrated IMU measurement between two frames (body frame i)."""

    dR: jnp.ndarray    # (3, 3)
    dv: jnp.ndarray    # (3,)
    dp: jnp.ndarray    # (3,)
    dt: jnp.ndarray    # ()

    @classmethod
    def identity(cls, dtype=jnp.float32):
        return cls(
            dR=jnp.eye(3, dtype=dtype),
            dv=jnp.zeros(3, dtype),
            dp=jnp.zeros(3, dtype),
            dt=jnp.zeros((), dtype),
        )


def preintegrate(samples, valid, params: ImuParams) -> Pim:
    """Integrate a padded IMU window.

    samples: (S, 7) rows [dt, ax, ay, az, gx, gy, gz]; valid: (S,) bool.
    Jittable, fixed shape; invalid rows are skipped (dt treated as 0).
    """
    dt = jnp.where(valid, samples[:, 0], 0.0)
    acc = samples[:, 1:4] - params.accel_bias
    gyr = samples[:, 4:7] - params.gyro_bias

    def step(carry, x):
        dR, dv, dp, T = carry
        dt_i, a_i, w_i = x
        a_rot = lie.rotate_points(dR, a_i)
        dp = dp + dv * dt_i + 0.5 * a_rot * dt_i * dt_i
        dv = dv + a_rot * dt_i
        dR = lie.mm(dR, lie.so3_exp(w_i * dt_i))
        return (dR, dv, dp, T + dt_i), None

    init = (jnp.eye(3, dtype=samples.dtype), jnp.zeros(3, samples.dtype),
            jnp.zeros(3, samples.dtype), jnp.zeros((), samples.dtype))
    (dR, dv, dp, T), _ = jax.lax.scan(step, init, (dt, acc, gyr))
    return Pim(dR=dR, dv=dv, dp=dp, dt=T)


def predict(X_prev, v_prev, pim: Pim, params: ImuParams):
    """NavState propagation: predict pose + velocity at frame k.

    X_prev: (4,4) world_from_body at k-1; v_prev: (3,) world velocity.
    Returns (X_pred (4,4), v_pred (3,)).
    """
    R_prev = lie.rotation(X_prev)
    t_prev = lie.translation(X_prev)
    g = params.gravity
    dt = pim.dt
    t_new = (
        t_prev
        + v_prev * dt
        + 0.5 * g * dt * dt
        + lie.rotate_points(R_prev, pim.dp)
    )
    v_new = v_prev + g * dt + lie.rotate_points(R_prev, pim.dv)
    R_new = lie.mm(R_prev, pim.dR)
    return lie.make_pose(R_new, t_new), v_new


def rotation_prior(pim: Pim):
    """Relative rotation R_{k-1,k} for the 2-point/rotation-prior RANSAC
    (EgoMotionSolver's R_curr_ref option)."""
    return pim.dR


class ImuBuffer:
    """Host-side timestamp-indexed buffer (ThreadSafeImuBuffer analogue).

    Collects (t, accel, gyro) samples and emits fixed-size padded windows
    [t0, t1) for device preintegration.
    """

    def __init__(self, window_capacity: int = 64):
        import collections

        self.capacity = window_capacity
        self._samples = collections.deque(maxlen=100_000)

    def add(self, t: float, accel, gyro):
        self._samples.append((float(t), tuple(accel), tuple(gyro)))

    def window(self, t0: float, t1: float):
        """Padded (S, 7) sample array + (S,) mask for samples in [t0, t1)."""
        import numpy as np

        rows = [(t, a, g) for (t, a, g) in self._samples if t0 <= t < t1][
            : self.capacity
        ]
        out = np.zeros((self.capacity, 7), np.float32)
        mask = np.zeros((self.capacity,), bool)
        # sample i is applied over [t_i, t_{i+1}); the last one extends to t1
        times = [t for (t, _, _) in rows] + [t1]
        for i, (t, a, g) in enumerate(rows):
            out[i, 0] = times[i + 1] - times[i]
            out[i, 1:4] = a
            out[i, 4:7] = g
            mask[i] = True
        return out, mask
