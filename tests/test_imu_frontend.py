"""IMU wired into the frontend: preintegrated prediction as prior/fallback
and the known-rotation RANSAC mode.

Reference behaviours covered:
  * per-frame preintegration (RGBDInstanceFrontendModule.cc:135)
  * IMU nav-state fallback when PnP fails (:324-370)
  * EgoMotionSolver rotation-prior mode (MotionSolver.cc:216-311)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.config import (
    FrontendParams,
    ImuConfig,
    MotionSolverParams,
    RansacParams,
    TrackerParams,
)
from dynosam_tpu.cv import camera as cam
from dynosam_tpu.dataproviders.simulator import Scenario, ScenarioSpec
from dynosam_tpu.frontend import imu as imu_mod
from dynosam_tpu.frontend import motion
from dynosam_tpu.frontend.frontend import empty_frontend_state, frontend_step
from dynosam_tpu.frontend.types import FrameInputs
from dynosam_tpu.utils import lie

pytestmark = pytest.mark.slow  # heavy jit-compile e2e tier

GRAVITY = (0.0, 9.81, 0.0)


def _varying_spec(num_frames=6):
    # twists change every interval: the constant-velocity model is wrong,
    # the IMU (which measures the true motion) is right
    twists = np.stack(
        [
            np.array(
                [0.0, 0.02 * ((-1) ** k), 0.0, 0.05 * k, 0.0, 0.3 + 0.08 * k],
                np.float32,
            )
            for k in range(num_frames - 1)
        ]
    )
    return ScenarioSpec(
        num_frames=num_frames, num_static=64, camera_motion_xi=twists
    )


class TestImuGenerator:
    def test_preintegration_predicts_gt_pose(self):
        scn = Scenario(_varying_spec())
        params = imu_mod.ImuParams.create(gravity=GRAVITY)
        for k in range(1, scn.spec.num_frames):
            samples, valid = scn.imu_window(k, n_samples=64, gravity=GRAVITY)
            pim = imu_mod.preintegrate(samples, valid, params)
            X_pred, _ = imu_mod.predict(
                scn.X_gt[k - 1], scn.camera_velocity(k - 1), pim, params
            )
            X_gt = np.asarray(scn.X_gt[k])
            X_pred = np.asarray(X_pred)
            assert np.linalg.norm(X_pred[:3, 3] - X_gt[:3, 3]) < 2e-3
            dR = X_pred[:3, :3].T @ X_gt[:3, :3]
            # Frobenius distance to identity ~ sqrt(2)*angle; arccos of the
            # trace is numerically useless near identity in f32
            assert np.linalg.norm(dR - np.eye(3)) < 2e-3


class TestKnownRotationSolve:
    def test_rotation_pinned_recovers_pose(self):
        rng = np.random.default_rng(0)
        intr = cam.CameraIntrinsics.create(300.0, 300.0, 160.0, 120.0, 320, 240)
        X_gt = lie.se3_exp(jnp.asarray([0.02, -0.03, 0.01, 0.4, -0.1, 0.3]))
        p_w = jnp.asarray(
            rng.uniform([-5, -3, 4], [5, 3, 20], (64, 3)), jnp.float32
        )
        T_cw = lie.inverse(X_gt)
        p_c = lie.transform_points(T_cw, p_w)
        uv = cam.project(p_c, intr)
        valid = jnp.ones((64,), bool)
        res = motion.solve_camera_pose(
            jax.random.PRNGKey(0),
            p_w,
            uv,
            p_c,
            valid,
            intr,
            MotionSolverParams(camera=RansacParams(ransac_iterations=32)),
            jnp.eye(4),
            R_known=jnp.swapaxes(lie.rotation(X_gt), -1, -2),
        )
        assert bool(res.valid)
        err = np.asarray(res.pose) - np.asarray(X_gt)
        assert np.abs(err).max() < 1e-3


def _imu_params(use_imu: bool, cripple_pnp: bool):
    ransac = RansacParams(
        ransac_iterations=32,
        min_inliers=10**6 if cripple_pnp else 5,
    )
    return FrontendParams(
        max_objects=4,
        use_imu=use_imu,
        imu=ImuConfig(gravity=GRAVITY),
        tracker=TrackerParams(
            max_features_per_frame=64,
            max_dynamic_features_per_frame=32,
            detection_cell_size=8,
            min_corner_response=1e-9,
        ),
        motion_solver=MotionSolverParams(camera=ransac),
    )


class TestImuFallback:
    """When PnP fails, the pose must fall back to the IMU prediction (not the
    constant-velocity model) — decisive on a varying-twist trajectory."""

    def _one_step(self, use_imu: bool):
        scn = Scenario(_varying_spec())
        k = 3
        params = _imu_params(use_imu, cripple_pnp=True)
        intr = cam.CameraIntrinsics.create(100.0, 100.0, 64.0, 48.0, 128, 96)
        state = empty_frontend_state(params)
        # state as if frames 0..k-1 were solved perfectly
        state = state.replace(
            X_prev=scn.X_gt[k - 1],
            X_prev_prev=scn.X_gt[k - 2],
            frame_idx=jnp.asarray(k, jnp.int32),
            v_world=scn.camera_velocity(k - 1),
        )
        samples, valid = scn.imu_window(k, n_samples=64, gravity=GRAVITY)
        # images that produce NO tracks (zero depth kills every candidate)
        H, W = 96, 128
        inputs = FrameInputs(
            frame_id=jnp.asarray(k, jnp.int32),
            rgb=jnp.zeros((H, W, 3), jnp.float32),
            depth=jnp.zeros((H, W), jnp.float32),
            flow=jnp.zeros((H, W, 2), jnp.float32),
            mask=jnp.zeros((H, W), jnp.int32),
            imu_samples=samples,
            imu_valid=valid,
        )
        _, pkt = frontend_step(state, inputs, intr, params)
        return np.asarray(pkt.X_world_cam), np.asarray(scn.X_gt[k]), scn, k

    def test_imu_fallback_matches_gt(self):
        X_est, X_gt, _, _ = self._one_step(use_imu=True)
        assert np.linalg.norm(X_est[:3, 3] - X_gt[:3, 3]) < 5e-3

    def test_constant_velocity_fallback_is_worse(self):
        X_cv, X_gt, scn, k = self._one_step(use_imu=False)
        err_cv = np.linalg.norm(X_cv[:3, 3] - X_gt[:3, 3])
        X_imu, _, _, _ = self._one_step(use_imu=True)
        err_imu = np.linalg.norm(X_imu[:3, 3] - X_gt[:3, 3])
        # the twist changes between intervals, so CV extrapolation must err
        assert err_cv > 5 * err_imu
        assert err_cv > 0.02
