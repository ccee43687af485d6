"""Frontend motion solvers validated against the scenario simulator GT.

Mirrors the reference's backend_runners-style harness: simulator packets feed
the solvers directly, no images needed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.config import MotionSolverParams
from dynosam_tpu.cv import camera as cam
from dynosam_tpu.dataproviders.simulator import Scenario, ScenarioSpec
from dynosam_tpu.frontend import motion
from dynosam_tpu.utils import lie


@pytest.fixture(scope="module")
def scenario():
    return Scenario(ScenarioSpec.default_two_objects(num_frames=6))


@pytest.fixture(scope="module")
def noisy_scenario():
    return Scenario(
        ScenarioSpec.default_two_objects(
            num_frames=6, pixel_noise=0.3, depth_noise=0.01, seed=3
        )
    )


def _prep_static(scn, k):
    """Build ego-motion solver inputs from consecutive packets."""
    pk_1, pk = scn.measurements(k - 1), scn.measurements(k)
    intr = scn.intr
    st_prev, st = pk_1.static_tracks, pk.static_tracks
    pts_cam_prev = cam.backproject(st_prev.uv, st_prev.depth, intr)
    pts_world = lie.transform_points(pk_1.X_world_cam, pts_cam_prev)
    pts_cam_k = cam.backproject(st.uv, st.depth, intr)
    valid = st_prev.valid & st.valid
    return pts_world, st.uv, pts_cam_k, valid, pk


def test_camera_pose_exact(scenario):
    k = 2
    pts_world, uv_k, pts_cam_k, valid, pk = _prep_static(scenario, k)
    params = MotionSolverParams()
    res = motion.solve_camera_pose(
        jax.random.PRNGKey(0), pts_world, uv_k, pts_cam_k, valid,
        scenario.intr, params, X_prior=jnp.eye(4),
    )
    assert bool(res.valid)
    err = lie.local_coordinates(res.pose, scenario.X_gt[k])
    assert float(jnp.linalg.norm(err)) < 1e-3


def test_camera_pose_noisy(noisy_scenario):
    scn = noisy_scenario
    k = 3
    pts_world, uv_k, pts_cam_k, valid, pk = _prep_static(scn, k)
    res = motion.solve_camera_pose(
        jax.random.PRNGKey(1), pts_world, uv_k, pts_cam_k, valid,
        scn.intr, MotionSolverParams(), X_prior=jnp.eye(4),
    )
    assert bool(res.valid)
    err = lie.local_coordinates(res.pose, scn.X_gt[k])
    # translation within ~5 cm, rotation within ~0.01 rad under noise
    assert float(jnp.linalg.norm(err[3:])) < 0.05
    assert float(jnp.linalg.norm(err[:3])) < 0.01


def test_object_motions_exact(scenario):
    scn = scenario
    k = 2
    pk_1, pk = scn.measurements(k - 1), scn.measurements(k)
    intr = scn.intr
    dt_prev, dt = pk_1.dynamic_tracks, pk.dynamic_tracks
    X_prev, X_k = scn.X_gt[k - 1], scn.X_gt[k]
    pts_world_prev = lie.transform_points(
        X_prev, cam.backproject(dt_prev.uv, dt_prev.depth, intr)
    )
    pts_world_k = lie.transform_points(X_k, cam.backproject(dt.uv, dt.depth, intr))
    valid = dt_prev.valid & dt.valid

    results = motion.solve_all_object_motions(
        jax.random.PRNGKey(2),
        pk.object_ids,
        dt.object_id,
        pts_world_prev,
        dt.uv,
        pts_world_k,
        valid,
        X_k,
        intr,
        MotionSolverParams(),
    )
    for j, oid in enumerate(scn.object_ids):
        assert bool(results.valid[j]), f"object {oid} solve failed"
        H_gt = scn.H_gt[j][k]
        err = lie.local_coordinates(results.pose[j], H_gt)
        assert float(jnp.linalg.norm(err)) < 1e-3, f"object {oid}: {err}"
    # padded slots are invalid
    assert not bool(results.valid[len(scn.object_ids)])


def test_camera_fallback_to_prior():
    scn = Scenario(ScenarioSpec.default_two_objects(num_frames=3))
    n = scn.spec.num_static
    prior = lie.se3_exp(jnp.array([0.0, 0.0, 0.0, 1.0, 2.0, 3.0]))
    res = motion.solve_camera_pose(
        jax.random.PRNGKey(0),
        jnp.zeros((n, 3)),
        jnp.zeros((n, 2)),
        jnp.zeros((n, 3)),
        jnp.zeros((n,), bool),  # nothing valid
        scn.intr,
        MotionSolverParams(),
        X_prior=prior,
    )
    assert not bool(res.valid)
    np.testing.assert_allclose(res.pose, prior, atol=1e-6)


def test_solvers_jit_compile(scenario):
    """Whole solve must trace and jit cleanly."""
    scn = scenario
    pts_world, uv_k, pts_cam_k, valid, pk = _prep_static(scn, 1)

    @jax.jit
    def run(key, pw, uv, pc, v):
        return motion.solve_camera_pose(
            key, pw, uv, pc, v, scn.intr, MotionSolverParams(), jnp.eye(4)
        )

    res = run(jax.random.PRNGKey(0), pts_world, uv_k, pts_cam_k, valid)
    assert bool(res.valid)


class TestJointFlowPoseRefine:
    """OpticalFlowAndPoseOptimizer parity: jointly refining pose + flows must
    beat refining the pose against the noisy flows alone."""

    def _make(self, key, N=120, flow_noise=1.5):
        rng = np.random.default_rng(3)
        pts_world = np.stack(
            [
                rng.uniform(-4, 4, N),
                rng.uniform(-2, 2, N),
                rng.uniform(6, 14, N),
            ],
            axis=-1,
        ).astype(np.float32)
        intr = cam.CameraIntrinsics.create(
            fx=300.0, fy=300.0, cx=160.0, cy=120.0, width=320, height=240
        )
        X_true = np.asarray(
            lie.retract(
                jnp.eye(4), jnp.array([0.01, -0.02, 0.005, 0.1, 0.05, 0.3])
            )
        )
        T_cw_true = np.linalg.inv(X_true)
        kp_prev = np.asarray(cam.project(jnp.asarray(pts_world), intr))
        kp_k_true = np.asarray(
            cam.project(
                lie.transform_points(jnp.asarray(T_cw_true), pts_world), intr
            )
        )
        flow_true = kp_k_true - kp_prev
        flow_meas = flow_true + rng.normal(0, flow_noise, flow_true.shape)
        return pts_world, intr, X_true, kp_prev, flow_true, flow_meas

    def test_refines_pose_and_flow(self):
        pts_world, intr, X_true, kp_prev, flow_true, flow_meas = self._make(0)
        params = MotionSolverParams(joint_of_iterations=6)
        valid = jnp.ones(kp_prev.shape[0], bool)
        # start from a perturbed pose
        T0 = lie.retract(
            jnp.asarray(np.linalg.inv(X_true), jnp.float32),
            jnp.array([0.02, -0.015, 0.01, 0.15, -0.1, 0.2]),
        )
        T, f, w = motion.joint_flow_pose_refine(
            T0, jnp.asarray(pts_world), jnp.asarray(kp_prev),
            jnp.asarray(flow_meas, jnp.float32), valid, intr, params,
        )
        # pose error shrinks vs the initial perturbation
        err0 = np.linalg.norm(
            np.asarray(lie.se3_log(lie.compose(T0, jnp.asarray(X_true))))
        )
        err1 = np.linalg.norm(
            np.asarray(lie.se3_log(lie.compose(T, jnp.asarray(X_true))))
        )
        # the flow prior anchors the solution to the (noisy) measurements, so
        # the pose lands near the noise floor rather than exactly at truth
        assert err1 < 0.2 * err0
        # refined flows are closer to the true flow than the measurements
        # (modestly: the flow prior's 1/3.33^2 weight dominates the
        # projection term's 1/10^2, per the reference's sigmas)
        e_meas = np.linalg.norm(flow_meas - flow_true, axis=-1).mean()
        e_ref = np.linalg.norm(np.asarray(f) - flow_true, axis=-1).mean()
        assert e_ref < 0.95 * e_meas
        assert np.asarray(w).min() >= 0

    def test_invalid_mask_is_noop(self):
        pts_world, intr, X_true, kp_prev, flow_true, flow_meas = self._make(1)
        params = MotionSolverParams()
        T0 = jnp.asarray(np.linalg.inv(X_true), jnp.float32)
        T, f, w = motion.joint_flow_pose_refine(
            T0, jnp.asarray(pts_world), jnp.asarray(kp_prev),
            jnp.asarray(flow_meas, jnp.float32),
            jnp.zeros(kp_prev.shape[0], bool), intr, params,
        )
        np.testing.assert_allclose(np.asarray(T), np.asarray(T0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(f), flow_meas, atol=1e-5)
        assert np.all(np.asarray(w) == 0)
