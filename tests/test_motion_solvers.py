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
