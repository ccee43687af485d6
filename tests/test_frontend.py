"""End-to-end frontend tests on the dense synthetic scene: tracking from
images + camera/object motion estimation vs analytic ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.config import FrontendParams, TrackerParams
from dynosam_tpu.dataproviders.synthetic_dense import default_dense_scenario
from dynosam_tpu.frontend.frontend import empty_frontend_state, frontend_step
from dynosam_tpu.utils import lie


@pytest.fixture(scope="module")
def dense():
    return default_dense_scenario(num_frames=6)


@pytest.fixture(scope="module")
def params():
    return FrontendParams(
        max_objects=8,
        tracker=TrackerParams(
            max_features_per_frame=256,
            min_features_per_frame=100,
            max_dynamic_features_per_frame=256,
            detection_cell_size=8,
            min_corner_response=1e-6,
        ),
    )


@pytest.fixture(scope="module")
def run(dense, params):
    step = jax.jit(
        lambda st, inp: frontend_step(st, inp, dense.intr, params)
    )
    state = empty_frontend_state(params)
    packets = []
    for k in range(dense.scn.spec.num_frames):
        state, pkt = step(state, dense.frame(k))
        packets.append(jax.tree.map(np.asarray, pkt))
    return state, packets


class TestTracking:
    def test_static_features_populated(self, run):
        _, packets = run
        for pkt in packets:
            assert pkt.static_tracks.valid.sum() >= 100

    def test_dynamic_features_on_objects(self, run):
        _, packets = run
        pkt = packets[2]
        oids = pkt.dynamic_tracks.object_id[pkt.dynamic_tracks.valid]
        assert set(np.unique(oids)) <= {1, 2}
        assert (oids == 1).sum() > 10
        assert (oids == 2).sum() > 10

    def test_object_slots_stable(self, run):
        _, packets = run
        ids_per_frame = [set(p.object_ids[p.object_ids > 0]) for p in packets[1:]]
        for ids in ids_per_frame[1:]:
            assert ids == {1, 2}

    def test_tracklets_persist(self, run):
        _, packets = run
        a, b = packets[3].static_tracks, packets[4].static_tracks
        both = a.valid & b.valid & (a.tracklet_id == b.tracklet_id)
        assert both.sum() >= 80  # most features survive a frame


class TestMotion:
    def test_camera_trajectory(self, run, dense):
        _, packets = run
        for k in range(1, len(packets)):
            assert bool(packets[k].pose_valid)
            err = lie.local_coordinates(
                jnp.asarray(packets[k].X_world_cam), dense.scn.X_gt[k]
            )
            # billboard quantization keeps this at the few-mm level
            assert float(jnp.linalg.norm(err)) < 0.03, f"frame {k}"

    def test_object_motions(self, run, dense):
        _, packets = run
        hits = 0
        for k in range(2, len(packets)):
            pkt = packets[k]
            for j, oid in enumerate(dense.scn.object_ids):
                slots = np.nonzero(pkt.object_ids == oid)[0]
                if len(slots) == 0 or not pkt.object_valid[slots[0]]:
                    continue
                H_est = jnp.asarray(pkt.object_motions[slots[0]])
                err = lie.local_coordinates(H_est, dense.scn.H_gt[j][k])
                # world-frame H translation error scales with the object's
                # distance from the origin (lever arm) x rotation error from
                # billboard depth quantization; the backend refines this.
                assert float(jnp.linalg.norm(err)) < 0.2, (k, oid)
                hits += 1
        assert hits >= 4  # motions actually estimated for both objects

    def test_odometry_consistency(self, run):
        _, packets = run
        for k in range(1, len(packets)):
            X_prev = jnp.asarray(packets[k - 1].X_world_cam)
            X_k = jnp.asarray(packets[k].X_world_cam)
            odom = jnp.asarray(packets[k].odom_prev_curr)
            np.testing.assert_allclose(
                lie.compose(X_prev, odom), X_k, atol=1e-5
            )
