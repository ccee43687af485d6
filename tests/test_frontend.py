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

pytestmark = pytest.mark.slow  # heavy jit-compile e2e tier


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
        # the object-boundary detection margin excludes silhouette cells, so
        # a ~14 px object at this resolution supports ~10 interior tracks
        assert (oids == 1).sum() >= 8
        assert (oids == 2).sum() >= 8

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


class TestAuxOps:
    def test_propagate_mask(self):
        from dynosam_tpu.frontend.tracker import propagate_mask

        mask = jnp.zeros((20, 30), jnp.int32).at[5:10, 8:14].set(3)
        flow = jnp.full((20, 30, 2), 2.0)  # everything shifts +2 px
        warped = propagate_mask(mask, flow)
        # shifted block occupies rows 7-11, cols 10-15
        assert int(warped[5, 8]) == 0   # vacated top-left corner
        assert int(warped[11, 15]) == 3
        assert int(warped[7, 10]) == 3

    def test_packet_serialization_roundtrip(self, tmp_path):
        from dynosam_tpu.dataproviders.simulator import Scenario, ScenarioSpec
        from dynosam_tpu.frontend.serialization import (
            PacketReplayProvider,
            load_packets,
            save_packets,
        )

        scn = Scenario(ScenarioSpec.default_two_objects(num_frames=3))
        packets = [scn.measurements(k, 4) for k in range(3)]
        p = str(tmp_path / "frontend_packets.npz")
        save_packets(p, packets)
        back = load_packets(p)
        assert len(back) == 3
        np.testing.assert_allclose(
            back[2].X_world_cam, packets[2].X_world_cam, atol=1e-6
        )
        np.testing.assert_array_equal(
            back[1].dynamic_tracks.tracklet_id, packets[1].dynamic_tracks.tracklet_id
        )
        assert len(PacketReplayProvider(p)) == 3

    def test_graph_state_checkpoint(self, tmp_path):
        from dynosam_tpu.backend import graph
        from dynosam_tpu.config import BackendParams
        from dynosam_tpu.frontend.serialization import (
            load_graph_state,
            save_graph_state,
        )

        cfg = BackendParams(max_frames=4, max_objects=2,
                            max_static_landmarks=16, max_dynamic_landmarks=16)
        st = graph.empty_graph(cfg)
        st = st.replace(num_frames=jnp.array(2, jnp.int32),
                        ms=st.ms.at[0].set(jnp.array([1.0, 2.0, 3.0])))
        p = str(tmp_path / "graph.npz")
        save_graph_state(p, st)
        st2 = load_graph_state(p, graph.empty_graph(cfg))
        assert int(st2.num_frames) == 2
        np.testing.assert_allclose(np.asarray(st2.ms[0]), [1.0, 2.0, 3.0])


class TestObservabilityFloor:
    """TrackerParams.min_observable_mask_area (round 5, VERDICT r4 #2).

    During DEEP occlusion an object's visible sliver keeps enough surviving
    tracks to pass min_object_points, yet motions estimated from it are
    garbage (rich fixture: 2.2 m first-motion-after-re-anchor at mask-IoU
    0.065). Below the detection-support floor the frame's observations are
    withheld from the packet entirely, so the backend sees an occlusion gap
    (ref: the per-object track-quality gates feeding requiresSampling,
    FeatureTracker.cc:1018)."""

    OCCL = 3  # frame with the object reduced to a sliver

    def _occlude(self, inp, oid, keep_frac=0.4):
        mask = np.asarray(inp.mask).copy()
        m = mask == oid
        cols = np.nonzero(m.any(axis=0))[0]
        keep = max(2, int(len(cols) * keep_frac))
        if len(cols) > keep:
            kill = np.isin(np.arange(mask.shape[1]), cols[:-keep])
            mask[kill[None, :] & m] = 0
        return inp.replace(mask=jnp.asarray(mask))

    def _run(self, dense, oid, floor):
        params = FrontendParams(
            max_objects=8,
            tracker=TrackerParams(
                max_features_per_frame=256,
                min_features_per_frame=100,
                max_dynamic_features_per_frame=256,
                detection_cell_size=8,
                min_corner_response=1e-6,
                min_observable_mask_area=floor,
            ),
        )
        step = jax.jit(
            lambda st, inp: frontend_step(st, inp, dense.intr, params)
        )
        state = empty_frontend_state(params)
        packets = []
        for k in range(dense.scn.spec.num_frames):
            inp = dense.frame(k)
            if k == self.OCCL:
                inp = self._occlude(inp, oid)
            state, pkt = step(state, inp)
            packets.append(jax.tree.map(np.asarray, pkt))
        return packets

    @pytest.fixture(scope="class")
    def target(self, dense):
        # pick an object present at the occlusion frame + its full mask area
        mask = np.asarray(dense.frame(self.OCCL).mask)
        ids, counts = np.unique(mask[mask > 0], return_counts=True)
        oid = int(ids[np.argmax(counts)])
        return oid, float(counts.max())

    def _emitted(self, pkt, oid):
        dt = pkt.dynamic_tracks
        return bool(np.any(dt.valid & (dt.object_id == oid)))

    def test_sliver_withheld_and_recovers(self, dense, target):
        oid, full_area = target
        packets = self._run(dense, oid, floor=0.6 * full_area)
        # healthy frames before the occlusion emit the object
        assert self._emitted(packets[self.OCCL - 1], oid)
        # the sliver frame is withheld: no dynamic observations, object
        # not in the packet's valid set
        pkt = packets[self.OCCL]
        assert not self._emitted(pkt, oid)
        assert oid not in set(pkt.object_ids[pkt.object_valid].tolist())
        # after recovery the object is observed again
        assert any(
            self._emitted(packets[k], oid)
            for k in range(self.OCCL + 1, len(packets))
        )

    def test_gate_disabled_emits_sliver(self, dense, target):
        oid, _ = target
        packets = self._run(dense, oid, floor=0.0)
        assert self._emitted(packets[self.OCCL], oid)

    def test_fraction_floor_scales_with_image(self, dense, target):
        # (0,1) floors are a fraction of image area — a tiny fraction must
        # behave like "disabled" for a plainly visible object
        oid, _ = target
        packets = self._run(dense, oid, floor=1e-6)
        assert self._emitted(packets[self.OCCL - 1], oid)
