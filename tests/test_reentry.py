"""Object re-entry / epoch re-keyframing tests (hybrid formulation).

The failure mode (VERDICT r3 #2): an object occluded for a few frames whose
id re-enters used to CHAIN its keyframed motion through the gap — the gap
columns hold identity, so the first post-gap motions were meter-scale wrong
and no optimization mode absorbed them (rich fixture: 95-118 cm AME RMS
driven by re-entry frames). The reference starts a new keyframe range
instead (HybridEstimator.hpp:1154-1177 KeyFrameData; FeatureTracker.cc:1018
requiresSampling re-samples on mask collapse).

Here a break closes the old slot and re-allocates the id on a fresh slot
with a new anchor (graph.py slot_open / update_from_packet_hybrid), and
closed/dead slots recycle at window advance (window.advance_hybrid).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.backend import graph, hybrid, window
from dynosam_tpu.backend.backend import RegularBackend
from dynosam_tpu.config import BackendParams, NoiseParams
from dynosam_tpu.dataproviders.simulator import Scenario, ScenarioSpec
from dynosam_tpu.utils import lie

pytestmark = pytest.mark.slow  # heavy jit-compile e2e tier

MAX_OBJ = 4
OCCLUDED_ID = 2
GAP = range(6, 9)  # frames with object 2 fully occluded
N_FRAMES = 16


def cfg_mode(mode):
    return BackendParams(
        optimization_mode=mode,
        max_frames=N_FRAMES if mode == 0 else 8,
        max_objects=MAX_OBJ,
        max_static_landmarks=256,
        max_dynamic_landmarks=96,
        backend_updater_enum=3,
        noise=NoiseParams(use_range_dependent_noise=False),
    )


@pytest.fixture(scope="module")
def scn():
    return Scenario(
        ScenarioSpec.default_two_objects(
            num_frames=N_FRAMES, pixel_noise=0.3, depth_noise=0.01, seed=7
        )
    )


def occluded_packet(scn, k):
    pkt = scn.measurements(k, MAX_OBJ)
    if k in GAP:
        dt = pkt.dynamic_tracks
        pkt = pkt.replace(
            dynamic_tracks=dt.replace(
                valid=dt.valid & (dt.object_id != OCCLUDED_ID)
            ),
            object_valid=pkt.object_valid & (pkt.object_ids != OCCLUDED_ID),
        )
    return pkt


def gt_f2f(scn, oid, k):
    j = scn.object_ids.index(oid)
    return np.asarray(scn.H_gt[j][k])


class TestReentryEpochs:
    def test_break_allocates_new_epoch_slot(self, scn):
        """At re-entry the old slot closes and the id lands on a fresh slot
        with a new keyframe anchor at the re-entry frame."""
        cfg = cfg_mode(1)
        be = RegularBackend(cfg, scn.intr)
        reentry = GAP[-1] + 1
        for k in range(reentry + 1):
            be.step(occluded_packet(scn, k))
        obj_ids = np.asarray(be.state.obj_ids)
        slots = np.nonzero(obj_ids == OCCLUDED_ID)[0]
        assert len(slots) == 2, f"expected 2 epoch slots, got {obj_ids}"
        open_mask = np.asarray(be.state.slot_open)[slots]
        assert open_mask.sum() == 1, "exactly one epoch slot must stay open"
        j_new = int(slots[np.nonzero(open_mask)[0][0]])
        # fresh anchor at the re-entry frame's window slot
        assert bool(be.state.kf_valid[j_new])
        kf = int(be.state.kf_slot[j_new])
        fids = np.asarray(be.state.frame_ids)
        assert fids[kf] == reentry

    def test_old_epoch_slot_recycles(self, scn):
        """Once the window rolls past the old epoch's last data, its slot
        frees (obj_ids back to a single entry for the id)."""
        cfg = cfg_mode(1)
        be = RegularBackend(cfg, scn.intr)
        for k in range(N_FRAMES):
            be.step(occluded_packet(scn, k))
        obj_ids = np.asarray(be.state.obj_ids)
        assert (obj_ids == OCCLUDED_ID).sum() == 1, (
            f"old epoch slot not recycled: {obj_ids}"
        )
        # the survivor is the open one
        j = int(np.nonzero(obj_ids == OCCLUDED_ID)[0][0])
        assert bool(be.state.slot_open[j])

    @pytest.mark.parametrize("mode", [1, 2])
    def test_post_reentry_motions_accurate(self, scn, mode):
        """Post-re-entry motions must match GT like an unbroken track — no
        meter-scale chaining-through-the-gap errors (the r3 failure)."""
        cfg = cfg_mode(mode)
        be = RegularBackend(cfg, scn.intr)
        for k in range(N_FRAMES):
            be.step(occluded_packet(scn, k))
        be.finalize_matured()
        errs = []
        for k in range(GAP[-1] + 2, N_FRAMES):
            H = be.motion_at(k, object_id=OCCLUDED_ID)
            if H is None:
                continue
            errs.append(
                float(np.linalg.norm((np.linalg.inv(gt_f2f(scn, OCCLUDED_ID, k)) @ H)[:3, 3]))
            )
        assert len(errs) >= 4, "re-entered object must emit motions again"
        assert max(errs) < 0.10, f"post-re-entry motion errors too large: {errs}"
        # the untouched object is unaffected
        errs1 = []
        for k in range(2, N_FRAMES):
            H = be.motion_at(k, object_id=1)
            if H is not None:
                errs1.append(
                    float(np.linalg.norm((np.linalg.inv(gt_f2f(scn, 1, k)) @ H)[:3, 3]))
                )
        assert max(errs1) < 0.05

    def test_no_motion_emitted_inside_gap(self, scn):
        cfg = cfg_mode(1)
        be = RegularBackend(cfg, scn.intr)
        for k in range(N_FRAMES):
            be.step(occluded_packet(scn, k))
        be.finalize_matured()
        for k in list(GAP) + [GAP[-1] + 1]:
            # gap frames AND the re-anchor frame itself have no motion
            assert be.motion_at(k, object_id=OCCLUDED_ID) is None

    def test_unbroken_stream_identical_slots(self, scn):
        """No occlusion -> no epoch machinery engages: one slot per id, all
        open (the slot_open path must be inert on healthy streams)."""
        cfg = cfg_mode(1)
        be = RegularBackend(cfg, scn.intr)
        for k in range(12):
            be.step(scn.measurements(k, MAX_OBJ))
        obj_ids = np.asarray(be.state.obj_ids)
        for oid in scn.object_ids:
            assert (obj_ids == oid).sum() == 1
        assert bool(np.asarray(be.state.slot_open).all())


def flagged_packet(scn, k, flag_frames, oid=OCCLUDED_ID, bias=None):
    """Packet with the requiresSampling epoch trigger set for `oid` at
    `flag_frames`; optionally biases the object's dynamic depths at those
    frames (the partial-occlusion contamination the trigger quarantines)."""
    pkt = scn.measurements(k, MAX_OBJ)
    flag = jnp.asarray(k in flag_frames)
    pkt = pkt.replace(
        object_resampled=(pkt.object_ids == oid) & flag
    )
    if bias is not None and k in flag_frames:
        dt = pkt.dynamic_tracks
        on = dt.valid & (dt.object_id == oid)
        pkt = pkt.replace(
            dynamic_tracks=dt.replace(
                depth=jnp.where(on, dt.depth + bias, dt.depth)
            )
        )
    return pkt


class TestResampleTrigger:
    """requiresSampling mask-IoU epoch trigger (round 5; reference
    FeatureTracker.cc:1018 + HybridEstimator.hpp:1154-1177): a flagged
    packet closes the object's epoch even though its motion chain is
    intact — the partial-occlusion case the chain-break path cannot see."""

    def test_flag_closes_epoch_and_reanchors(self, scn):
        cfg = cfg_mode(1)
        be = RegularBackend(cfg, scn.intr)
        trigger = 5
        for k in range(trigger + 2):
            be.step(flagged_packet(scn, k, {trigger}))
        obj_ids = np.asarray(be.state.obj_ids)
        slots = np.nonzero(obj_ids == OCCLUDED_ID)[0]
        assert len(slots) == 2, f"expected 2 epoch slots, got {obj_ids}"
        open_mask = np.asarray(be.state.slot_open)[slots]
        assert open_mask.sum() == 1
        j_new = int(slots[np.nonzero(open_mask)[0][0]])
        assert bool(be.state.kf_valid[j_new])
        fids = np.asarray(be.state.frame_ids)
        assert fids[int(be.state.kf_slot[j_new])] == trigger

    def test_rate_limited_by_epoch_age(self, scn):
        """Consecutive flags within reanchor_min_epoch_len close only once."""
        cfg = dataclasses.replace(cfg_mode(1), reanchor_min_epoch_len=3)
        be = RegularBackend(cfg, scn.intr)
        for k in range(8):
            be.step(flagged_packet(scn, k, {5, 6, 7}))
        obj_ids = np.asarray(be.state.obj_ids)
        # one original epoch + exactly one re-anchor (6 and 7 rate-limited)
        assert (obj_ids == OCCLUDED_ID).sum() == 2, f"{obj_ids}"

    def test_trigger_disabled_is_inert(self, scn):
        cfg = dataclasses.replace(cfg_mode(1), reanchor_on_resample=False)
        be = RegularBackend(cfg, scn.intr)
        for k in range(8):
            be.step(flagged_packet(scn, k, {5}))
        obj_ids = np.asarray(be.state.obj_ids)
        assert (obj_ids == OCCLUDED_ID).sum() == 1

    @pytest.mark.parametrize("mode", [1])
    def test_contaminated_frames_quarantined(self, scn, mode):
        """Partial-occlusion contamination (biased depths on flagged frames)
        must not leak into neighbouring motions when the trigger is on; with
        the trigger off the keyframed chain drags the error along the epoch."""
        bad = {6, 7}

        def run(reanchor):
            cfg = dataclasses.replace(
                cfg_mode(mode), reanchor_on_resample=reanchor
            )
            be = RegularBackend(cfg, scn.intr)
            for k in range(N_FRAMES):
                be.step(flagged_packet(scn, k, bad, bias=0.8))
            be.finalize_matured()
            errs = {}
            for k in range(2, N_FRAMES):
                H = be.motion_at(k, object_id=OCCLUDED_ID)
                if H is not None:
                    errs[k] = float(np.linalg.norm(
                        (np.linalg.inv(gt_f2f(scn, OCCLUDED_ID, k)) @ H)[:3, 3]
                    ))
            return errs

        e_on = run(True)
        e_off = run(False)
        # with the trigger, the contaminated frame's motion is dropped (the
        # re-anchor frame has no motion variable) and the frames AFTER the
        # re-anchor are clean
        post_on = [e for k, e in e_on.items() if k >= 9]
        post_off = [e for k, e in e_off.items() if k >= 9]
        assert len(post_on) >= 4
        assert max(post_on) < 0.10, f"post-reanchor errors: {e_on}"
        # the off-path must show the leak this test quarantines (if this
        # starts passing without the trigger, the fixture is too easy)
        assert max(post_off + [0.0]) > max(post_on), (
            f"contamination did not leak without the trigger: on={e_on} "
            f"off={e_off}"
        )
