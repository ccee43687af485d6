"""Batched ByteTrack tests: id persistence, occlusion survival, spawning."""

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.nn import bytetrack as bt


def boxes(*tlbrs):
    out = np.zeros((8, 4), np.float32)
    valid = np.zeros((8,), bool)
    for i, b in enumerate(tlbrs):
        out[i] = b
        valid[i] = True
    return jnp.asarray(out), jnp.asarray(valid)


def test_iou():
    a = jnp.array([[0.0, 0, 10, 10]])
    b = jnp.array([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    m = bt.iou_matrix(a, b)
    np.testing.assert_allclose(m[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(m[0, 1], 25.0 / 175.0, atol=1e-5)
    np.testing.assert_allclose(m[0, 2], 0.0, atol=1e-6)


def test_id_persistence_two_objects():
    state = bt.empty_state(16)
    step = jax.jit(bt.bytetrack_step)
    ids_history = []
    for k in range(6):
        # two boxes moving right / left
        b, valid = boxes(
            [10 + 5 * k, 10, 30 + 5 * k, 40],
            [200 - 5 * k, 50, 230 - 5 * k, 90],
        )
        scores = jnp.full((8,), 0.9)
        state, ids = step(state, b, scores, valid)
        ids_history.append(np.asarray(ids[:2]))
    first = ids_history[1]
    assert first[0] > 0 and first[1] > 0 and first[0] != first[1]
    for ids in ids_history[2:]:
        np.testing.assert_array_equal(ids, first)


def test_survives_short_occlusion():
    state = bt.empty_state(16)
    step = jax.jit(bt.bytetrack_step)
    b, valid = boxes([10, 10, 30, 40])
    scores = jnp.full((8,), 0.9)
    state, ids0 = step(state, b, scores, valid)
    tid = int(ids0[0])
    # two frames with no detections
    none = jnp.zeros((8,), bool)
    for _ in range(2):
        state, _ = step(state, b, scores, none)
    # reappears near the same spot
    b2, valid2 = boxes([12, 10, 32, 40])
    state, ids = step(state, b2, scores, valid2)
    assert int(ids[0]) == tid


def test_low_score_second_stage():
    state = bt.empty_state(16)
    step = jax.jit(bt.bytetrack_step)
    b, valid = boxes([10, 10, 30, 40])
    state, ids0 = step(state, b, jnp.full((8,), 0.9), valid)
    tid = int(ids0[0])
    # same box, low score -> matched in stage 2, keeps id, no new track
    state, ids = step(state, b, jnp.full((8,), 0.3), valid)
    assert int(ids[0]) == tid
    assert int(state.next_id) == 2  # no extra track spawned


def test_masks_to_detections():
    mask = jnp.zeros((40, 60), jnp.int32).at[5:15, 10:25].set(2).at[20:30, 40:50].set(5)
    boxes_, scores, valid, labels = bt.masks_to_detections(mask, max_dets=8)
    v = np.asarray(valid)
    assert v[1] and v[4] and v.sum() == 2  # labels 2 and 5
    np.testing.assert_allclose(np.asarray(boxes_[1]), [10, 5, 25, 15], atol=1e-5)
    np.testing.assert_allclose(np.asarray(boxes_[4]), [40, 20, 50, 30], atol=1e-5)


def test_tracker_relabels_untracked_masks():
    """Frontend tracker + ByteTrack: per-frame detector labels without
    temporal identity get persistent object ids."""
    import dataclasses

    from dynosam_tpu.config import FrontendParams, TrackerParams
    from dynosam_tpu.frontend.tracker import empty_tracker_state, track_frame

    params = FrontendParams(
        max_objects=4,
        tracker=TrackerParams(
            max_features_per_frame=64,
            min_features_per_frame=16,
            max_dynamic_features_per_frame=64,
            detection_cell_size=8,
            min_corner_response=1e-9,
            prefer_provided_object_detection=False,
        ),
    )
    H, W = 64, 96
    gray = jnp.asarray(np.random.default_rng(0).random((H, W), np.float32))
    depth = jnp.full((H, W), 8.0)
    flow = jnp.zeros((H, W, 2))

    state = empty_tracker_state(params)
    seen_ids = []
    for k in range(4):
        # one object whose raw label CHANGES every frame (untracked detector)
        raw_label = (k % 3) + 1
        mask = jnp.zeros((H, W), jnp.int32).at[20:40, 30:60].set(raw_label)
        state = track_frame(state, gray, depth, flow, mask, params,
                            first_frame=(k == 0))
        ids = np.asarray(state.obj_ids)
        seen_ids.append(set(ids[ids > 0]))
    # the relabeled object keeps ONE persistent id across frames
    assert len(seen_ids[1]) == 1
    assert seen_ids[1] == seen_ids[2] == seen_ids[3]
