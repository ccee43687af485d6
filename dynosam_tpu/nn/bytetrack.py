"""Batched ByteTrack: Kalman-filtered multi-object tracking, fully jittable.

Reference parity: the vendored ByteTracker in dynosam_nn
(/root/reference/dynosam_nn/src/trackers/byte_tracker/{ByteTracker.cc:495,
KalmanFilter.cc, STrack.cc, lapjv.cc:319} + wrapper ObjectTracker.hpp:39),
which assigns persistent object ids to per-frame instance detections.

TPU-native design: fixed-capacity track table, batched 8-state constant-
velocity Kalman filters (cx, cy, aspect, h, and velocities), IoU association
with ByteTrack's two-stage high/low-score matching, and a greedy globally-
ordered assignment (a fixed-iteration argmax loop) in place of lapjv — for
IoU cost matrices greedy matches the Hungarian solution except in rare
near-tie configurations, and it is branch-free.

Used when instance masks arrive *without* persistent ids
(prefer_provided_object_detection: false); with dyno-preprocessed datasets
the masks already carry tracked ids and this module is bypassed
(README.md:247).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class ByteTrackParams:
    high_thresh: float = 0.6       # score above -> first association stage
    low_thresh: float = 0.1        # score above -> second stage
    match_iou: float = 0.3         # min IoU to accept a match
    new_track_thresh: float = 0.7  # min score to spawn a track
    max_time_lost: int = 30


@flax.struct.dataclass
class ByteTrackState:
    mean: jnp.ndarray        # (T, 8) KF mean [cx, cy, a, h, vx, vy, va, vh]
    cov: jnp.ndarray         # (T, 8, 8)
    track_id: jnp.ndarray    # (T,) int32, -1 = free
    time_lost: jnp.ndarray   # (T,) int32 frames since last match
    active: jnp.ndarray      # (T,) bool
    next_id: jnp.ndarray     # () int32


def empty_state(capacity: int = 32) -> ByteTrackState:
    return ByteTrackState(
        mean=jnp.zeros((capacity, 8)),
        cov=jnp.tile(jnp.eye(8), (capacity, 1, 1)),
        track_id=jnp.full((capacity,), -1, jnp.int32),
        time_lost=jnp.zeros((capacity,), jnp.int32),
        active=jnp.zeros((capacity,), bool),
        next_id=jnp.array(1, jnp.int32),
    )


# ---------------------------------------------------------------------------
# Kalman filter (ByteTrack's constant-velocity model in [cx, cy, a, h])
# ---------------------------------------------------------------------------

_STD_W_POS = 1.0 / 20
_STD_W_VEL = 1.0 / 160


def _motion_mats(dtype=jnp.float32):
    F = jnp.eye(8, dtype=dtype).at[:4, 4:].set(jnp.eye(4, dtype=dtype))
    Hm = jnp.eye(8, dtype=dtype)[:4]
    return F, Hm


def kf_initiate(xyah):
    mean = jnp.concatenate([xyah, jnp.zeros_like(xyah)], axis=-1)
    h = xyah[..., 3]
    std = jnp.stack(
        [2 * _STD_W_POS * h, 2 * _STD_W_POS * h, jnp.full_like(h, 1e-2),
         2 * _STD_W_POS * h, 10 * _STD_W_VEL * h, 10 * _STD_W_VEL * h,
         jnp.full_like(h, 1e-5), 10 * _STD_W_VEL * h],
        axis=-1,
    )
    cov = jnp.eye(8) * (std[..., None] ** 2)
    return mean, cov


def kf_predict(mean, cov):
    F, _ = _motion_mats(mean.dtype)
    h = mean[..., 3]
    q = jnp.stack(
        [_STD_W_POS * h, _STD_W_POS * h, jnp.full_like(h, 1e-2), _STD_W_POS * h,
         _STD_W_VEL * h, _STD_W_VEL * h, jnp.full_like(h, 1e-5), _STD_W_VEL * h],
        axis=-1,
    )
    Q = jnp.eye(8) * (q[..., None] ** 2)
    mean = jnp.einsum("ij,...j->...i", F, mean)
    cov = jnp.einsum("ij,...jk,lk->...il", F, cov, F) + Q
    return mean, cov


def kf_update(mean, cov, z_xyah):
    _, Hm = _motion_mats(mean.dtype)
    h = mean[..., 3]
    r = jnp.stack(
        [_STD_W_POS * h, _STD_W_POS * h, jnp.full_like(h, 1e-1), _STD_W_POS * h],
        axis=-1,
    )
    R = jnp.eye(4) * (r[..., None] ** 2)
    S = jnp.einsum("ij,...jk,lk->...il", Hm, cov, Hm) + R
    K = jnp.einsum("...ij,kj,...kl->...il", cov, Hm, jnp.linalg.inv(S))
    innov = z_xyah - jnp.einsum("ij,...j->...i", Hm, mean)
    mean = mean + jnp.einsum("...ij,...j->...i", K, innov)
    cov = cov - jnp.einsum("...ij,jk,...kl->...il", K, Hm, cov)
    return mean, cov


# ---------------------------------------------------------------------------
# Boxes + IoU
# ---------------------------------------------------------------------------

def tlbr_to_xyah(b):
    w = b[..., 2] - b[..., 0]
    h = b[..., 3] - b[..., 1]
    return jnp.stack(
        [b[..., 0] + 0.5 * w, b[..., 1] + 0.5 * h,
         w / jnp.clip(h, 1e-6, None), h],
        axis=-1,
    )


def xyah_to_tlbr(s):
    w = s[..., 2] * s[..., 3]
    h = s[..., 3]
    return jnp.stack(
        [s[..., 0] - 0.5 * w, s[..., 1] - 0.5 * h,
         s[..., 0] + 0.5 * w, s[..., 1] + 0.5 * h],
        axis=-1,
    )


def iou_matrix(a, b):
    """a: (T, 4) tlbr, b: (D, 4) tlbr -> (T, D)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / jnp.clip(area_a[:, None] + area_b[None, :] - inter, 1e-9, None)


def greedy_assign(cost, row_ok, col_ok, min_iou, iters):
    """Greedy max-IoU assignment. Returns (row_to_col (T,), col_to_row (D,)).

    Fixed-iteration argmax loop (lapjv replacement, see module docstring)."""
    T, D = cost.shape
    NEG = -jnp.inf

    def body(_, carry):
        c, r2c, c2r = carry
        flat = jnp.argmax(c)
        i, j = flat // D, flat % D
        ok = c[i, j] >= min_iou
        r2c = r2c.at[i].set(jnp.where(ok, j, r2c[i]))
        c2r = c2r.at[j].set(jnp.where(ok, i, c2r[j]))
        c = jnp.where(ok, c.at[i, :].set(NEG).at[:, j].set(NEG), c.at[i, j].set(NEG))
        return c, r2c, c2r

    c0 = jnp.where(row_ok[:, None] & col_ok[None, :], cost, NEG)
    init = (c0, jnp.full((T,), -1, jnp.int32), jnp.full((D,), -1, jnp.int32))
    _, r2c, c2r = jax.lax.fori_loop(0, iters, body, init)
    return r2c, c2r


# ---------------------------------------------------------------------------
# Main step
# ---------------------------------------------------------------------------

def bytetrack_step(
    state: ByteTrackState,
    det_tlbr,          # (D, 4)
    det_score,         # (D,)
    det_valid,         # (D,) bool
    params: ByteTrackParams = ByteTrackParams(),
):
    """One tracking step. Returns (state, det_track_ids (D,) int32, -1 = none)."""
    T = state.track_id.shape[0]
    D = det_tlbr.shape[0]

    mean, cov = kf_predict(state.mean, state.cov)
    track_boxes = xyah_to_tlbr(mean)
    iou = iou_matrix(track_boxes, det_tlbr)

    # stage 1: high-score detections vs all tracks
    high = det_valid & (det_score >= params.high_thresh)
    r2c1, c2r1 = greedy_assign(
        iou, state.active, high, params.match_iou, iters=min(T, D)
    )
    matched_row1 = r2c1 >= 0
    # stage 2: low-score detections vs remaining tracks
    low = det_valid & (det_score >= params.low_thresh) & (det_score < params.high_thresh)
    r2c2, c2r2 = greedy_assign(
        iou, state.active & ~matched_row1, low, params.match_iou, iters=min(T, D)
    )
    r2c = jnp.where(matched_row1, r2c1, r2c2)
    matched_row = r2c >= 0
    det_of_row = jnp.clip(r2c, 0, D - 1)

    # KF update for matched tracks
    z = tlbr_to_xyah(det_tlbr[det_of_row])
    mean_u, cov_u = kf_update(mean, cov, z)
    mean = jnp.where(matched_row[:, None], mean_u, mean)
    cov = jnp.where(matched_row[:, None, None], cov_u, cov)
    time_lost = jnp.where(matched_row, 0, state.time_lost + 1)
    active = state.active & (time_lost <= params.max_time_lost)

    # spawn new tracks for unmatched high-score detections
    det_matched = (c2r1 >= 0) | (c2r2 >= 0)
    spawn = high & ~det_matched & (det_score >= params.new_track_thresh)
    free = ~active
    free_rank = jnp.cumsum(free) - 1
    spawn_rank = jnp.cumsum(spawn) - 1
    # row r (free rank q) takes the q-th spawning detection
    n_spawn = jnp.sum(spawn)
    spawn_det_by_rank = jnp.full((D,), -1, jnp.int32).at[
        jnp.where(spawn, spawn_rank, D)
    ].set(jnp.arange(D, dtype=jnp.int32), mode="drop")
    take = free & (free_rank < n_spawn)
    det_idx = spawn_det_by_rank[jnp.clip(free_rank, 0, D - 1)]
    det_idx = jnp.where(take, det_idx, 0)
    m0, c0 = kf_initiate(tlbr_to_xyah(det_tlbr[det_idx]))
    mean = jnp.where(take[:, None], m0, mean)
    cov = jnp.where(take[:, None, None], c0, cov)
    new_ids = state.next_id + spawn_rank[jnp.clip(det_idx, 0, D - 1)]
    track_id = jnp.where(take, new_ids, state.track_id)
    active = active | take
    time_lost = jnp.where(take, 0, time_lost)
    next_id = state.next_id + n_spawn

    # per-detection output ids
    det_row = jnp.where(c2r1 >= 0, c2r1, c2r2)
    det_ids = jnp.where(det_row >= 0, track_id[jnp.clip(det_row, 0, T - 1)], -1)
    # newly spawned detections get their fresh ids
    det_ids = jnp.where(
        spawn, state.next_id + spawn_rank.astype(jnp.int32), det_ids
    )

    new_state = ByteTrackState(
        mean=mean, cov=cov, track_id=track_id,
        time_lost=time_lost, active=active, next_id=next_id,
    )
    return new_state, det_ids


def masks_to_detections(mask, max_dets: int = 32):
    """Instance mask -> padded (boxes tlbr, scores, valid, labels).

    Bridges an untracked segmentation output to ByteTrack: each distinct
    positive label becomes one detection (score 1.0). Labels are assumed
    small ints (< max_dets * 8)."""
    H, W = mask.shape
    max_label = max_dets * 8
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    labels = jnp.arange(1, max_dets + 1, dtype=jnp.int32)

    def per_label(lbl):
        m = mask == lbl
        any_m = jnp.any(m)
        big = jnp.float32(1e9)
        x1 = jnp.min(jnp.where(m, u, big))
        y1 = jnp.min(jnp.where(m, v, big))
        x2 = jnp.max(jnp.where(m, u, -big))
        y2 = jnp.max(jnp.where(m, v, -big))
        return jnp.where(any_m, jnp.stack([x1, y1, x2 + 1, y2 + 1]), jnp.zeros(4)), any_m

    boxes, valid = jax.vmap(per_label)(labels)
    return boxes, jnp.ones((max_dets,)), valid, labels
