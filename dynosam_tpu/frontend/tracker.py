"""Dense-flow feature tracker over fixed-capacity track tables.

TPU-native rebuild of the reference's FeatureTracker
(/root/reference/dynosam/src/frontend/vision/FeatureTracker.cc): the
per-feature loops (`trackDynamic`:339-498 flow lookup + label consistency +
age recycling, static tracking, `sampleDynamic`:864, detection via
GFTT+ANMS into an occupancy grid) become batched gathers, a dense Shi-Tomasi
response, and per-grid-cell reductions — one jitted program per frame. The
reference's two tracking threads (FeatureTracker.cc:145-149) are unnecessary:
static and dynamic tracking are independent ops XLA schedules together.

Inputs follow the provided-flow / provided-mask mode
(prefer_provided_optical_flow / prefer_provided_object_detection), the
configuration used for all reference benchmarks (README.md:309).

Conventions: flow is defined on frame k-1 pixels mapping to frame k
(uv_k = uv_{k-1} + flow[uv_{k-1}]); mask label 0 = background; images are
(H, W[, C]) arrays with static shapes.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from dynosam_tpu.config import FrontendParams
from dynosam_tpu.nn import bytetrack as bt
from dynosam_tpu.ops import interp, lk
from dynosam_tpu.ops.clahe import clahe


@flax.struct.dataclass
class TrackerState:
    # static features
    s_uv: jnp.ndarray        # (Ns, 2)
    s_depth: jnp.ndarray     # (Ns,)
    s_tid: jnp.ndarray       # (Ns,) int32, -1 = free slot
    s_age: jnp.ndarray       # (Ns,) int32
    s_valid: jnp.ndarray     # (Ns,) bool
    # dynamic features
    d_uv: jnp.ndarray        # (Nd, 2)
    d_depth: jnp.ndarray     # (Nd,)
    d_tid: jnp.ndarray       # (Nd,) int32
    d_oid: jnp.ndarray       # (Nd,) int32 object label from the mask
    d_age: jnp.ndarray       # (Nd,) int32
    d_valid: jnp.ndarray     # (Nd,) bool
    # object slots (stable across frames, like ByteTrack ids)
    obj_ids: jnp.ndarray     # (J,) int32, -1 free
    # mask-IoU collapse flag per slot (the contamination subset of the
    # reference's requiresSampling decision, FeatureTracker.cc:1018): the
    # tracked-point bbox vs detection bbox IoU fell below
    # min_dynamic_mask_iou while tracks were still present. Shipped to the
    # backend as VisionPacket.object_resampled -> hybrid epoch re-anchor.
    obj_resampled: jnp.ndarray  # (J,) bool
    obj_mask_iou: jnp.ndarray   # (J,) float — last tracked-vs-detection IoU
    # detection-mask support per slot (px^2, candidate-cell resolution) —
    # the observability signal behind TrackerParams.min_observable_mask_area
    obj_det_area: jnp.ndarray   # (J,) float
    next_tid: jnp.ndarray    # () int32 tracklet id counter
    # object-level tracker for untracked instance masks
    # (prefer_provided_object_detection = False)
    bt_state: bt.ByteTrackState


def empty_tracker_state(params: FrontendParams, dtype=jnp.float32) -> TrackerState:
    ns = params.tracker.max_features_per_frame
    nd = params.tracker.max_dynamic_features_per_frame
    j = params.max_objects
    return TrackerState(
        s_uv=jnp.zeros((ns, 2), dtype),
        s_depth=jnp.zeros((ns,), dtype),
        s_tid=jnp.full((ns,), -1, jnp.int32),
        s_age=jnp.zeros((ns,), jnp.int32),
        s_valid=jnp.zeros((ns,), bool),
        d_uv=jnp.zeros((nd, 2), dtype),
        d_depth=jnp.zeros((nd,), dtype),
        d_tid=jnp.full((nd,), -1, jnp.int32),
        d_oid=jnp.zeros((nd,), jnp.int32),
        d_age=jnp.zeros((nd,), jnp.int32),
        d_valid=jnp.zeros((nd,), bool),
        obj_ids=jnp.full((j,), -1, jnp.int32),
        obj_resampled=jnp.zeros((j,), bool),
        obj_mask_iou=jnp.ones((j,), dtype),
        obj_det_area=jnp.full((j,), 1e9, dtype),
        next_tid=jnp.array(0, jnp.int32),
        bt_state=bt.empty_state(capacity=2 * j),
    )


# ---------------------------------------------------------------------------
# Detection primitives
# ---------------------------------------------------------------------------

def shi_tomasi_response(gray):
    """Min-eigenvalue corner response (GFTT analogue), (H, W) -> (H, W).

    The 3x3 box filter is computed with separable shift-adds — a
    single-channel conv_general_dilated cannot feed the MXU and is ~10x
    slower on TPU than these pure-VPU adds (wrap-around at the 1-pixel image
    border is irrelevant for detection)."""
    gx, gy = interp.image_gradients(gray)
    ixx, iyy, ixy = gx * gx, gy * gy, gx * gy

    def box3(img):
        v = img + jnp.roll(img, 1, axis=0) + jnp.roll(img, -1, axis=0)
        return v + jnp.roll(v, 1, axis=1) + jnp.roll(v, -1, axis=1)

    sxx, syy, sxy = box3(ixx), box3(iyy), box3(ixy)
    tr = 0.5 * (sxx + syy)
    det = jnp.sqrt(jnp.clip((0.5 * (sxx - syy)) ** 2 + sxy * sxy, 0.0, None))
    return tr - det


def _cell_reduce(score, cell):
    """Per-cell max + argmax pixel coords. score: (H, W) -> per-cell arrays
    of shape (H//cell * W//cell,): best score, u, v."""
    H, W = score.shape
    gh, gw = H // cell, W // cell
    s = score[: gh * cell, : gw * cell].reshape(gh, cell, gw, cell)
    s = s.transpose(0, 2, 1, 3).reshape(gh, gw, cell * cell)
    best = jnp.max(s, axis=-1)
    arg = jnp.argmax(s, axis=-1)
    dy, dx = arg // cell, arg % cell
    vs = jnp.arange(gh)[:, None] * cell + dy
    us = jnp.arange(gw)[None, :] * cell + dx
    return best.reshape(-1), us.reshape(-1).astype(score.dtype), vs.reshape(-1).astype(score.dtype)


def _occupancy(uv, valid, cell, gh, gw):
    """Mark grid cells containing valid features. -> (gh*gw,) bool."""
    ui = jnp.clip((uv[:, 0] // cell).astype(jnp.int32), 0, gw - 1)
    vi = jnp.clip((uv[:, 1] // cell).astype(jnp.int32), 0, gh - 1)
    flat = vi * gw + ui
    occ = jnp.zeros((gh * gw,), bool)
    return occ.at[jnp.where(valid, flat, gh * gw)].set(True, mode="drop")


def _fill_free_slots(slot_tid, slot_valid, cand_score, cand_ok, max_new):
    """Assign top candidates to free slots.

    Returns (assign_cand_idx (Nslots,) int32 candidate index per slot or -1).
    Free slots are filled in order with candidates ranked by score.
    """
    n_slots = slot_tid.shape[0]
    score = jnp.where(cand_ok, cand_score, -jnp.inf)
    order = jnp.argsort(-score)                       # best first
    n_cand = order.shape[0]
    cand_rank_ok = jnp.arange(n_cand) < jnp.minimum(jnp.sum(cand_ok), max_new)

    free = ~slot_valid
    free_rank = jnp.cumsum(free) - 1                  # rank of each free slot
    # slot s (free rank r) takes candidate order[r] if r < num assignable
    take = jnp.where(free, free_rank, n_cand)
    take_ok = free & (free_rank < jnp.sum(cand_rank_ok))
    cand_idx = order[jnp.clip(take, 0, n_cand - 1)]
    return jnp.where(take_ok, cand_idx, -1)


# ---------------------------------------------------------------------------
# Main per-frame step
# ---------------------------------------------------------------------------

def _clahe_padded(gray, grid: int, clip: float):
    """CLAHE for arbitrary H, W: edge-pad to grid multiples, equalize, crop."""
    H, W = gray.shape
    ph, pw = (-H) % grid, (-W) % grid
    if ph or pw:
        g = jnp.pad(gray, ((0, ph), (0, pw)), mode="edge")
        return clahe(g, grid=grid, clip_limit=clip)[:H, :W]
    return clahe(gray, grid=grid, clip_limit=clip)


def track_frame(
    state: TrackerState,
    gray,                 # (H, W) float grayscale of frame k
    depth,                # (H, W) float metric depth at k
    flow,                 # (H, W, 2) float flow k-1 -> k on k-1 pixels
    mask,                 # (H, W) int32 instance labels at k
    params: FrontendParams,
    first_frame: bool = False,
    prev_gray=None,       # (H, W) grayscale of k-1 (CLAHE-equalized when
                          # use_clahe — frontend_step's carry); KLT mode only
    gray_lk=None,         # (H, W) CLAHE-equalized grayscale of frame k for
                          # the LK pair; detection keeps using raw `gray`
):
    """One tracking step. Returns the updated TrackerState.

    Correspondence contract: slot i of the OLD state (uv/depth at k-1) and
    slot i of the NEW state (uv/depth at k) form the (k-1, k) correspondence
    when both `valid` flags are set and the tracklet id is unchanged.

    Two propagation modes (reference: FeatureTracker.cc):
      * provided-flow (prefer_provided_optical_flow=True): look up the dense
        flow at each feature (trackDynamic:339-498 / ExternalFlow tracking);
      * KLT (False): sparse pyramidal Lucas-Kanade with forward-backward
        verification over static AND dynamic features in one batch
        (StaticFeatureTracker.cc:226-285 `trackStatic`, FeatureTracker.cc:500
        `trackDynamicKLT`) — tracking from raw images, no dataset flow
        needed. With use_clahe on, BOTH LK frames must arrive pre-equalized:
        prev_gray is the carried equalized previous frame and gray_lk the
        equalized current frame (frontend_step equalizes each frame once);
        detection keeps using the raw `gray`.
    """
    tp = params.tracker
    H, W = gray.shape
    dtype = gray.dtype
    border_u, border_v = tp.shrink_col, tp.shrink_row

    def in_bounds(uv):
        return (
            (uv[:, 0] >= border_u)
            & (uv[:, 0] <= W - 1 - border_u)
            & (uv[:, 1] >= border_v)
            & (uv[:, 1] <= H - 1 - border_v)
        )

    # ======== object-level tracking of untracked masks ===================
    # With prefer_provided_object_detection=False the instance mask carries
    # per-frame detector labels without temporal identity (the reference runs
    # YOLO+ByteTrack here, FeatureTracker.cc:104-105). Relabel via the
    # batched ByteTrack so downstream object ids are persistent.
    bt_state = state.bt_state
    if not tp.prefer_provided_object_detection:
        max_dets = 2 * params.max_objects
        boxes, scores, det_valid, det_labels = bt.masks_to_detections(
            mask, max_dets=max_dets
        )
        bt_state, det_ids = bt.bytetrack_step(bt_state, boxes, scores, det_valid)
        remap = jnp.zeros((max_dets + 2,), jnp.int32)
        remap = remap.at[jnp.clip(det_labels, 0, max_dets + 1)].set(
            jnp.where(det_valid & (det_ids > 0), det_ids, 0)
        )
        mask = remap[jnp.clip(mask, 0, max_dets + 1)]

    # ======== propagate tracks (provided dense flow OR sparse KLT) ========
    if tp.prefer_provided_optical_flow:
        s_uv = state.s_uv + interp.sample_flow(flow, state.s_uv)
        d_uv = state.d_uv + interp.sample_flow(flow, state.d_uv)
        ns = state.s_uv.shape[0]
        s_prop_ok = jnp.ones((ns,), bool)
        d_prop_ok = jnp.ones((state.d_uv.shape[0],), bool)
    else:
        if prev_gray is None:
            raise ValueError(
                "prefer_provided_optical_flow=False requires prev_gray "
                "(carry it in FrontendState; see frontend_step)"
            )
        if tp.use_clahe and gray_lk is None:
            raise ValueError(
                "use_clahe=True requires gray_lk (the CLAHE-equalized "
                "current frame): the LK pair must arrive pre-equalized — "
                "frontend_step equalizes each frame once and carries the "
                "result as prev_gray"
            )
        # Both frames arrive already CLAHE-equalized when use_clahe is on:
        # frontend_step equalizes each NEW frame once (gray_lk) and carries
        # the result as prev_gray, halving the per-frame CLAHE cost vs
        # re-equalizing the previous frame here every step. Detection below
        # stays on the raw `gray`.
        g0, g1 = prev_gray, (gray_lk if gray_lk is not None else gray)
        ns = state.s_uv.shape[0]
        uv_all = jnp.concatenate([state.s_uv, state.d_uv], axis=0)
        valid_all = jnp.concatenate([state.s_valid, state.d_valid], axis=0)
        uv1_all, ok_all = lk.lk_track(
            g0,
            g1,
            uv_all,
            valid_all,
            levels=tp.klt_levels,
            half=tp.klt_window_half,
            iters=tp.klt_iterations,
            min_eig=tp.klt_min_eig,
            fb_threshold=tp.klt_fb_threshold,
        )
        s_uv, d_uv = uv1_all[:ns], uv1_all[ns:]
        s_prop_ok, d_prop_ok = ok_all[:ns], ok_all[ns:]

    # ======== static track validity =======================================
    s_label = interp.sample_label(mask, s_uv)
    s_depth = interp.sample_depth(depth, s_uv).astype(dtype)
    s_ok = (
        state.s_valid
        & s_prop_ok
        & jnp.logical_not(first_frame)
        & in_bounds(s_uv)
        & (s_label == 0)
        & (s_depth > 0)
        & (s_depth < params.max_background_depth)
        # staggered expiry: tracks born the same frame (e.g. the bootstrap
        # cohort) must not age out together — a synchronized cliff leaves
        # the next solve with no matured correspondences. A deterministic
        # per-slot offset spreads one cohort's expiry over ~2*age_buffer
        # frames (the reference's staggering is implicit in its incremental
        # detection). Opt out via stagger_track_expiry=False for exact
        # reference max-age semantics.
        & (
            state.s_age
            < tp.max_feature_track_age
            + (
                jnp.arange(state.s_age.shape[0])
                % (2 * tp.dynamic_feature_age_buffer)
                if tp.stagger_track_expiry
                else 0
            )
        )
    )

    # ======== dynamic track validity ======================================
    d_label = interp.sample_label(mask, d_uv)
    d_depth = interp.sample_depth(depth, d_uv).astype(dtype)
    d_ok = (
        state.d_valid
        & d_prop_ok
        & jnp.logical_not(first_frame)
        & in_bounds(d_uv)
        & (d_label == state.d_oid)      # label consistency (trackDynamic:412)
        & (d_label > 0)
        & (d_depth > 0)
        & (d_depth < params.max_object_depth)
        # staggered expiry (see the static gate above)
        & (
            state.d_age
            < tp.max_dynamic_feature_age
            + (
                jnp.arange(state.d_age.shape[0])
                % (2 * tp.dynamic_feature_age_buffer)
                if tp.stagger_track_expiry
                else 0
            )
        )
    )

    # ======== detection: static (Shi-Tomasi + grid ANMS) =================
    cell = tp.detection_cell_size
    gh, gw = H // cell, W // cell
    if tp.use_pallas_kernels and H % 64 == 0 and jax.default_backend() == "tpu":
        from dynosam_tpu.ops.pallas.shi_tomasi import shi_tomasi_response_pallas

        response = shi_tomasi_response_pallas(gray)
    else:
        response = shi_tomasi_response(gray)
    best, cu, cv = _cell_reduce(response, cell)
    cand_uv = jnp.stack([cu, cv], axis=-1)
    cand_label = interp.sample_label(mask, cand_uv)
    cand_depth = interp.sample_depth(depth, cand_uv).astype(dtype)
    # Dense interior map: pixels whose +-margin neighbours share their label
    # — the reference's object-boundary detection mask
    # (FeatureTracker::objectDetection, ~10 px at 640x480, area-scaled).
    # Boundary pixels carry mixed depth/flow and poison measurements.
    # Computed once with VPU shift-compares (rolls), then sampled per
    # candidate with the same nearest gather as the labels.
    margin = tp.object_boundary_margin
    if margin < 0:
        margin = max(1, round(H * W / (640.0 * 480.0) * (640.0 / 480.0) * 7.51))
    if margin > 0:
        interior_map = (
            (jnp.roll(mask, margin, 0) == mask)
            & (jnp.roll(mask, -margin, 0) == mask)
            & (jnp.roll(mask, margin, 1) == mask)
            & (jnp.roll(mask, -margin, 1) == mask)
        )
    else:
        interior_map = jnp.ones_like(mask, bool)

    def away_from_boundaries(uv, label):
        del label
        return interp.sample_nearest(interior_map, uv)

    occ_s = _occupancy(s_uv, s_ok, cell, gh, gw)
    cand_ok_s = (
        (best > tp.min_corner_response)
        & (cand_label == 0)
        & (cand_depth > 0)
        & (cand_depth < params.max_background_depth)
        & ~occ_s
        & away_from_boundaries(cand_uv, cand_label)
        & in_bounds(cand_uv)
    )
    # min_distance_btw_tracked_and_detected_static_features (reference
    # FeatureTracker detection suppression radius around EXISTING tracks):
    # when the configured radius exceeds the ANMS cell (whose occupancy
    # already enforces `cell`-pixel spacing), suppress candidates sharing a
    # coarser radius-sized grid cell with a live track — the batched
    # approximation of a per-track distance test (distance in [0, sqrt(2)r]).
    sup = tp.min_distance_btw_tracked_and_detected_static_features
    if sup > cell:
        sgh, sgw = max(H // sup, 1), max(W // sup, 1)
        occ_sup = _occupancy(s_uv, s_ok, sup, sgh, sgw).reshape(sgh, sgw)
        su = jnp.clip((cand_uv[:, 0] // sup).astype(jnp.int32), 0, sgw - 1)
        sv = jnp.clip((cand_uv[:, 1] // sup).astype(jnp.int32), 0, sgh - 1)
        cand_ok_s = cand_ok_s & ~occ_sup[sv, su]
    need_static = jnp.sum(s_ok) < tp.min_features_per_frame
    max_new_s = jnp.where(need_static | first_frame, state.s_uv.shape[0], 0)
    assign_s = _fill_free_slots(state.s_tid, s_ok, best, cand_ok_s, max_new_s)

    new_s = assign_s >= 0
    a_s = jnp.clip(assign_s, 0, cand_uv.shape[0] - 1)
    n_new_s = jnp.cumsum(new_s)                       # for tracklet ids
    s_uv = jnp.where(new_s[:, None], cand_uv[a_s], s_uv)
    s_depth = jnp.where(new_s, cand_depth[a_s], s_depth)
    s_tid = jnp.where(new_s, state.next_tid + n_new_s - 1, state.s_tid)
    s_age = jnp.where(new_s, 0, state.s_age + 1)
    s_valid = s_ok | new_s
    next_tid = state.next_tid + n_new_s[-1]

    # ======== detection: dynamic (grid sampling on object masks) =========
    dcell = max(tp.min_distance_btw_tracked_and_detected_dynamic_features, 4)
    dgh, dgw = H // dcell, W // dcell
    # sample cell centers; a cell is a candidate if its center is on an object
    ccu = (jnp.arange(dgw, dtype=dtype)[None, :] * dcell + dcell // 2).repeat(dgh, 0).reshape(-1)
    ccv = (jnp.arange(dgh, dtype=dtype)[:, None] * dcell + dcell // 2).repeat(dgw, 1).reshape(-1)
    dcand_uv = jnp.stack([ccu, ccv], axis=-1)
    dcand_label = interp.sample_label(mask, dcand_uv)
    dcand_depth = interp.sample_depth(depth, dcand_uv).astype(dtype)
    occ_d = _occupancy(d_uv, d_ok, dcell, dgh, dgw)

    # ---- per-object re-sampling decision (requiresSampling) -------------
    # Reference: FeatureTracker::requiresSampling (/root/reference/dynosam/
    # src/frontend/vision/FeatureTracker.cc:1018-1149, params
    # FrontendParams.yaml:64-70): an already-tracked object is re-sampled
    # only when (a) >80% of its tracks will expire within age_buffer frames,
    # (b) it has fewer than min_dynamic_tracks tracks, or (c) the IoU of the
    # tracked-point bbox vs the detection bbox fell below min_dynamic_mask_iou.
    # New objects (label not in the slot table) are always sampled. The
    # detection bbox is taken over candidate cell centers carrying the label —
    # the cell-resolution analogue of the reference's mask bounding box.
    age_buffer = max(3, tp.dynamic_feature_age_buffer)
    expiry_age = tp.max_dynamic_feature_age - age_buffer
    obj = state.obj_ids                                    # (J,)
    trk = (state.d_oid[None, :] == obj[:, None]) & d_ok[None, :]   # (J, Nd)
    n_tracked = jnp.sum(trk, axis=1)
    geriatric = jnp.sum(trk & (state.d_age[None, :] > expiry_age), axis=1)
    many_old = geriatric > 0.8 * n_tracked
    too_few = n_tracked < tp.min_dynamic_tracks

    def _bbox(sel, uv):
        # sel (J, N) bool; uv (N, 2) -> (J, 4) [umin, vmin, umax, vmax]
        big = jnp.asarray(1e9, dtype)
        u, v = uv[None, :, 0], uv[None, :, 1]
        return jnp.stack(
            [
                jnp.min(jnp.where(sel, u, big), axis=1),
                jnp.min(jnp.where(sel, v, big), axis=1),
                jnp.max(jnp.where(sel, u, -big), axis=1),
                jnp.max(jnp.where(sel, v, -big), axis=1),
            ],
            axis=-1,
        )

    det_sel = dcand_label[None, :] == obj[:, None]          # (J, C)
    bb_trk = _bbox(trk, d_uv)
    bb_det = _bbox(det_sel, dcand_uv)
    ix = jnp.clip(
        jnp.minimum(bb_trk[:, 2], bb_det[:, 2])
        - jnp.maximum(bb_trk[:, 0], bb_det[:, 0]),
        0.0,
    )
    iy = jnp.clip(
        jnp.minimum(bb_trk[:, 3], bb_det[:, 3])
        - jnp.maximum(bb_trk[:, 1], bb_det[:, 1]),
        0.0,
    )
    inter = ix * iy
    area = lambda b: jnp.clip(b[:, 2] - b[:, 0], 0.0) * jnp.clip(
        b[:, 3] - b[:, 1], 0.0
    )
    union = area(bb_trk) + area(bb_det) - inter
    iou = inter / jnp.maximum(union, 1e-6)
    small_iou = iou < tp.min_dynamic_mask_iou
    # epoch-trigger threshold (higher than the local resample one — see
    # TrackerParams.reanchor_mask_iou); a firing trigger also re-samples
    collapse_iou = iou < tp.reanchor_mask_iou
    resample = many_old | too_few | small_iou | collapse_iou | (n_tracked == 0)

    cand_match = dcand_label[None, :] == obj[:, None]       # (J, C)
    cand_known = jnp.any(cand_match & (obj > 0)[:, None], axis=0)
    cand_resample = jnp.any(cand_match & resample[:, None], axis=0)
    sampling_ok = ~cand_known | cand_resample

    dcand_ok = (
        (dcand_label > 0)
        & (dcand_depth > 0)
        & (dcand_depth < params.max_object_depth)
        & ~occ_d
        & sampling_ok
        & away_from_boundaries(dcand_uv, dcand_label)
        & in_bounds(dcand_uv)
    )
    # Candidate ranking: prefer nearer objects, but SPREAD within an object.
    # Pure -depth ranking clusters a capacity-limited fill into the nearest
    # depth band of one object (measured on the rich fixture: 768 tracks
    # occupying v in [113,174] of a mask spanning [97,300]) — which (a)
    # biases the tracked bbox small, wrecking the requiresSampling IoU
    # signal (healthy-frame IoU ~0.22 vs the 0.1 threshold), and (b)
    # concentrates the motion solve's leverage in one band. Quantizing depth
    # to coarse bins keeps the near-object preference while a deterministic
    # per-cell hash decorrelates order inside each bin (uniform spatial
    # sampling, the role of the reference's grid-spread sampleDynamic,
    # FeatureTracker.cc:864).
    nc = dcand_uv.shape[0]
    cell_hash = (
        (jnp.arange(nc, dtype=jnp.uint32) * jnp.uint32(2654435761))
        % jnp.uint32(1 << 20)
    ).astype(dtype) / (1 << 20)
    dscore = -(jnp.floor(dcand_depth / 4.0) + cell_hash)
    assign_d = _fill_free_slots(
        state.d_tid, d_ok, dscore, dcand_ok, state.d_uv.shape[0]
    )
    new_d = assign_d >= 0
    a_d = jnp.clip(assign_d, 0, dcand_uv.shape[0] - 1)
    n_new_d = jnp.cumsum(new_d)
    d_uv = jnp.where(new_d[:, None], dcand_uv[a_d], d_uv)
    d_depth = jnp.where(new_d, dcand_depth[a_d], d_depth)
    d_oid = jnp.where(new_d, dcand_label[a_d], state.d_oid)
    d_tid = jnp.where(new_d, next_tid + n_new_d - 1, state.d_tid)
    d_age = jnp.where(new_d, 0, state.d_age + 1)
    d_valid = d_ok | new_d
    next_tid = next_tid + n_new_d[-1]

    # ======== object slot bookkeeping ====================================
    # allocate stable slots for object ids present among valid dynamic tracks
    obj_ids = _update_object_slots(state.obj_ids, d_oid, d_valid)

    # mask-IoU collapse signal for the backend epoch trigger: only the
    # small_iou criterion (with tracks actually present — an empty tracked
    # bbox is the chain-break path's job), re-aligned onto the NEW slot
    # table (ids are unique across slots).
    iou_collapse = (
        (obj > 0)
        & (n_tracked > 0)
        & collapse_iou
        & jnp.logical_not(first_frame)
    )
    obj_resampled = (obj_ids > 0) & jnp.any(
        obj_ids[:, None] == jnp.where(iou_collapse, obj, -2)[None, :], axis=1
    )
    # per-slot IoU diagnostic, aligned to the new table (1.0 for fresh slots)
    align = obj_ids[:, None] == jnp.where(obj > 0, obj, -2)[None, :]  # (J, J)
    obj_mask_iou = jnp.where(
        jnp.any(align, axis=1),
        jnp.sum(jnp.where(align, iou[None, :], 0.0), axis=1),
        1.0,
    ).astype(dtype)

    # detection-mask support per slot (px^2 at candidate-cell resolution),
    # computed directly on the NEW slot table so freshly allocated slots
    # (first sighting / re-entry) are covered too — an object must clear
    # the observability floor before it can ANCHOR, not only to persist.
    det_sel_new = dcand_label[None, :] == obj_ids[:, None]      # (J, C)
    obj_det_area = (
        jnp.sum(det_sel_new, axis=1).astype(dtype) * float(dcell * dcell)
    )
    obj_det_area = jnp.where(obj_ids > 0, obj_det_area, 0.0)

    return state.replace(
        s_uv=s_uv,
        s_depth=s_depth,
        s_tid=s_tid,
        s_age=s_age,
        s_valid=s_valid,
        d_uv=d_uv,
        d_depth=d_depth,
        d_tid=d_tid,
        d_oid=d_oid,
        d_age=d_age,
        d_valid=d_valid,
        obj_ids=obj_ids,
        obj_resampled=obj_resampled,
        obj_mask_iou=obj_mask_iou,
        obj_det_area=obj_det_area,
        next_tid=next_tid,
        bt_state=bt_state,
    )


def _update_object_slots(obj_ids, d_oid, d_valid):
    """Keep a stable (J,) table of object ids seen among valid tracks.

    Slots whose object vanished entirely are freed; new ids get free slots.
    """
    J = obj_ids.shape[0]
    # which existing slots still have tracks?
    present = (obj_ids[:, None] == d_oid[None, :]) & d_valid[None, :]  # (J, Nd)
    keep = jnp.any(present, axis=1) & (obj_ids > 0)
    obj_ids = jnp.where(keep, obj_ids, -1)

    # candidate new ids: valid track labels not yet in the table. Process via
    # a bounded scan over J free slots: each iteration admits the smallest
    # unrepresented label (labels are small ints from tracked masks).
    def admit(ids, _):
        known = jnp.any(ids[:, None] == d_oid[None, :], axis=0)
        cand = jnp.where(d_valid & (d_oid > 0) & ~known, d_oid, jnp.iinfo(jnp.int32).max)
        new_id = jnp.min(cand)
        has_new = new_id != jnp.iinfo(jnp.int32).max
        free = ids < 0
        first_free = jnp.argmax(free)
        can = has_new & jnp.any(free)
        ids = ids.at[jnp.where(can, first_free, J)].set(
            jnp.where(can, new_id, 0), mode="drop"
        )
        return ids, None

    obj_ids, _ = jax.lax.scan(admit, obj_ids, None, length=J)
    return obj_ids


def propagate_mask(prev_mask, flow):
    """Advect the previous instance mask to the current frame with dense flow.

    Reference parity: FeatureTracker::propogateMask
    (/root/reference/dynosam/src/frontend/vision/FeatureTracker.cc:1212) —
    used when object detections lag or lack tracked ids. Gather-based
    approximation: label(p) = prev_mask(p - flow(p)) treating the flow as
    locally constant (exact inverse warping would need backward flow)."""
    H, W = prev_mask.shape
    u = jnp.arange(W, dtype=flow.dtype)[None, :].repeat(H, 0)
    v = jnp.arange(H, dtype=flow.dtype)[:, None].repeat(W, 1)
    uv = jnp.stack([u, v], axis=-1)
    src = uv - flow
    return interp.sample_nearest(prev_mask, src)
