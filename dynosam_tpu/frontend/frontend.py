"""RGB-D instance frontend: one jitted step per frame.

TPU-native rebuild of RGBDInstanceFrontendModule
(/root/reference/dynosam/src/frontend/RGBDInstanceFrontendModule.cc:124-285
`nominalSpin`): track -> depth update -> camera PnP (+constant-velocity
fallback) -> refinement -> per-object motion solve -> output packet. The
whole per-frame pipeline is a single pure function
  (FrontendState, FrameInputs) -> (FrontendState, VisionPacket)
compiled once; the reference's Bootstrap/Nominal state machine collapses into
a traced `first_frame` predicate.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from dynosam_tpu.config import FrontendParams
from dynosam_tpu.cv import camera as cam
from dynosam_tpu.frontend import imu as imu_mod
from dynosam_tpu.frontend import motion
from dynosam_tpu.frontend.tracker import TrackerState, empty_tracker_state, track_frame
from dynosam_tpu.frontend.types import FrameInputs, TrackTable, VisionPacket
from dynosam_tpu.ops import interp
from dynosam_tpu.utils import lie


@flax.struct.dataclass
class FrontendState:
    tracker: TrackerState
    X_prev: jnp.ndarray        # (4, 4) pose at k-1
    X_prev_prev: jnp.ndarray   # (4, 4) pose at k-2 (constant-velocity prior)
    frame_idx: jnp.ndarray     # () int32
    key: jax.Array
    # previous grayscale frame, carried only in KLT mode
    # (prefer_provided_optical_flow=False); CLAHE-equalized when
    # tracker.use_clahe is on (track_frame expects the LK pair
    # pre-equalized — a state serialized before this contract yields one
    # frame with a raw/equalized mismatch, an acceptable transient); shape
    # (0, 0) otherwise so the provided-flow path pays no HBM copy per step
    prev_gray: jnp.ndarray
    # previous instance mask, carried only when use_propogate_mask is on and
    # the state was built with an image_shape; (0, 0) sentinel otherwise
    prev_mask: jnp.ndarray
    # world-frame linear velocity estimate for IMU nav-state propagation
    # (zeros and untouched when use_imu is off)
    v_world: jnp.ndarray


def empty_frontend_state(
    params: FrontendParams, key=None, dtype=jnp.float32, image_shape=None
):
    klt_mode = not params.tracker.prefer_provided_optical_flow
    if klt_mode and image_shape is None:
        raise ValueError(
            "prefer_provided_optical_flow=False: pass "
            "image_shape=(height, width) so the state can carry prev_gray"
        )
    pm_mode = params.use_propogate_mask and image_shape is not None
    return FrontendState(
        tracker=empty_tracker_state(params, dtype),
        X_prev=jnp.eye(4, dtype=dtype),
        X_prev_prev=jnp.eye(4, dtype=dtype),
        frame_idx=jnp.array(0, jnp.int32),
        key=key if key is not None else jax.random.PRNGKey(0),
        prev_gray=jnp.zeros(image_shape if klt_mode else (0, 0), dtype),
        prev_mask=jnp.zeros(image_shape if pm_mode else (0, 0), jnp.int32),
        v_world=jnp.zeros((3,), dtype),
    )


def _to_gray(rgb):
    if rgb.ndim == 2:
        return rgb.astype(jnp.float32)
    r = rgb[..., 0].astype(jnp.float32)
    g = rgb[..., 1].astype(jnp.float32)
    b = rgb[..., 2].astype(jnp.float32)
    return 0.299 * r + 0.587 * g + 0.114 * b


def _propogate_mask_repair(tracker, prev_mask, flow, mask, params):
    """Recover objects the detector lost this frame (propogateMask parity).

    Reference: FeatureTracker::propogateMask (FeatureTracker.cc:1212-1360) —
    for each object tracked at k-1, poll the CURRENT mask at the predicted
    keypoints; if the majority vote is background (the detector dropped the
    object), splat the previous mask's object pixels forward through the
    previous flow. TPU shape: the per-pixel forward splat becomes the
    gather-based `propagate_mask` advection, and recovered labels only fill
    pixels the current mask left as background (the reference overwrites
    unconditionally at splat targets; background-only fill is the
    conservative batched equivalent)."""
    from dynosam_tpu.frontend.tracker import propagate_mask

    H, W = mask.shape
    pred_uv = tracker.d_uv + interp.sample_flow(flow, tracker.d_uv)
    in_img = (
        (pred_uv[:, 0] >= 0)
        & (pred_uv[:, 0] <= W - 1)
        & (pred_uv[:, 1] >= 0)
        & (pred_uv[:, 1] <= H - 1)
    )
    cur_lab = interp.sample_label(mask, pred_uv)
    votes = tracker.d_valid & (tracker.d_oid > 0) & in_img

    obj = tracker.obj_ids                                     # (J,)
    sel = (tracker.d_oid[None, :] == obj[:, None]) & votes[None, :]
    n = jnp.sum(sel, axis=1)
    n_zero = jnp.sum(sel & (cur_lab == 0)[None, :], axis=1)
    lost = (
        (obj > 0)
        & (n >= params.tracker.min_dynamic_tracks)
        & (n_zero * 2 > n)                                    # majority vote
    )

    adv = propagate_mask(prev_mask, flow)                     # (H, W)
    recov = jnp.any(
        (adv[..., None] == obj[None, None, :]) & lost[None, None, :], axis=-1
    )
    return jnp.where((mask == 0) & recov, adv, mask)


def frontend_step(
    state: FrontendState,
    inputs: FrameInputs,
    intr: cam.CameraIntrinsics,
    params: FrontendParams,
):
    """Process one frame. Jittable; all shapes static."""
    first = state.frame_idx == 0
    old = state.tracker
    gray = _to_gray(inputs.rgb)
    klt_mode = not params.tracker.prefer_provided_optical_flow
    # KLT mode: CLAHE-equalize the NEW frame once and carry the result as
    # prev_gray — track_frame expects both frames pre-equalized. NB this is
    # an intentional divergence from the reference split: the reference
    # equalizes the DETECTION image (FeatureDetector.cc:193) while its LK
    # pair is un-equalized (KltFeatureTracker's CLAHE is commented out,
    # StaticFeatureTracker.cc:315-318); this repo equalizes the LK pair and
    # detects on raw gray, which measured better on the synthetic fixtures.
    if klt_mode and params.tracker.use_clahe:
        from dynosam_tpu.frontend.tracker import _clahe_padded

        gray_t = _clahe_padded(
            gray, params.tracker.clahe_grid, params.tracker.clahe_clip_limit
        )
    else:
        gray_t = gray

    # ---- mask propagation (FeatureTracker.cc:109 -> propogateMask) -------
    pm_on = params.use_propogate_mask and state.prev_mask.size > 0
    mask_k = inputs.mask
    if pm_on:
        repaired = _propogate_mask_repair(
            old, state.prev_mask, inputs.flow, inputs.mask, params
        )
        mask_k = jnp.where(first, inputs.mask, repaired)

    tracker = track_frame(
        old,
        gray,
        inputs.depth,
        inputs.flow,
        mask_k,
        params,
        first_frame=first,
        prev_gray=state.prev_gray if klt_mode else None,
        gray_lk=gray_t if klt_mode else None,
    )

    # ---- in-loop stereo depth refinement (stereoTrack #1) ----------------
    # RGBDInstanceFrontendModule.cc:177: KLT-match static features into the
    # rectified right image and replace their depths with triangulated
    # stereo depth before the camera solve.
    has_right = params.use_stereo_track and inputs.right is not None
    if has_right:
        from dynosam_tpu.cv import stereo as stereo_mod

        right_gray = _to_gray(inputs.right)
        tp = params.tracker

        def _stereo_refresh(trk):
            depth_st, _, ok = stereo_mod.stereo_track(
                gray,
                right_gray,
                trk.s_uv,
                trk.s_valid,
                intr.fx,
                intr.baseline,
                levels=tp.klt_levels,
                half=max(tp.klt_window_half, 3),
                iters=tp.klt_iterations,
                min_eig=tp.klt_min_eig,
                fb_threshold=tp.klt_fb_threshold,
            )
            return trk.replace(
                s_depth=jnp.where(ok & trk.s_valid, depth_st, trk.s_depth)
            )

        tracker = _stereo_refresh(tracker)

    key, k_cam, k_obj = jax.random.split(state.key, 3)

    # ---- camera ego-motion ------------------------------------------------
    # correspondence: same slot, same tracklet, valid at both frames
    s_match = (
        old.s_valid & tracker.s_valid & (old.s_tid == tracker.s_tid) & (~first)
    )
    pts_cam_prev = cam.backproject(old.s_uv, old.s_depth, intr)
    pts_world_prev = lie.transform_points(state.X_prev, pts_cam_prev)
    pts_cam_k = cam.backproject(tracker.s_uv, tracker.s_depth, intr)

    # constant-velocity prior (RGBDInstanceFrontendModule.cc:334-347 fallback)
    vel = lie.compose(lie.inverse(state.X_prev_prev), state.X_prev)
    X_prior = lie.compose(state.X_prev, vel)

    # ---- IMU preintegration (RGBDInstanceFrontendModule.cc:135) ---------
    # The preintegrated nav-state supplies (a) the prior/fallback pose (the
    # reference prefers the IMU prediction over constant velocity when PnP
    # fails, :324-370) and (b) a known-rotation hypothesis for RANSAC
    # (MotionSolver.cc:216-311 R_curr_ref mode).
    use_imu = params.use_imu and inputs.imu_samples is not None
    R_known = None
    pim_dt = jnp.zeros((), X_prior.dtype)
    if use_imu:
        imu_params = imu_mod.ImuParams.create(
            gravity=params.imu.gravity,
            accel_bias=jnp.asarray(params.imu.accel_bias, X_prior.dtype),
            gyro_bias=jnp.asarray(params.imu.gyro_bias, X_prior.dtype),
        )
        pim = imu_mod.preintegrate(
            inputs.imu_samples, inputs.imu_valid, imu_params
        )
        pim_dt = pim.dt
        X_imu, v_imu = imu_mod.predict(
            state.X_prev, state.v_world, pim, imu_params
        )
        has_imu = (pim.dt > 0) & (~first)
        X_prior = jnp.where(has_imu, X_imu, X_prior)
        if params.imu.use_rotation_prior:
            # RANSAC solves T_cam_world; pin its rotation to the IMU's
            R_cw_imu = jnp.swapaxes(lie.rotation(X_imu), -1, -2)
            R_cw_cv = jnp.swapaxes(lie.rotation(X_prior), -1, -2)
            R_known = jnp.where(has_imu, R_cw_imu, R_cw_cv)

    cam_res = motion.solve_camera_pose(
        k_cam,
        pts_world_prev,
        tracker.s_uv,
        pts_cam_k,
        s_match,
        intr,
        params.motion_solver,
        X_prior,
        R_known=R_known,
    )
    X_k = jnp.where(first, jnp.eye(4, dtype=state.X_prev.dtype), cam_res.pose)

    # ---- joint optical-flow + camera-pose refinement ----------------------
    # OpticalFlowAndPoseOptimizer on the ego solve
    # (RGBDInstanceFrontendModule.cc:374-386): refine the pose AND the static
    # flows together, then move the keypoints to kp_{k-1} + refined_flow and
    # re-sample their depths (the optimizeAndUpdate contract).
    ms = params.motion_solver
    H_img, W_img = gray.shape[-2], gray.shape[-1]

    def _uv_in_bounds(uv):
        return (
            (uv[:, 0] >= 1.0)
            & (uv[:, 0] <= W_img - 2.0)
            & (uv[:, 1] >= 1.0)
            & (uv[:, 1] <= H_img - 2.0)
        )

    if ms.refine_camera_pose_with_joint_of:
        ref_mask = s_match & cam_res.valid
        T_ref, f_s, w_s = motion.joint_flow_pose_refine(
            lie.inverse(X_k),
            pts_world_prev,
            old.s_uv,
            tracker.s_uv - old.s_uv,
            ref_mask,
            intr,
            ms,
        )
        X_k = jnp.where(cam_res.valid & (~first), lie.inverse(T_ref), X_k)
        uv_ref = old.s_uv + f_s
        depth_ref = interp.sample_depth(inputs.depth, uv_ref).astype(
            tracker.s_depth.dtype
        )
        upd = ref_mask & (depth_ref > 0) & _uv_in_bounds(uv_ref)
        tracker = tracker.replace(
            s_uv=jnp.where(upd[:, None], uv_ref, tracker.s_uv),
            s_depth=jnp.where(upd, depth_ref, tracker.s_depth),
        )
        # stereoTrack #2 (RGBDInstanceFrontendModule.cc:188-197): the joint
        # refinement moved the keypoints — re-match L->R at the refined
        # positions ("wow this seems to make a pretty big difference")
        if has_right:
            tracker = _stereo_refresh(tracker)

    # ---- object motions -----------------------------------------------------
    d_match = (
        old.d_valid & tracker.d_valid & (old.d_tid == tracker.d_tid) & (~first)
    )
    # per-object matched-correspondence count: objects with fewer than
    # min_object_points tracks are dropped from the output packet (the
    # reference culls small/degenerate objects before the backend sees them)
    obj_match_count = jnp.sum(
        d_match[None, :] & (tracker.d_oid[None, :] == tracker.obj_ids[:, None]),
        axis=1,
    )
    pts_cam_prev_d = cam.backproject(old.d_uv, old.d_depth, intr)
    pts_world_prev_d = lie.transform_points(state.X_prev, pts_cam_prev_d)
    pts_cam_k_d = cam.backproject(tracker.d_uv, tracker.d_depth, intr)
    pts_world_k_d = lie.transform_points(X_k, pts_cam_k_d)

    # scene-flow stationarity test (FrontendParams.hpp:45-46, VisionTools
    # determineDynamicObjects): with the solved X_k, the world-frame scene
    # flow of a matched dynamic point is its residual motion after camera
    # compensation; an object where > scene_flow_percentage of points barely
    # move (< scene_flow_magnitude) is not moving this frame, and its motion
    # output is invalidated
    sf_mag = jnp.linalg.norm(pts_world_k_d - pts_world_prev_d, axis=-1)
    low_sf = d_match & (sf_mag < params.scene_flow_magnitude)
    obj_low_count = jnp.sum(
        low_sf[None, :] & (tracker.d_oid[None, :] == tracker.obj_ids[:, None]),
        axis=1,
    )
    obj_stationary = (obj_match_count > 0) & (
        obj_low_count > params.scene_flow_percentage * obj_match_count
    )

    obj_res = motion.solve_all_object_motions(
        k_obj,
        tracker.obj_ids,
        tracker.d_oid,
        pts_world_prev_d,
        tracker.d_uv,
        pts_world_k_d,
        d_match,
        X_k,
        intr,
        params.motion_solver,
    )

    # ---- joint optical-flow + object-motion refinement --------------------
    # Per-object OpticalFlowAndPoseOptimizer (MotionSolver.cc:673-690): solve
    # G = X_k^-1 H jointly with that object's flows, recover H = X_k G, and
    # move the dynamic keypoints to their refined positions.
    obj_motions = obj_res.pose
    if ms.refine_motion_with_joint_of:
        T_cw_k = lie.inverse(X_k)
        flow_d = tracker.d_uv - old.d_uv

        def per_obj(H_j, oid_j, ok_j):
            mask_j = d_match & (tracker.d_oid == oid_j) & (oid_j > 0) & ok_j
            T0 = lie.compose(T_cw_k, H_j)
            T_r, f_r, w_r = motion.joint_flow_pose_refine(
                T0, pts_world_prev_d, old.d_uv, flow_d, mask_j, intr, ms
            )
            # trust-region acceptance: the joint refinement is a local
            # polish of the RANSAC+GN answer — a large departure signals an
            # ill-conditioned solve (few/biased matches), not a better fit
            depart = jnp.linalg.norm(
                lie.se3_log(lie.compose(lie.inverse(T0), T_r))
            )
            return (
                lie.compose(X_k, T_r), f_r, w_r, jnp.sum(mask_j), depart
            )

        H_ref, f_d_all, w_d_all, n_support, depart = jax.vmap(per_obj)(
            obj_res.pose, tracker.obj_ids, obj_res.valid
        )
        # a refined motion needs real support — below the RANSAC inlier
        # floor the joint system is ill-conditioned and the RANSAC+GN
        # estimate is the better answer
        ref_ok = (
            obj_res.valid
            & (tracker.obj_ids > 0)
            & (n_support >= ms.object.min_inliers)
            & (depart <= ms.joint_of_max_step)
        )
        obj_motions = jnp.where(ref_ok[:, None, None], H_ref, obj_res.pose)
        # each dynamic feature takes the flow from its own object's slot
        # (only slots whose refinement had real support)
        slot_hit = (tracker.d_oid[None, :] == tracker.obj_ids[:, None]) & (
            ref_ok
        )[:, None]                                        # (J, Nd)
        slot_idx = jnp.argmax(slot_hit, axis=0)           # (Nd,)
        has_slot = jnp.any(slot_hit, axis=0)
        f_d = jnp.take_along_axis(
            f_d_all, slot_idx[None, :, None], axis=0
        )[0]
        uv_ref_d = old.d_uv + f_d
        depth_ref_d = interp.sample_depth(inputs.depth, uv_ref_d).astype(
            tracker.d_depth.dtype
        )
        upd_d = (
            d_match
            & has_slot
            & (depth_ref_d > 0)
            & _uv_in_bounds(uv_ref_d)
        )
        tracker = tracker.replace(
            d_uv=jnp.where(upd_d[:, None], uv_ref_d, tracker.d_uv),
            d_depth=jnp.where(upd_d, depth_ref_d, tracker.d_depth),
        )

    # ---- packet --------------------------------------------------------------
    # Observability floor (TrackerParams.min_observable_mask_area): an
    # object whose detection-mask support fell below the floor has its
    # dynamic observations WITHHELD from the packet — motions estimated
    # from a deep-occlusion sliver are garbage even when enough tracks
    # survive to pass min_object_points (ref: the track-quality gates
    # feeding requiresSampling, FeatureTracker.cc:1018). The backend then
    # sees an occlusion gap and its re-entry path anchors a fresh epoch
    # only once support recovers.
    if params.tracker.min_observable_mask_area > 0:
        a = params.tracker.min_observable_mask_area
        Hm, Wm = inputs.mask.shape
        floor = a if a >= 1.0 else a * float(Hm * Wm)  # (0,1) = image frac
        obj_unobs = (tracker.obj_ids > 0) & (
            tracker.obj_det_area < floor
        )
        d_emit = tracker.d_valid & ~jnp.any(
            tracker.d_oid[:, None]
            == jnp.where(obj_unobs, tracker.obj_ids, -2)[None, :],
            axis=1,
        )
        obj_emit = ~obj_unobs
    else:
        d_emit = tracker.d_valid
        obj_emit = jnp.ones_like(tracker.obj_ids, dtype=bool)
    packet = VisionPacket(
        frame_id=inputs.frame_id,
        X_world_cam=X_k,
        odom_prev_curr=lie.compose(lie.inverse(state.X_prev), X_k),
        static_tracks=TrackTable(
            uv=tracker.s_uv,
            depth=tracker.s_depth,
            tracklet_id=tracker.s_tid,
            object_id=jnp.zeros_like(tracker.s_tid),
            age=tracker.s_age,
            valid=tracker.s_valid,
        ),
        dynamic_tracks=TrackTable(
            uv=tracker.d_uv,
            depth=tracker.d_depth,
            tracklet_id=tracker.d_tid,
            object_id=tracker.d_oid,
            age=tracker.d_age,
            valid=d_emit,
        ),
        object_ids=tracker.obj_ids,
        object_motions=obj_motions,
        object_valid=obj_res.valid
        & (tracker.obj_ids > 0)
        & (obj_match_count >= params.min_object_points)
        & ~obj_stationary
        & obj_emit,
        object_resampled=tracker.obj_resampled,
        pose_valid=cam_res.valid | first,
    )

    # velocity update for the next IMU propagation: finite difference of the
    # solved poses over the preintegration span
    if use_imu:
        v_new = jnp.where(
            pim_dt > 1e-6,
            (lie.translation(X_k) - lie.translation(state.X_prev))
            / jnp.maximum(pim_dt, 1e-6),
            state.v_world,
        )
    else:
        v_new = state.v_world

    new_state = FrontendState(
        tracker=tracker,
        X_prev=X_k,
        X_prev_prev=jnp.where(first, X_k, state.X_prev),
        frame_idx=state.frame_idx + 1,
        key=key,
        prev_gray=gray_t.astype(state.prev_gray.dtype) if klt_mode else state.prev_gray,
        prev_mask=mask_k.astype(jnp.int32) if pm_on else state.prev_mask,
        v_world=v_new,
    )
    return new_state, packet
