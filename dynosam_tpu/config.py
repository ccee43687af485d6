"""Configuration tree for the whole framework.

Replaces the reference's three-layer config (config_utilities YAML +
gflags + ROS params — SURVEY.md §5) with a single dataclass tree. Field names
mirror the reference's YAML / flags vocabulary
(/root/reference/dynosam/params/FrontendParams.yaml, backend.flags) so
existing parameter files can be loaded with `DynoConfig.from_yaml` and
experiment overrides applied with `DynoConfig.with_overrides` (the gflags
analogue).

Shape-determining fields (capacities, window sizes) are static Python ints —
changing them triggers recompilation, as with any XLA program.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Dict, Optional


@dataclass
class RansacParams:
    # FrontendParams.yaml: camera_motion_solver / object_motion_solver
    ransac_threshold_pnp: float = 1.0    # pixels of reprojection error
    ransac_iterations: int = 500         # max hypothesis count (static on TPU)
    ransac_probability: float = 0.995    # success probability (sets the count)
    optimize_pose_from_inliers: bool = True
    min_inliers: int = 5
    # 3d-3d (Arun/Kabsch) threshold in meters, used when PnP disabled.
    ransac_threshold_3d: float = 0.3

    def num_hypotheses(self, sample_size: int = 3,
                       worst_inlier_ratio: float = 0.2) -> int:
        """Static TPU hypothesis count from the reference's adaptive-RANSAC
        termination rule N = log(1-p) / log(1 - w^s) (OpenGV `Ransac`,
        probability_ + max_iterations_), evaluated at a conservative
        worst-case inlier ratio and capped by ransac_iterations — the fixed
        trace-time equivalent of "iterate until confidence p, at most
        max_iterations"."""
        import math

        p = min(max(self.ransac_probability, 1e-6), 1 - 1e-9)
        w = worst_inlier_ratio ** sample_size
        required = math.ceil(math.log(1.0 - p) / math.log(1.0 - w))
        return max(1, min(self.ransac_iterations, required))


@dataclass
class MotionSolverParams:
    # FrontendParams.yaml top level
    use_ego_motion_pnp: bool = True
    use_object_motion_pnp: bool = True
    refine_camera_pose_with_joint_of: bool = True
    refine_motion_with_joint_of: bool = True
    refine_motion_with_3d: bool = False
    joint_of_k_huber: float = 0.1
    motion_3d_k_huber: float = 0.01
    # OpticalFlowAndPoseOptimizer::Params (reference MotionSolver.hpp:134-137)
    flow_sigma: float = 10.0
    flow_prior_sigma: float = 3.33
    joint_of_iterations: int = 4
    # per-iteration tangent-step cap for the joint refinement (guards
    # near-singular low-support solves from diverging)
    joint_of_max_step: float = 0.5
    refinement_iterations: int = 8       # fixed GN iterations on TPU
    # object motions only initialise the backend, which refines them anyway —
    # fewer GN iterations than the camera solve
    object_refinement_iterations: int = 4
    refit_rounds: int = 2
    camera: RansacParams = field(default_factory=RansacParams)
    object: RansacParams = field(default_factory=lambda: RansacParams(min_inliers=8))


@dataclass
class TrackerParams:
    # FrontendParams.yaml: tracker_params (capacities are static shapes)
    max_features_per_frame: int = 800          # static feature slots
    min_features_per_frame: int = 200
    # NOTE (semantics deviation from the reference): track ages are staggered
    # per slot — slot i expires at max_age + (i % (2*dynamic_feature_age_buffer
    # + 1)) - dynamic_feature_age_buffer frames, so a cohort of features
    # detected together does not die on the same frame (the reference avoids
    # the cohort cliff by incremental detection instead; tracker.py:268-292).
    # The configured value is therefore the MEAN expiry age, +-buffer frames.
    max_feature_track_age: int = 25
    max_dynamic_features_per_frame: int = 1600 # dynamic slots (all objects)
    max_dynamic_feature_age: int = 20          # staggered likewise
    min_distance_btw_tracked_and_detected_static_features: int = 15
    min_distance_btw_tracked_and_detected_dynamic_features: int = 2
    # Opt-out for the staggering above: False restores the reference's exact
    # semantics (every track expires at exactly max_age; the reference avoids
    # the resulting cohort cliff by incremental detection).
    stagger_track_expiry: bool = True
    # dynamic keyframing criteria
    dynamic_feature_age_buffer: int = 3
    min_dynamic_tracks: int = 20
    min_dynamic_mask_iou: float = 0.1
    # Mask-IoU threshold for the backend EPOCH trigger (packet
    # object_resampled -> hybrid re-anchor). Separate from — and higher
    # than — min_dynamic_mask_iou: with spread candidate sampling the
    # healthy-frame tracked-vs-detection IoU sits at 0.5-0.75, while
    # contaminated partial-occlusion stretches measure 0.1-0.35 with
    # decimeter-to-meter motion errors (probe_occlusion on the rich
    # fixture); the reference's 0.1 resample threshold only catches the
    # terminal collapse. Firing also re-samples the object's candidates.
    reanchor_mask_iou: float = 0.3
    # Observability floor for EMITTING an object's observations to the
    # backend: minimum detection-mask support in px^2 (candidate cells
    # carrying the label x cell area). During DEEP occlusion the visible
    # sliver keeps enough surviving tracks to pass min_object_points, yet a
    # motion estimated from it is garbage (rich fixture probe: 2.2 m
    # first-motion-after-re-anchor error at mask-IoU 0.065). Below the
    # floor the frame's dynamic observations are withheld entirely, so the
    # backend sees an occlusion gap and the re-entry path anchors a fresh
    # epoch only once detection support recovers (reference analogue: the
    # per-object track-quality gates feeding requiresSampling,
    # FeatureTracker.cc:1018). 0 disables; values in (0, 1) are a FRACTION
    # of image area (scale-aware across fixture resolutions), values >= 1
    # are absolute px^2.
    min_observable_mask_area: float = 0.0
    # frame border shrink for dynamic tracking validity
    shrink_row: int = 0
    shrink_col: int = 0
    # keep detections this many pixels away from object silhouettes (the
    # reference builds a boundary detection mask of ~10 px at 640x480 around
    # every object, FeatureTracker::objectDetection) — boundary pixels carry
    # mixed depth/flow and poison both static and dynamic measurements.
    # -1 = auto: the reference's area-scaled formula
    # round((W*H)/(640*480) * 640/480 * 7.51), at least 1.
    object_boundary_margin: int = -1
    prefer_provided_optical_flow: bool = True
    prefer_provided_object_detection: bool = True
    # detection grid cell size (GFTT+ANMS analogue: per-cell best corner)
    detection_cell_size: int = 16
    min_corner_response: float = 1e-4
    # sparse pyramidal KLT (prefer_provided_optical_flow = false mode;
    # reference: cv::cuda::SparsePyrLKOpticalFlow, StaticFeatureTracker.cc:238)
    klt_levels: int = 3
    klt_window_half: int = 3              # (2h+1)^2 patch
    klt_iterations: int = 8
    klt_min_eig: float = 1e-4
    klt_fb_threshold: float = 1.0         # forward-backward check (pixels)
    use_clahe: bool = True                # equalize before KLT
    clahe_clip_limit: float = 2.0
    clahe_grid: int = 8
    # use fused Pallas kernels on TPU where available (falls back to XLA on
    # other backends / unsupported shapes)
    use_pallas_kernels: bool = True


@dataclass
class ImuConfig:
    """IMU handling (ImuParams.yaml analogue). Used when FrameInputs carry
    preintegration windows; see frontend/imu.py."""

    # world gravity vector; camera-world convention (x right, y down,
    # z forward) puts gravity along +y
    gravity: tuple = (0.0, 9.81, 0.0)
    accel_bias: tuple = (0.0, 0.0, 0.0)
    gyro_bias: tuple = (0.0, 0.0, 0.0)
    # trust the preintegrated rotation as the RANSAC hypothesis rotation
    # (EgoMotionSolver's known-rotation / R_curr_ref mode)
    use_rotation_prior: bool = True


@dataclass
class FrontendParams:
    # Scene-flow stationarity test (reference FrontendParams.hpp:45-46,
    # VisionTools determineDynamicObjects): an object where more than
    # scene_flow_percentage of matched points have world-frame scene-flow
    # magnitude below scene_flow_magnitude is NOT moving this frame — its
    # motion output is invalidated (the backend then treats it as static).
    scene_flow_magnitude: float = 0.12
    scene_flow_percentage: float = 0.5
    max_background_depth: float = 200.0
    max_object_depth: float = 30.0
    min_object_points: int = 8            # objects with fewer tracks are dropped
    use_propogate_mask: bool = True       # [sic] reference flag spelling
    # In-loop sparse stereo depth refinement (RGBDInstanceFrontendModule.cc:
    # 177,188-197): when FrameInputs carry a right image, KLT-match static
    # features L->R and replace their depths with triangulated stereo depth —
    # once before the camera solve and again after joint-OF refinement moves
    # the keypoints.
    use_stereo_track: bool = True
    use_imu: bool = False                 # consume FrameInputs.imu_samples
    imu: ImuConfig = field(default_factory=ImuConfig)
    tracker: TrackerParams = field(default_factory=TrackerParams)
    motion_solver: MotionSolverParams = field(default_factory=MotionSolverParams)
    max_objects: int = 16                 # static per-frame object capacity


@dataclass
class NoiseParams:
    # backend.flags sigmas (names match the reference flags)
    constant_object_motion_rotation_sigma: float = 0.01
    constant_object_motion_translation_sigma: float = 0.2
    motion_ternary_factor_noise_sigma: float = 0.001
    odometry_rotation_sigma: float = 0.2
    odometry_translation_sigma: float = 0.4
    static_point_noise_sigma: float = 0.01
    dynamic_point_noise_sigma: float = 0.01
    static_pixel_noise_sigma: float = 1.0
    dynamic_pixel_noise_sigma: float = 3.0
    # gauge stiffness: the reference uses 1e-4 under float64 GTSAM; at
    # float32 that puts 1e8-scale entries in the information matrix, and the
    # sliding-window Schur complement then cancels genuine O(10) information
    # into rounding noise. 1e-2 pins the gauge just as hard in practice
    # (anchor residual is ~0) while keeping the spectrum float32-safe.
    initial_pose_prior_sigma: float = 1e-2
    robust_k_huber: float = 1.345
    use_robust_kernel: bool = True
    # Range-dependent measurement noise for 3D point observations: the
    # stereo/RGB-D depth error grows ~ sigma_px * z^2 / (fx * baseline)
    # (RGBDCamera "fake stereo" model). This plays the role of the
    # reference's pixel-sigma projection factors (static_formulation_type=2)
    # in the PTP parameterisation; without it far points are overweighted.
    use_range_dependent_noise: bool = True
    # cap on the range-model sigma, as a multiple of the base point sigma —
    # prevents far observations from collapsing to zero information (which
    # leaves object motions constrained only by the smoothing prior)
    max_range_sigma_scale: float = 200.0


@dataclass
class OptimizerParams:
    max_iterations: int = 15
    # iteration budget for incremental mode's warm-started solve (the
    # iSAM2-role update); separate from max_iterations because the warm
    # start leaves little residual work per frame
    incremental_iterations: int = 5
    # LM accept/reject needs a full robust-cost evaluation per iteration;
    # incremental (warm-started) mode disables it and runs plain damped GN,
    # mirroring iSAM2's non-backtracking updates.
    accept_reject: bool = True
    # trust-region-style step cap for the GN fast path: per-variable tangent
    # blocks are scaled so none exceeds this norm (guards the occasional
    # diverging Gauss-Newton step that LM accept/reject would have rejected)
    gn_max_step: float = 0.2
    lm_initial_lambda: float = 1e-4
    lm_lambda_factor: float = 10.0
    lm_min_lambda: float = 1e-9
    lm_max_lambda: float = 1e6
    # GTSAM checkConvergence parity: accept/reject LM freezes once the error
    # decrease drops below absolute_error_tol or relative_error_tol * err
    # (solver.lm_accept_reject; the scan stays fixed-length on TPU).
    relative_error_tol: float = 1e-6
    absolute_error_tol: float = 1e-6
    # Per-variable-type sub-threshold delta skip (solver.gate_dx_by_type) —
    # the role of the reference's per-key-type ISAM2 relinearization control
    # (dynosam/params/backend.flags:62-72 X_/H_{trans,rot}_relinearize_
    # threshold; ISAM2.hpp:148-182 noRelinKeys): a camera (X) or
    # object (H/L) tangent block whose rotation AND translation sub-norms
    # both fall under its type thresholds is zeroed for that iteration —
    # the variable holds its linearization point, iSAM2's treatment of
    # sub-threshold deltas — so late iterations stop polishing converged
    # variable classes while others still move. A type gates only when BOTH
    # its thresholds are > 0; defaults off. Deliberately NOT named like the
    # reference flags: those are relinearization-skip radii (20.0 = "never
    # relinearize"), numerically inverted from these update-skip radii, so
    # a reference .flags file must not map onto them silently.
    x_update_threshold_rot: float = 0.0
    x_update_threshold_trans: float = 0.0
    h_update_threshold_rot: float = 0.0
    h_update_threshold_trans: float = 0.0
    # NB: no PCG path — the Schur-reduced systems here are 6F+6JF <= ~3k
    # dense variables, where one MXU Cholesky beats an iterative solve; see
    # solver.py. (Earlier placeholder pcg_* knobs removed.)


@dataclass
class BackendParams:
    # backend.flags
    optimization_mode: int = 1            # 0 full-batch, 1 sliding-window, 2 incremental
    # reference BackendType (BackendDefinitions.hpp:55-68): 0 WCME, 1 WCPE,
    # 2 full-hybrid (joint solve), 3 parallel-hybrid. Both hybrid enums use
    # the same keyframed formulation; 3 additionally decouples the solve
    # order (camera/static first, objects with the camera frozen) when
    # decoupled_object_solve is set.
    backend_updater_enum: int = 0
    # ParallelHybridBackendModule solve order: static fixed-lag first, then
    # per-object with the camera frozen (reference architecture,
    # ParallelHybridBackendModule.cc:405-560; robustness: a degenerate
    # object cannot perturb the camera). Default True — measured better on
    # BOTH camera ATE and object AME than the joint solve in every streamed
    # mode (fixture: sw ATE 2.59->1.20 cm, AME 0.94->0.74; see ACCURACY.md).
    # False = joint solve (strictly more information per iteration, but the
    # camera then absorbs object-structure bias).
    decoupled_object_solve: bool = True
    # Marginalisation treatment of surviving embedded points referenced by
    # departing factors (hybrid advance): True inflates the departing
    # observation noise by the point's full-window marginal covariance
    # (first-order marginalisation); False holds points fixed (round-1
    # behaviour, over-confident priors).
    marginal_point_uncertainty: bool = True
    opt_window_size: int = 10
    # Sliding-window advance stride (reference FLAGS_opt_window_overlap,
    # RegularBackendModule.cc:51,240): when the window fills, it slides by
    # (max_frames - 1 - opt_window_overlap) + 1 slots, keeping `overlap`
    # frames shared between consecutive solves. -1 (default) = maximum
    # overlap, i.e. slide by one frame per step — the smoothest (and most
    # accurate) cadence; the reference default 4 trades accuracy for fewer
    # marginalisations.
    opt_window_overlap: int = -1
    use_vo_factor: bool = True
    use_smoothing_factor: bool = True
    min_static_observations: int = 2
    min_dynamic_observations: int = 3
    # Initialise new motion variables from the frontend's F2F estimate, as
    # the reference's Formulation does for new theta values. Identity init
    # (the old default) converges orders of magnitude slower on real data:
    # the tight ternary creates a stiff valley and streamed outputs stay
    # near identity for the frames spent inside the window.
    init_H_with_identity: bool = False
    regular_backend_static_only: bool = False
    num_dynamic_optimize: int = 0
    # FULL_BATCH warm start: run a short warm-started LM at every ingestion
    # (incremental_iterations budget) before the final batch solve. A cold
    # batch solve from 60+ frames of odometry-chained, never-optimized inits
    # converges into a worse basin than the streamed modes it is supposed to
    # upper-bound: 60-frame fixture AME 3.45 cm cold vs 0.89 warm vs 1.23
    # sliding (scripts/probe_batch_warm.py — the VERDICT r3 "hybrid batch
    # worse than its own window mode" anomaly). The reference solves cold
    # but with gtsam's full adaptive LM (updateBatch,
    # RegularBackendModule.cc:399-431: default params, <=100 outer
    # iterations with inner lambda search); this backend's fixed-length
    # accept/reject LM scan deliberately trades that adaptivity for a
    # static TPU program, so it buys the same basin quality with
    # path-following ingestion instead.
    batch_warm_start: bool = True
    # requiresSampling -> epoch trigger (reference FeatureTracker.cc:1018
    # requiresSampling + HybridEstimator.hpp:1154-1177 KeyFrameData ranges):
    # when the tracker flags an object's mask-IoU collapse (tracked-bbox vs
    # detection-bbox IoU below min_dynamic_mask_iou — the contamination
    # proxy: during PARTIAL occlusion tracks drift onto the occluder while
    # keeping label/depth validity, so motions stay "valid" while wrong),
    # the hybrid formulation CLOSES the object's slot and re-anchors a
    # fresh keyframe epoch — the same path as a clean chain break. Without
    # this, the keyframed motion chain drags the contaminated frames'
    # error through the whole epoch (rich-fixture AME tail, VERDICT r4 #2).
    reanchor_on_resample: bool = True
    # minimum epoch age (frames since the current anchor) before a resample
    # signal may close the slot again — bounds slot-allocation churn during
    # a deepening occlusion (closed slots only recycle once their window
    # data rolls out)
    reanchor_min_epoch_len: int = 3
    noise: NoiseParams = field(default_factory=NoiseParams)
    optimizer: OptimizerParams = field(default_factory=OptimizerParams)
    # Static capacities for device tables.
    max_frames: int = 16                  # frames held in the active window
    max_static_landmarks: int = 1024
    max_dynamic_landmarks: int = 2048
    max_objects: int = 16


@dataclass
class PipelineParams:
    parallel_run: bool = True
    data_provider_prefetch: int = 2
    # Throughput mode: keep every per-frame output/mature-estimate record ON
    # DEVICE and materialize + log them in one drain at finish() (or every
    # drain_every frames). Removes ALL per-frame host syncs from
    # DynoPipeline.process_frame — on runtimes with expensive dispatch round
    # trips (tunneled TPU: ~20 ms each) the per-frame blocking pulls, not
    # the device work, dominated real-IO throughput (0.43 FPS in round 3).
    # The role of the reference's pipeline threads (PipelineManager.cc:
    # 221-250): hide host latency off the hot loop. process_frame returns
    # None in this mode. After finish(): trajectories, outputs[] camera/
    # motion/pose fields, and the camera-pose / object-motion / object-pose
    # / bbx CSVs are identical to the eager path (pinned by
    # test_deferred_outputs_equal_eager). NOT preserved: the per-frame
    # landmark tables (outputs[].static/dynamic_landmarks come back empty)
    # and therefore the map_points CSV, which gets no rows — shipping the
    # tables is ~93% of the packed bytes and defeats the mode's purpose.
    defer_host_outputs: bool = False
    drain_every: int = 64


@dataclass
class DynoConfig:
    frontend: FrontendParams = field(default_factory=FrontendParams)
    backend: BackendParams = field(default_factory=BackendParams)
    pipeline: PipelineParams = field(default_factory=PipelineParams)

    # ------------------------------------------------------------------
    @classmethod
    def from_yaml(cls, path: str) -> "DynoConfig":
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "DynoConfig":
        return _merge_dataclass(cls(), raw)

    def with_overrides(self, overrides: Dict[str, Any]) -> "DynoConfig":
        """Apply dotted-path overrides, e.g. {'backend.noise.odometry_rotation_sigma': 0.1}.

        This is the analogue of the reference's `*.flags` gflag override files.
        Unprefixed flag names are also searched for anywhere in the tree
        (gflags are globally unique in the reference).
        """
        cfg = self
        for key, value in overrides.items():
            cfg = _set_dotted(cfg, key, value)
        return cfg

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def normalized(self) -> "DynoConfig":
        """Align backend slot capacities to the frontend's track capacities.

        The frontend's fixed-slot track tables map row-for-row into the
        backend's landmark tables (slot discipline replaces gtsam::Key
        hashing), so the capacities must agree; the frontend is the source
        of truth. Object capacity likewise.
        """
        be = dataclasses.replace(
            self.backend,
            max_static_landmarks=self.frontend.tracker.max_features_per_frame,
            max_dynamic_landmarks=(
                self.frontend.tracker.max_dynamic_features_per_frame
            ),
            max_objects=self.frontend.max_objects,
        )
        if be == self.backend:
            return self
        return dataclasses.replace(self, backend=be)


# ---------------------------------------------------------------------------


def _merge_dataclass(obj, raw: Dict[str, Any]):
    updates = {}
    names = {f.name: f for f in fields(obj)}
    for key, value in raw.items():
        if key not in names:
            continue
        current = getattr(obj, key)
        if is_dataclass(current) and isinstance(value, dict):
            updates[key] = _merge_dataclass(current, value)
        else:
            updates[key] = value
    return dataclasses.replace(obj, **updates)


def _find_field_path(obj, name: str, prefix=()) -> Optional[tuple]:
    for f in fields(obj):
        if f.name == name:
            return prefix + (name,)
        val = getattr(obj, f.name)
        if is_dataclass(val):
            found = _find_field_path(val, name, prefix + (f.name,))
            if found:
                return found
    return None


def _set_dotted(obj, dotted: str, value):
    parts = tuple(dotted.split("."))
    if len(parts) == 1:
        found = _find_field_path(obj, parts[0])
        if found is None:
            raise KeyError(f"Unknown config field: {dotted}")
        parts = found
    node_stack = [obj]
    for p in parts[:-1]:
        node_stack.append(getattr(node_stack[-1], p))
    leaf_owner = node_stack[-1]
    current = getattr(leaf_owner, parts[-1])
    if current is not None and not is_dataclass(current):
        value = type(current)(value) if not isinstance(value, type(current)) else value
    updated = dataclasses.replace(leaf_owner, **{parts[-1]: value})
    for node, p in zip(reversed(node_stack[:-1]), reversed(parts[:-1])):
        updated = dataclasses.replace(node, **{p: updated})
    return updated


def load_flags_file(path: str) -> Dict[str, Any]:
    """Parse a reference-style `.flags` file (--name=value lines) into overrides."""
    overrides: Dict[str, Any] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("--"):
                continue
            body = line[2:]
            if "=" in body:
                name, value = body.split("=", 1)
            else:
                name, value = body, "true"
            value = value.strip()
            if value.lower() in ("true", "false"):
                parsed: Any = value.lower() == "true"
            else:
                try:
                    parsed = int(value)
                except ValueError:
                    try:
                        parsed = float(value)
                    except ValueError:
                        parsed = value
            overrides[name.strip()] = parsed
    return overrides
