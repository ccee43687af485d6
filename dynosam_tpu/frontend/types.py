"""Frontend <-> backend data contracts (padded, fixed-shape pytrees).

TPU-native equivalent of the reference's VisionImuPacket
(/root/reference/dynosam/include/dynosam/frontend/VisionImuOutputPacket.hpp:56)
and Feature/FeatureContainer (/root/reference/dynosam_cv Feature.hpp): all
variable-length containers become fixed-capacity tables with validity masks so
every per-frame program has a static shape.

Conventions
-----------
* ``object_id == 0`` is the static background (reference README.md:201).
* ``tracklet_id == -1`` marks an empty slot.
* Poses are (4, 4) homogeneous, world-from-camera (``X_world_cam``).
* Object motions H are *world-frame* frame-to-frame motions: a point on
  object j satisfies ``m_k^w = H_{j,k} m_{k-1}^w`` (T-RO 2025 convention,
  LandmarkMotionTernaryFactor.hpp:41).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrackTable:
    """Padded table of tracked feature observations at one frame."""

    uv: jnp.ndarray          # (N, 2) pixel keypoints at frame k
    depth: jnp.ndarray       # (N,) metric z in camera frame (<=0 => no depth)
    tracklet_id: jnp.ndarray # (N,) int32 persistent id, -1 = empty slot
    object_id: jnp.ndarray   # (N,) int32, 0 = static background
    age: jnp.ndarray         # (N,) int32 frames tracked
    valid: jnp.ndarray       # (N,) bool — observation usable this frame

    @classmethod
    def empty(cls, n: int, dtype=jnp.float32):
        return cls(
            uv=jnp.zeros((n, 2), dtype),
            depth=jnp.zeros((n,), dtype),
            tracklet_id=jnp.full((n,), -1, jnp.int32),
            object_id=jnp.zeros((n,), jnp.int32),
            age=jnp.zeros((n,), jnp.int32),
            valid=jnp.zeros((n,), bool),
        )

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]


@flax.struct.dataclass
class VisionPacket:
    """Per-frame frontend output — the backend's measurement stream."""

    frame_id: jnp.ndarray          # () int32
    X_world_cam: jnp.ndarray       # (4, 4) frontend camera pose estimate
    odom_prev_curr: jnp.ndarray    # (4, 4) measured T_{k-1,k} (VO factor)
    static_tracks: TrackTable      # capacity N_s
    dynamic_tracks: TrackTable     # capacity N_d
    object_ids: jnp.ndarray        # (J,) int32 objects seen this frame, -1 pad
    object_motions: jnp.ndarray    # (J, 4, 4) frontend H_w estimates (k-1 -> k)
    object_valid: jnp.ndarray      # (J,) bool — motion estimate valid
    # tracker requiresSampling signal (mask-IoU collapse subset,
    # FeatureTracker.cc:1018): the backend's hybrid formulation closes the
    # object's epoch and re-anchors when set (contaminated-track proxy)
    object_resampled: jnp.ndarray  # (J,) bool
    pose_valid: jnp.ndarray        # () bool — camera solve succeeded

    @classmethod
    def empty(cls, n_static: int, n_dynamic: int, max_objects: int, dtype=jnp.float32):
        eye = jnp.eye(4, dtype=dtype)
        return cls(
            frame_id=jnp.array(0, jnp.int32),
            X_world_cam=eye,
            odom_prev_curr=eye,
            static_tracks=TrackTable.empty(n_static, dtype),
            dynamic_tracks=TrackTable.empty(n_dynamic, dtype),
            object_ids=jnp.full((max_objects,), -1, jnp.int32),
            object_motions=jnp.broadcast_to(eye, (max_objects, 4, 4)),
            object_valid=jnp.zeros((max_objects,), bool),
            object_resampled=jnp.zeros((max_objects,), bool),
            pose_valid=jnp.array(False),
        )


@flax.struct.dataclass
class FrameInputs:
    """Raw per-frame sensor inputs (the ImageContainer analogue).

    All images are pre-undistorted device arrays:
      rgb:   (H, W, 3) float or uint8 (optional — zeros if unused)
      depth: (H, W) float metric depth (reference: CV_64F, README.md:200)
      flow:  (H, W, 2) float optical flow k-1 -> k... stored at frame k
             pixels of frame k-1 (reference: CV_32FC2)
      mask:  (H, W) int32 instance mask, 0 = background (CV_32SC1)
    """

    frame_id: jnp.ndarray   # () int32
    rgb: jnp.ndarray
    depth: jnp.ndarray
    flow: jnp.ndarray
    mask: jnp.ndarray
    # optional IMU window covering (t_{k-1}, t_k] for preintegration
    # (frontend/imu.py): (S, 7) rows [dt ax ay az gx gy gz] + (S,) mask.
    # None when the dataset has no IMU (the pytree simply lacks the leaves).
    imu_samples: jnp.ndarray = None
    imu_valid: jnp.ndarray = None
    # optional rectified right image (H, W[, 3]) — enables the in-loop
    # sparse stereoTrack depth refinement (the reference's ImageContainer
    # RightRgb key / has_stereo path)
    right: jnp.ndarray = None


@flax.struct.dataclass
class GroundTruthFrame:
    """GT for evaluation (GroundTruthPacket.hpp analogue), padded over objects."""

    X_world_cam: jnp.ndarray      # (4, 4)
    object_ids: jnp.ndarray       # (J,) int32, -1 pad
    object_poses: jnp.ndarray     # (J, 4, 4) L_world_object
    object_motions: jnp.ndarray   # (J, 4, 4) H_w (k-1 -> k); identity at k=0
    object_valid: jnp.ndarray     # (J,) bool
