"""VIODE loader (stereo + IMU, simulated urban driving, dyno-preprocessed).

Reference parity: /root/reference/dynosam/src/dataprovider/
ViodeDataProvider.cc (555 LoC). On-disk layout:

  cam0/flow_0/<t_ns>.flo    dense flow; the flow-file list DRIVES the frame
                            list — each stem is a nanosecond timestamp and
                            a frame exists only when a ground-truth odometry
                            row lies within 3 ms of it (:246-283)
  cam0/image_raw/<t_ns>.png left RGB
  cam1/image_raw/<t_ns>.png right RGB
  cam0/mask_0/<t_ns>.png    instance masks (single-channel int; 3-channel
                            colour masks are packed+relabelled)
  odometry_odom.csv         t tx ty tz qx qy qz qw (body pose, seconds);
                            rotation is taken through the fixed NED->CV
                            transform, TRANSLATION KEPT AS-IS (:286-289),
                            then aligned so the first pose is identity
  imu0_imu.csv              t ax ay az wx wy wz (seconds); per-frame windows
                            cover (t_{k-1}, t_k] (:301-318)

There is no depth folder: the reference computes dense depth on the fly by
SGBM stereo matching (getDepthImage, :91-103). Here that role is played by
the jitted TPU block-matching volume (`cv.stereo.dense_stereo_depth`).

Camera (setSensorParams, :349-365): fx = fy = 376, cx = 376, cy = 240,
752 x 480, no distortion, baseline 0.05 m. IMU noise (:409-421):
acc 0.2, gyro 0.05, acc walk 0.02, gyro walk 4e-5, gravity (0, 9.8, 0)
in the CV frame (y down).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from dynosam_tpu.cv import camera as cam
from dynosam_tpu.dataproviders.kitti import read_flo
from dynosam_tpu.dataproviders.tartanair import R_NED_CV, _quat_to_R
from dynosam_tpu.frontend.types import FrameInputs, GroundTruthFrame

INTRINSICS = dict(fx=376.0, fy=376.0, cx=376.0, cy=240.0)
BASELINE = 0.05
SYNC_TOLERANCE = 0.003  # seconds (ViodeDataProvider.cc:267)

IMU_PARAMS = dict(
    acc_noise_density=0.2,
    gyro_noise_density=0.05,
    acc_random_walk=0.02,
    gyro_random_walk=4.0e-5,
    gravity=(0.0, 9.8, 0.0),
)


def pack_colour_mask(mask: np.ndarray) -> np.ndarray:
    """(H, W, 3) colour semantic mask -> contiguous int32 instance labels.

    VIODE ships RGB-encoded semantic masks; the dyno-preprocessed mask_0 is
    normally single-channel already, but raw colour masks are handled by
    packing each unique colour to a label (0 stays background/black)."""
    packed = (
        mask[..., 0].astype(np.int64) * 65536
        + mask[..., 1].astype(np.int64) * 256
        + mask[..., 2].astype(np.int64)
    )
    labels, inv = np.unique(packed, return_inverse=True)
    remap = np.arange(len(labels))
    # keep colour 0 (black) as background label 0
    zero = np.nonzero(labels == 0)[0]
    if len(zero) and zero[0] != 0:
        remap[zero[0]] = 0
        remap[: zero[0]] += 1
    return remap[inv].reshape(mask.shape[:2]).astype(np.int32)


class ViodeDataProvider:
    def __init__(
        self,
        path: str,
        max_objects: int = 16,
        pad_to_multiple: int = 0,
        imu_window: int = 64,
        num_disparities: int = 128,
        stereo_block_size: int = 5,
        intrinsics: Optional[dict] = None,
        baseline: float = BASELINE,
    ):
        self.path = path
        self.max_objects = max_objects
        self.pad_to_multiple = pad_to_multiple
        self.imu_window = imu_window
        self.num_disparities = num_disparities
        self.stereo_block_size = stereo_block_size
        self._ip = dict(INTRINSICS)
        if intrinsics:
            self._ip.update(intrinsics)
        self.baseline = baseline

        odom = self._load_csv(os.path.join(path, "odometry_odom.csv"), 8)
        self._imu = self._load_csv(os.path.join(path, "imu0_imu.csv"), 7)

        flow_dir = os.path.join(path, "cam0", "flow_0")
        stems = sorted(
            f[: -len(".flo")]
            for f in os.listdir(flow_dir)
            if f.endswith(".flo")
        )

        # sync: keep frames whose ns-stamp matches a GT row within 3 ms
        self._stems: List[str] = []
        self.timestamps: List[float] = []
        poses: List[np.ndarray] = []
        first_inv = None
        for stem in stems:
            t = float(stem) / 1e9
            if len(odom) == 0:
                continue
            i = int(np.argmin(np.abs(odom[:, 0] - t)))
            if abs(odom[i, 0] - t) > SYNC_TOLERANCE:
                continue
            T = np.eye(4)
            # rotation through NED->CV; translation kept as-is (:286-289)
            T[:3, :3] = _quat_to_R(*odom[i, 4:8]) @ R_NED_CV
            T[:3, 3] = odom[i, 1:4]
            if first_inv is None:
                first_inv = np.linalg.inv(T)
            poses.append(first_inv @ T)
            self._stems.append(stem)
            self.timestamps.append(t)
        self._poses = poses
        self._n = len(self._stems)
        if self._n == 0:
            raise FileNotFoundError(
                f"no flow/odometry-synchronised frames under {path}"
            )

        import cv2

        first = cv2.imread(self._img_path("cam0", self._stems[0]))
        self._h, self._w = first.shape[:2]
        self._intr = cam.CameraIntrinsics.create(
            width=self._padded(self._w), height=self._padded(self._h),
            baseline=self.baseline, **self._ip,
        )
        self._depth_fn = None

    # ------------------------------------------------------------------
    def _img_path(self, cam_name: str, stem: str) -> str:
        sub = "flow_0" if cam_name == "flow" else "image_raw"
        if cam_name == "flow":
            return os.path.join(self.path, "cam0", sub, stem + ".flo")
        return os.path.join(self.path, cam_name, sub, stem + ".png")

    @staticmethod
    def _load_csv(fname: str, ncols: int) -> np.ndarray:
        if not os.path.exists(fname):
            return np.zeros((0, ncols))
        rows = []
        with open(fname) as f:
            for line in f:
                line = line.strip()
                if not line or line[0] in "#t":  # skip header/comment lines
                    continue
                vals = [v for v in line.replace(",", " ").split()]
                try:
                    rows.append([float(v) for v in vals[:ncols]])
                except ValueError:
                    continue
        out = np.asarray(rows, np.float64)
        return out if out.size else np.zeros((0, ncols))

    def _padded(self, x: int) -> int:
        m = self.pad_to_multiple
        return x if m <= 0 else ((x + m - 1) // m) * m

    def _pad(self, img: np.ndarray, value=0.0) -> np.ndarray:
        H, W = self._padded(self._h), self._padded(self._w)
        if img.shape[0] == H and img.shape[1] == W:
            return img
        pad = [(0, H - img.shape[0]), (0, W - img.shape[1])] + [(0, 0)] * (
            img.ndim - 2
        )
        return np.pad(img, pad, constant_values=value)

    def imu_window_for(self, k: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Padded (S, 7) [dt a g] rows + mask covering (t_{k-1}, t_k]."""
        if len(self._imu) == 0 or k <= 0:
            return None
        t0, t1 = self.timestamps[k - 1], self.timestamps[k]
        sel = self._imu[(self._imu[:, 0] >= t0) & (self._imu[:, 0] < t1)]
        S = self.imu_window
        out = np.zeros((S, 7), np.float32)
        mask = np.zeros((S,), bool)
        times = list(sel[:S, 0]) + [t1]
        for i, row in enumerate(sel[:S]):
            out[i, 0] = times[i + 1] - times[i]
            # csv order ax ay az wx wy wz matches [a g]
            out[i, 1:7] = row[1:7]
            mask[i] = True
        return out, mask

    def _dense_depth(self, left_gray: np.ndarray, right_gray: np.ndarray):
        if self._depth_fn is None:
            import functools

            import jax

            from dynosam_tpu.cv.stereo import dense_stereo_depth

            self._depth_fn = jax.jit(
                functools.partial(
                    dense_stereo_depth,
                    fx=self._ip["fx"],
                    baseline=self.baseline,
                    num_disparities=self.num_disparities,
                    block_size=self.stereo_block_size,
                )
            )
        return np.asarray(self._depth_fn(left_gray, right_gray))

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return self._n

    def intrinsics(self) -> cam.CameraIntrinsics:
        return self._intr

    def frame(self, k: int) -> FrameInputs:
        import cv2

        stem = self._stems[k]
        left = cv2.imread(self._img_path("cam0", stem))
        right = cv2.imread(self._img_path("cam1", stem))
        rgb = cv2.cvtColor(left, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        depth = self._dense_depth(
            cv2.cvtColor(left, cv2.COLOR_BGR2GRAY).astype(np.float32) / 255.0,
            cv2.cvtColor(right, cv2.COLOR_BGR2GRAY).astype(np.float32) / 255.0,
        )

        mask_raw = cv2.imread(
            os.path.join(self.path, "cam0", "mask_0", stem + ".png"),
            cv2.IMREAD_UNCHANGED,
        )
        if mask_raw.ndim == 3:
            mask = pack_colour_mask(mask_raw)
        else:
            mask = mask_raw.astype(np.int32)

        if k > 0:
            flow = read_flo(self._img_path("flow", self._stems[k - 1]))
        else:
            flow = np.zeros((self._h, self._w, 2), np.float32)

        extra = {}
        imu = self.imu_window_for(k)
        if imu is not None:
            extra = dict(
                imu_samples=jnp.asarray(imu[0]), imu_valid=jnp.asarray(imu[1])
            )
        return FrameInputs(
            frame_id=jnp.array(k, jnp.int32),
            rgb=jnp.asarray(self._pad(rgb)),
            depth=jnp.asarray(self._pad(depth)),
            flow=jnp.asarray(self._pad(flow)),
            mask=jnp.asarray(self._pad(mask)),
            **extra,
        )

    def ground_truth(self, k: int) -> Optional[GroundTruthFrame]:
        if k >= len(self._poses):
            return None
        J = self.max_objects
        return GroundTruthFrame(
            X_world_cam=np.asarray(self._poses[k], np.float32),
            object_ids=np.full((J,), -1, np.int32),
            object_poses=np.tile(np.eye(4, dtype=np.float32), (J, 1, 1)),
            object_motions=np.tile(np.eye(4, dtype=np.float32), (J, 1, 1)),
            object_valid=np.zeros((J,), bool),
        )

    def __iter__(self):
        for k in range(len(self)):
            yield self.frame(k), self.ground_truth(k)
