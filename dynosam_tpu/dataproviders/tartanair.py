"""TartanAir-Shibuya loader (dynamic pedestrian crowds, monocular RGB-D).

Reference parity: /root/reference/dynosam/src/dataprovider/
TartanAirShibuya.cc (316 LoC). On-disk layout:

  image_0/*.png       RGB frames (sorted directory listing)
  depth_0/*.png       depth images, imread-unchanged -> float (loadDepth,
                      FileSystem.cc:29-33 applies NO scaling; `depth_scale`
                      divides raw values for 16-bit-packed fixtures)
  flow_0/*.flo        dense flow k -> k+1 stored at index k; the number of
                      flow files DEFINES the dataset size (:134-145). Served
                      shifted: frame k carries the (k-1 -> k) flow.
  mask_0/*.png        instance masks, imread-unchanged -> int32 (loadMask)
  times.txt           one timestamp per line; the reference SORTS them
                      because the raw files are out of order (:170-180)
  gt_pose.txt         TUM lines `t tx ty tz qx qy qz qw`; orientation is
                      world_R_cam in NED, converted with the fixed NED->CV
                      rotation and aligned so the first pose is identity
                      (:183-230). Camera-only ground truth (no object poses).

Camera model is hardcoded by the reference (:66-71):
fx = fy = 772.5483399593904, cx = 320, cy = 180, 640 x 360, no distortion.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from dynosam_tpu.cv import camera as cam
from dynosam_tpu.dataproviders.kitti import read_flo
from dynosam_tpu.frontend.types import FrameInputs, GroundTruthFrame

# X_cv(right) = y_NED, Y_cv(down) = z_NED, Z_cv(forward) = x_NED
# (TartanAirShibuya.cc:184-188)
R_NED_CV = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])

INTRINSICS = dict(fx=772.5483399593904, fy=772.5483399593904, cx=320.0, cy=180.0)


def _quat_to_R(qx, qy, qz, qw) -> np.ndarray:
    q = np.array([qw, qx, qy, qz], np.float64)
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _sorted_files(folder: str, ext: str) -> List[str]:
    return [
        os.path.join(folder, f)
        for f in sorted(os.listdir(folder))
        if f.endswith(ext)
    ]


class TartanAirShibuyaDataProvider:
    def __init__(
        self,
        path: str,
        depth_scale: float = 1.0,
        max_objects: int = 16,
        pad_to_multiple: int = 0,
    ):
        self.path = path
        self.depth_scale = depth_scale
        self.max_objects = max_objects
        self.pad_to_multiple = pad_to_multiple

        self._rgb = _sorted_files(os.path.join(path, "image_0"), ".png")
        self._depth = _sorted_files(os.path.join(path, "depth_0"), ".png")
        self._mask = _sorted_files(os.path.join(path, "mask_0"), ".png")
        self._flow = _sorted_files(os.path.join(path, "flow_0"), ".flo")
        # flow-file count defines the dataset size (TartanAirShibuya.cc:138)
        self._n = len(self._flow)
        if self._n == 0:
            raise FileNotFoundError(f"no flow files under {path}/flow_0")

        import cv2

        first = cv2.imread(self._rgb[0])
        self._h, self._w = first.shape[:2]

        self._intr = cam.CameraIntrinsics.create(
            width=self._padded(self._w), height=self._padded(self._h),
            **INTRINSICS,
        )
        self._times = self._load_times()
        self._poses = self._load_gt_poses()

    # ------------------------------------------------------------------
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

    def _load_times(self) -> List[float]:
        fname = os.path.join(self.path, "times.txt")
        times: List[float] = []
        if os.path.exists(fname):
            with open(fname) as f:
                times = [float(v) for v in f.read().split()]
            # reference re-sorts: raw timestamps are not all ascending
            times.sort()
        return times

    def _load_gt_poses(self) -> List[np.ndarray]:
        fname = os.path.join(self.path, "gt_pose.txt")
        poses: List[np.ndarray] = []
        if not os.path.exists(fname):
            return poses
        first_inv = None
        with open(fname) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                t, tx, ty, tz, qx, qy, qz, qw = (float(v) for v in line.split())
                T = np.eye(4)
                T[:3, :3] = _quat_to_R(qx, qy, qz, qw) @ R_NED_CV
                T[:3, 3] = (tx, ty, tz)
                if first_inv is None:
                    first_inv = np.linalg.inv(T)
                poses.append(first_inv @ T)
        return poses

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return self._n

    def timestamp(self, k: int) -> float:
        return self._times[k] if k < len(self._times) else float(k)

    def intrinsics(self) -> cam.CameraIntrinsics:
        return self._intr

    def frame(self, k: int) -> FrameInputs:
        import cv2

        rgb = cv2.cvtColor(cv2.imread(self._rgb[k]), cv2.COLOR_BGR2RGB)
        rgb = rgb.astype(np.float32) / 255.0
        depth = cv2.imread(self._depth[k], cv2.IMREAD_UNCHANGED).astype(
            np.float32
        )
        if self.depth_scale != 1.0:
            depth = depth / self.depth_scale
        mask = cv2.imread(self._mask[k], cv2.IMREAD_UNCHANGED).astype(np.int32)

        if k > 0:
            flow = read_flo(self._flow[k - 1])
        else:
            flow = np.zeros((self._h, self._w, 2), np.float32)

        return FrameInputs(
            frame_id=jnp.array(k, jnp.int32),
            rgb=jnp.asarray(self._pad(rgb)),
            depth=jnp.asarray(self._pad(depth)),
            flow=jnp.asarray(self._pad(flow)),
            mask=jnp.asarray(self._pad(mask)),
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
