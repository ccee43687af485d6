"""KITTI-tracking (dyno-preprocessed) dataset loader.

Reference parity: /root/reference/dynosam/include/dynosam/dataprovider/
KittiDataProvider.hpp + src/dataprovider/DatasetLoader.cc +
dynosam_common/src/utils/FileSystem.cc. On-disk layout:

  image_0/%06d.png    RGB frames
  flow/%06d.flo       dense optical flow k -> k+1 stored at frame k
                      (Middlebury .flo)
  depth/%06d.png      uint16 disparity; metric depth =
                      base_line / (raw / depth_scale_factor)
                      (FileSystem.cc loadDepth + KittiDataLoader depth
                      preprocessing, KittiDataProvider.hpp:490-513)
  motion/%06d.txt     instance masks as whitespace-separated int grids
  semantic/%06d.txt   (MaskType::MOTION vs SEMANTIC_INSTANCE)
  times.txt           per-frame timestamps
  pose_gt.txt         "frame_id" + 16 row-major 4x4 entries per line; poses
                      aligned so the first equals identity
                      (KittiCameraPoseFolder, KittiDataProvider.hpp:54-95)
  object_pose.txt     10 values/line: frame obj_id bbox(4) t(3) ry; object
                      pose in the *camera* frame, R from yaw+pi/2
                      (constructObjectPoseGT, KittiDataProvider.hpp:225-292)

Note the flow-timing difference: the reference reads flow[k] as the k -> k+1
flow and uses it to predict frame k+1; our FrameInputs contract wants the
(k-1 -> k) flow delivered *with frame k*, so frame k serves flow file k-1.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from dynosam_tpu.cv import camera as cam
from dynosam_tpu.frontend.types import FrameInputs, GroundTruthFrame
from dynosam_tpu.utils import lie

# KITTI tracking camera intrinsics (sequence-dependent; these are the common
# values for sequences 0000-0013 — override via constructor for others).
DEFAULT_INTRINSICS = dict(fx=721.5377, fy=721.5377, cx=609.5593, cy=172.854)


def read_flo(path: str) -> np.ndarray:
    """Middlebury .flo reader -> (H, W, 2) float32."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if len(magic) == 0 or magic[0] != 202021.25:
            raise ValueError(f"Invalid .flo file: {path}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def read_txt_mask(path: str, shape: Tuple[int, int]) -> np.ndarray:
    mask = np.loadtxt(path, dtype=np.int32)
    assert mask.shape == shape, (mask.shape, shape)
    return mask


def _yaw_pose(t: np.ndarray, ry: float) -> np.ndarray:
    """Object pose from KITTI yaw (constructObjectPoseGT rotation order)."""
    y = ry + np.pi / 2
    cy, sy = np.cos(y), np.sin(y)
    # the reference's Euler composition with x = z = 0 reduces to a rotation
    # about the camera y-axis
    R = np.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


class KittiDataProvider:
    def __init__(
        self,
        path: str,
        base_line: float = 387.5744,
        depth_scale_factor: float = 256.0,
        mask_folder: str = "motion",
        mask_format: str = "txt",
        intrinsics: Optional[Dict[str, float]] = None,
        max_objects: int = 16,
        pad_to_multiple: int = 0,
    ):
        self.path = path
        # dataset-local DatasetParams.yaml (reference keys,
        # KittiDataLoader::Params::fromYaml, KittiDataProvider.hpp:364-377,
        # extended with intrinsics) overrides the hardcoded defaults;
        # explicit constructor arguments override both.
        dp = self._load_dataset_params()
        self.base_line = dp.get("base_line", base_line) if base_line == 387.5744 else base_line
        self.depth_scale_factor = (
            dp.get("depth_scale_factor", depth_scale_factor)
            if depth_scale_factor == 256.0
            else depth_scale_factor
        )
        if "mask_type" in dp and mask_folder == "motion":
            mask_folder = (
                "motion" if str(dp["mask_type"]).upper() == "MOTION" else "semantic"
            )
        self.mask_folder = mask_folder
        self.mask_format = mask_format
        self.max_objects = max_objects
        self.pad_to_multiple = pad_to_multiple
        if intrinsics is None and all(
            k in dp for k in ("fx", "fy", "cx", "cy")
        ):
            intrinsics = {k: float(dp[k]) for k in ("fx", "fy", "cx", "cy")}

        rgb_dir = os.path.join(path, "image_0")
        self._n = len(
            [f for f in os.listdir(rgb_dir) if f.endswith(".png")]
        )
        import cv2

        first = cv2.imread(os.path.join(rgb_dir, "000000.png"))
        self._h, self._w = first.shape[:2]

        ip = dict(DEFAULT_INTRINSICS)
        if intrinsics:
            ip.update(intrinsics)
        self._intr = cam.CameraIntrinsics.create(
            fx=ip["fx"], fy=ip["fy"], cx=ip["cx"], cy=ip["cy"],
            width=self._padded(self._w), height=self._padded(self._h),
            baseline=base_line / ip["fx"],
        )

        self._poses = self._load_camera_poses()
        self._object_gt = self._load_object_poses()

    # ------------------------------------------------------------------
    def _load_dataset_params(self) -> Dict[str, float]:
        fname = os.path.join(self.path, "DatasetParams.yaml")
        out: Dict[str, float] = {}
        if not os.path.exists(fname):
            return out
        with open(fname) as f:
            for line in f:
                line = line.split("#", 1)[0].strip()
                if ":" not in line:
                    continue
                k, v = line.split(":", 1)
                v = v.strip()
                try:
                    out[k.strip()] = float(v)
                except ValueError:
                    out[k.strip()] = v
        return out

    def _padded(self, x: int) -> int:
        m = self.pad_to_multiple
        return x if m <= 0 else ((x + m - 1) // m) * m

    def _pad(self, img: np.ndarray, value=0.0) -> np.ndarray:
        H, W = self._padded(self._h), self._padded(self._w)
        if img.shape[0] == H and img.shape[1] == W:
            return img
        pad = [(0, H - img.shape[0]), (0, W - img.shape[1])] + [
            (0, 0)
        ] * (img.ndim - 2)
        return np.pad(img, pad, constant_values=value)

    def _load_camera_poses(self) -> List[np.ndarray]:
        fname = os.path.join(self.path, "pose_gt.txt")
        poses = []
        if not os.path.exists(fname):
            return poses
        first_inv = None
        with open(fname) as f:
            for line in f:
                vals = line.split()
                if len(vals) < 17:
                    continue
                T = np.array([float(v) for v in vals[1:17]]).reshape(4, 4)
                if first_inv is None:
                    first_inv = np.linalg.inv(T)
                poses.append(first_inv @ T)
        return poses

    def _load_object_poses(self) -> Dict[int, Dict[int, np.ndarray]]:
        """frame -> {object_id -> L_camera (4,4)}."""
        fname = os.path.join(self.path, "object_pose.txt")
        out: Dict[int, Dict[int, np.ndarray]] = {}
        if not os.path.exists(fname):
            return out
        with open(fname) as f:
            for line in f:
                vals = [float(v) for v in line.split()]
                if len(vals) < 10:
                    continue
                frame, oid = int(vals[0]), int(vals[1])
                t = np.array(vals[6:9])
                L_cam = _yaw_pose(t, vals[9])
                out.setdefault(frame, {})[oid] = L_cam
        return out

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return self._n

    def intrinsics(self) -> cam.CameraIntrinsics:
        return self._intr

    def frame(self, k: int) -> FrameInputs:
        import cv2

        name = f"{k:06d}"
        rgb = cv2.cvtColor(
            cv2.imread(os.path.join(self.path, "image_0", name + ".png")),
            cv2.COLOR_BGR2RGB,
        ).astype(np.float32) / 255.0

        from dynosam_tpu import native

        raw = cv2.imread(
            os.path.join(self.path, "depth", name + ".png"), cv2.IMREAD_UNCHANGED
        )
        depth = native.disparity_to_depth(
            raw.astype(np.uint16), self.base_line, self.depth_scale_factor
        )

        # frame k carries the (k-1 -> k) flow = flow file k-1 (see module doc)
        if k > 0:
            flow = native.read_flo(
                os.path.join(self.path, "flow", f"{k - 1:06d}.flo"),
                self._h, self._w,
            )
        else:
            flow = np.zeros((self._h, self._w, 2), np.float32)

        if self.mask_format == "txt":
            mask = native.read_txt_mask(
                os.path.join(self.path, self.mask_folder, name + ".txt"),
                self._h, self._w,
            )
        else:
            mask = cv2.imread(
                os.path.join(self.path, self.mask_folder, name + ".png"),
                cv2.IMREAD_UNCHANGED,
            ).astype(np.int32)

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
        X = self._poses[k]
        J = self.max_objects
        ids = np.full((J,), -1, np.int32)
        poses = np.tile(np.eye(4), (J, 1, 1))
        motions = np.tile(np.eye(4), (J, 1, 1))
        valid = np.zeros((J,), bool)
        objs = self._object_gt.get(k, {})
        prev = self._object_gt.get(k - 1, {})
        for j, (oid, L_cam) in enumerate(sorted(objs.items())[:J]):
            ids[j] = oid
            L_w = X @ L_cam
            poses[j] = L_w
            valid[j] = True
            if oid in prev and k > 0:
                L_w_prev = self._poses[k - 1] @ prev[oid]
                motions[j] = L_w @ np.linalg.inv(L_w_prev)
        # HOST arrays: ground truth is only consumed host-side (logging /
        # evaluation); device-putting it costs a device->host round trip PER
        # FIELD at every log row on tunneled runtimes.
        return GroundTruthFrame(
            X_world_cam=np.asarray(X, np.float32),
            object_ids=ids,
            object_poses=np.asarray(poses, np.float32),
            object_motions=np.asarray(motions, np.float32),
            object_valid=valid,
        )

    def __iter__(self):
        for k in range(len(self)):
            yield self.frame(k), self.ground_truth(k)
