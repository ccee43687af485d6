"""Virtual KITTI 2 loader — NATIVE layout (not the dyno-KITTI repack).

Reference parity: /root/reference/dynosam/src/dataprovider/
VirtualKittidataProvider.cc (1041 LoC). On-disk layout (scene/scene_type are
e.g. Scene01/clone):

  vkitti_2.0.3_rgb/{scene}/{type}/frames/rgb/Camera_0/rgb_%05d.jpg
  vkitti_2.0.3_depth/.../depth/Camera_0/depth_%05d.png
        uint16 depth in CENTIMETERS -> /100 m (:186-189)
  vkitti_2.0.3_forwardFlow/.../forwardFlow/Camera_0/flow_%05d.png
        16UC3 BGR: R,G = flow x,y normalized to [0, 2^16-1] over
        (w-1),(h-1); B==0 marks invalid (:110-165). File k holds the
        k -> k+1 flow; frame k serves file k-1 (the reference indexes at
        idx-1, :100-103)
  vkitti_2.0.3_instanceSegmentation/.../instanceSegmentation/Camera_0/
        instancegt_%05d.png — 8-bit INDEXED png, pixel = trackID + 1 (:744)
  vkitti_2.0.3_textgt/{scene}/{type}/
        intrinsic.txt  frame cameraID K[0,0] K[1,1] K[0,2] K[1,2]
        extrinsic.txt  frame cameraID + 16 row-major T_camera_world values;
                       X_k = align(inv(T)) (:569-640 — the fixed
                       camera_to_world factor cancels under first-frame
                       alignment)
        pose.txt       per-object camera-space pose: Euler angles via the
                       explicit rotation matrix at :512-545
        bbox.txt       per-object bbox + isMoving flag (:318-410)

Track ids are offset by +1 everywhere (getTrackID, :55-57) to match the
instance png indexing. MaskType::MOTION removes objects whose isMoving flag
is false (:777-799).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from dynosam_tpu.cv import camera as cam
from dynosam_tpu.frontend.types import FrameInputs, GroundTruthFrame


def decode_vkitti_flow(bgr16: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint16 BGR png content -> (H, W, 2) float32 flow."""
    h, w = bgr16.shape[:2]
    f = bgr16.astype(np.float32) * (2.0 / (2.0**16 - 1.0)) - 1.0
    flow_x = f[..., 2] * (w - 1.0)     # R channel
    flow_y = f[..., 1] * (h - 1.0)     # G channel
    invalid = bgr16[..., 0] == 0       # B == 0
    out = np.stack([flow_x, flow_y], axis=-1)
    out[invalid] = 0.0
    return out


def _euler_camera_rotation(rx: float, ry: float, rz: float) -> np.ndarray:
    """The reference's explicit Euler composition for camera-space object
    rotations (VirtualKittidataProvider.cc:512-545)."""
    cy, sy = np.cos(ry), np.sin(ry)
    cx, sx = np.cos(rx), np.sin(rx)
    cz, sz = np.cos(rz), np.sin(rz)
    return np.array(
        [
            [cy * cz + sy * sx * sz, -cy * sz + sy * sx * cz, sy * cx],
            [cx * sz, cx * cz, -sx],
            [-sy * cz + cy * sx * sz, sy * sz + cy * sx * cz, cy * cx],
        ]
    )


class VirtualKittiDataProvider:
    """DatasetType enum 1. mask_type: 'motion' removes static objects."""

    def __init__(
        self,
        path: str,
        scene: str = "Scene01",
        scene_type: str = "clone",
        mask_type: str = "motion",
        max_objects: int = 16,
        pad_to_multiple: int = 0,
        version: str = "vkitti_2.0.3",
    ):
        self.path = path
        self.max_objects = max_objects
        self.pad_to_multiple = pad_to_multiple
        self.mask_type = mask_type

        def sub(kind, leaf):
            return os.path.join(
                path, f"{version}_{kind}", scene, scene_type, "frames", leaf,
                "Camera_0",
            )

        self._rgb_dir = sub("rgb", "rgb")
        self._depth_dir = sub("depth", "depth")
        self._flow_dir = sub("forwardFlow", "forwardFlow")
        self._inst_dir = sub("instanceSegmentation", "instanceSegmentation")
        self._textgt = os.path.join(path, f"{version}_textgt", scene, scene_type)

        self._n = len(
            [f for f in os.listdir(self._rgb_dir) if f.startswith("rgb_")]
        )
        import cv2

        first = cv2.imread(os.path.join(self._rgb_dir, "rgb_00000.jpg"))
        self._h, self._w = first.shape[:2]

        self._K = self._load_intrinsics()
        self._intr = cam.CameraIntrinsics.create(
            fx=self._K[0], fy=self._K[1], cx=self._K[2], cy=self._K[3],
            width=self._padded(self._w), height=self._padded(self._h),
            baseline=0.532725,           # KITTI rig baseline (vkitti clone)
        )
        self._poses = self._load_extrinsics()
        self._objects = self._load_pose_txt()    # frame -> {oid: L_cam}
        self._moving = self._load_bbox_moving()  # frame -> {oid: isMoving}

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

    def _load_intrinsics(self) -> Tuple[float, float, float, float]:
        fname = os.path.join(self._textgt, "intrinsic.txt")
        with open(fname) as f:
            next(f)  # header
            for line in f:
                vals = line.split()
                if len(vals) >= 6 and int(vals[1]) == 0:
                    return tuple(float(v) for v in vals[2:6])
        raise ValueError(f"no camera-0 intrinsics in {fname}")

    def _load_extrinsics(self) -> List[np.ndarray]:
        fname = os.path.join(self._textgt, "extrinsic.txt")
        poses = []
        first_inv = None
        with open(fname) as f:
            next(f)  # header
            for line in f:
                vals = line.split()
                if len(vals) != 18 or int(vals[1]) != 0:
                    continue
                T_cw = np.array([float(v) for v in vals[2:18]]).reshape(4, 4)
                X = np.linalg.inv(T_cw)
                if first_inv is None:
                    first_inv = np.linalg.inv(X)
                poses.append(first_inv @ X)
        return poses

    def _load_pose_txt(self) -> Dict[int, Dict[int, np.ndarray]]:
        fname = os.path.join(self._textgt, "pose.txt")
        out: Dict[int, Dict[int, np.ndarray]] = {}
        with open(fname) as f:
            header = f.readline().split()
            col = {name: i for i, name in enumerate(header)}
            for line in f:
                vals = line.split()
                if not vals or int(vals[col["cameraID"]]) != 0:
                    continue
                frame = int(vals[col["frame"]])
                oid = int(vals[col["trackID"]]) + 1
                t = np.array(
                    [
                        float(vals[col["camera_space_X"]]),
                        float(vals[col["camera_space_Y"]]),
                        float(vals[col["camera_space_Z"]]),
                    ]
                )
                R = _euler_camera_rotation(
                    float(vals[col["rotation_camera_space_x"]]),
                    float(vals[col["rotation_camera_space_y"]]),
                    float(vals[col["rotation_camera_space_z"]]),
                )
                L = np.eye(4)
                L[:3, :3] = R
                L[:3, 3] = t
                out.setdefault(frame, {})[oid] = L
        return out

    def _load_bbox_moving(self) -> Dict[int, Dict[int, bool]]:
        fname = os.path.join(self._textgt, "bbox.txt")
        out: Dict[int, Dict[int, bool]] = {}
        if not os.path.exists(fname):
            return out
        with open(fname) as f:
            header = f.readline().split()
            col = {name: i for i, name in enumerate(header)}
            for line in f:
                vals = line.split()
                if not vals or int(vals[col["cameraID"]]) != 0:
                    continue
                frame = int(vals[col["frame"]])
                oid = int(vals[col["trackID"]]) + 1
                out.setdefault(frame, {})[oid] = vals[col["isMoving"]] == "True"
        return out

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return self._n

    def intrinsics(self) -> cam.CameraIntrinsics:
        return self._intr

    def _load_instance_mask(self, k: int) -> np.ndarray:
        """8-bit indexed png: the palette INDEX is the label (trackID+1)."""
        from PIL import Image

        img = Image.open(
            os.path.join(self._inst_dir, f"instancegt_{k:05d}.png")
        )
        if img.mode != "P":
            img = img.convert("P")
        mask = np.asarray(img, dtype=np.int32)
        if self.mask_type == "motion":
            moving = self._moving.get(k, {})
            static_ids = [oid for oid, m in moving.items() if not m]
            if static_ids:
                mask = np.where(np.isin(mask, static_ids), 0, mask)
        return mask

    def frame(self, k: int) -> FrameInputs:
        import cv2

        rgb = cv2.cvtColor(
            cv2.imread(os.path.join(self._rgb_dir, f"rgb_{k:05d}.jpg")),
            cv2.COLOR_BGR2RGB,
        ).astype(np.float32) / 255.0
        depth_cm = cv2.imread(
            os.path.join(self._depth_dir, f"depth_{k:05d}.png"),
            cv2.IMREAD_UNCHANGED,
        )
        depth = depth_cm.astype(np.float32) / 100.0
        if k > 0:
            bgr16 = cv2.imread(
                os.path.join(self._flow_dir, f"flow_{k - 1:05d}.png"),
                cv2.IMREAD_UNCHANGED,
            )
            flow = decode_vkitti_flow(bgr16)
        else:
            flow = np.zeros((self._h, self._w, 2), np.float32)
        mask = self._load_instance_mask(k)
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
        objs = self._objects.get(k, {})
        prev = self._objects.get(k - 1, {})
        for j, (oid, L_cam) in enumerate(sorted(objs.items())[:J]):
            ids[j] = oid
            L_w = X @ L_cam
            poses[j] = L_w
            valid[j] = True
            if oid in prev and k > 0:
                L_w_prev = self._poses[k - 1] @ prev[oid]
                motions[j] = L_w @ np.linalg.inv(L_w_prev)
        # HOST arrays: GT is only consumed host-side (logging/eval);
        # device-putting it costs a round trip per field per log row
        return GroundTruthFrame(
            X_world_cam=np.asarray(X, np.float32),
            object_ids=np.asarray(ids, np.int32),
            object_poses=np.asarray(poses, np.float32),
            object_motions=np.asarray(motions, np.float32),
            object_valid=np.asarray(valid, bool),
        )

    def __iter__(self):
        for k in range(len(self)):
            yield self.frame(k), self.ground_truth(k)
