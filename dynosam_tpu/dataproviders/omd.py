"""Oxford Multimotion Dataset (OMD) loader, dyno-preprocessed layout.

Reference parity: /root/reference/dynosam/src/dataprovider/
OMDDataProvider.cc:963-1380 (`OMDOldAllLoader`, the active implementation).
On-disk layout:

  times.txt           one timestamp per line
  image_0/*.png       RGB frames (sorted directory listing)
  depth/*.png         uint16 disparity; metric depth =
                      baseline * fx / (raw / 256)  (OMDDataProvider.cc:1003)
  semantic/*.txt      instance masks as whitespace-separated int grids
  flow/*.flo          dense flow k -> k+1 stored at index k (served shifted,
                      like the KITTI loader: frame k carries flow k-1 -> k)
  pose_gt.txt         "frame" + 16 row-major 4x4 camera pose entries; poses
                      are aligned so the first equals identity (:1318-1341)
  object_pose.txt     8 values/line: frame obj tx ty tz rx ry rz — object
                      pose in the ORIGINAL (unaligned) world frame with an
                      axis-angle rotation (:1168-1260); re-aligned via the
                      camera pose like the reference (:1290-1300)
  oxford.yaml         Camera.fx/fy/cx/cy, Camera.baseline (:1319-1345)
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from dynosam_tpu.cv import camera as cam
from dynosam_tpu.dataproviders.kitti import read_flo
from dynosam_tpu.frontend.types import FrameInputs, GroundTruthFrame


def _axis_angle(r: np.ndarray) -> np.ndarray:
    angle = np.linalg.norm(r)
    if angle < 1e-12:
        return np.eye(3)
    k = r / angle
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def _load_oxford_yaml(path: str) -> Dict[str, float]:
    out: Dict[str, float] = {}
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if ":" not in line:
                continue
            k, v = line.split(":", 1)
            try:
                out[k.strip()] = float(v.strip())
            except ValueError:
                pass
    return out


class OmdDataProvider:
    """DatasetType enum 3 (DataProviderFactory.cc:54-110)."""

    def __init__(
        self,
        path: str,
        max_objects: int = 16,
        pad_to_multiple: int = 0,
        imu_window: int = 64,
    ):
        self.path = path
        self.max_objects = max_objects
        self.pad_to_multiple = pad_to_multiple
        self.imu_window = imu_window

        y = _load_oxford_yaml(os.path.join(path, "oxford.yaml"))
        self.fx = y.get("Camera.fx", 430.0)
        self.fy = y.get("Camera.fy", 430.0)
        self.cx = y.get("Camera.cx", 320.0)
        self.cy = y.get("Camera.cy", 240.0)
        self.baseline = y.get("Camera.baseline", 0.119)

        self._rgb = self._listdir("image_0", ".png")
        self._depth = self._listdir("depth", ".png")
        self._mask = self._listdir("semantic", ".txt")
        self._flow = self._listdir("flow", ".flo")
        self._n = len(self._rgb)

        self.timestamps: List[float] = []
        tf = os.path.join(path, "times.txt")
        if os.path.exists(tf):
            with open(tf) as f:
                self.timestamps = [float(s) for s in f.read().split()]

        import cv2

        first = cv2.imread(self._rgb[0])
        self._h, self._w = first.shape[:2]
        self._intr = cam.CameraIntrinsics.create(
            fx=self.fx, fy=self.fy, cx=self.cx, cy=self.cy,
            width=self._padded(self._w), height=self._padded(self._h),
            baseline=self.baseline,
        )
        self._poses, self._pose_raw = self._load_camera_poses()
        self._object_gt = self._load_object_poses()
        # IMU windows (imu.csv: t ax ay az gx gy gz per line, optional)
        self._imu = self._load_imu()

    # ------------------------------------------------------------------
    def _listdir(self, sub: str, ext: str) -> List[str]:
        d = os.path.join(self.path, sub)
        if not os.path.isdir(d):
            return []
        return [
            os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(ext)
        ]

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

    def _load_camera_poses(self):
        fname = os.path.join(self.path, "pose_gt.txt")
        aligned, raw = [], []
        if not os.path.exists(fname):
            return aligned, raw
        first_inv = None
        with open(fname) as f:
            for line in f:
                vals = line.split()
                if len(vals) < 17:
                    continue
                T = np.array([float(v) for v in vals[1:17]]).reshape(4, 4)
                raw.append(T)
                if first_inv is None:
                    first_inv = np.linalg.inv(T)
                aligned.append(first_inv @ T)
        return aligned, raw

    def _load_object_poses(self) -> Dict[int, Dict[int, np.ndarray]]:
        """frame -> {oid -> L in the ORIGINAL world frame}."""
        fname = os.path.join(self.path, "object_pose.txt")
        out: Dict[int, Dict[int, np.ndarray]] = {}
        if not os.path.exists(fname):
            return out
        with open(fname) as f:
            for line in f:
                vals = [float(v) for v in line.split()]
                if len(vals) < 8:
                    continue
                frame, oid = int(vals[0]), int(vals[1])
                L = np.eye(4)
                L[:3, 3] = vals[2:5]
                L[:3, :3] = _axis_angle(np.asarray(vals[5:8]))
                out.setdefault(frame, {})[oid] = L
        return out

    def _load_imu(self):
        fname = os.path.join(self.path, "imu.csv")
        if not os.path.exists(fname):
            return None
        rows = []
        with open(fname) as f:
            for line in f:
                line = line.replace(",", " ").split()
                if len(line) >= 7:
                    try:
                        rows.append([float(v) for v in line[:7]])
                    except ValueError:
                        continue
        return np.asarray(rows) if rows else None

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return self._n

    def intrinsics(self) -> cam.CameraIntrinsics:
        return self._intr

    def imu_window_for(self, k: int):
        """Padded (S, 7) [dt a g] rows + mask for (t_{k-1}, t_k]; None if the
        dataset has no imu.csv."""
        if self._imu is None or k <= 0 or k >= len(self.timestamps):
            return None
        t0, t1 = self.timestamps[k - 1], self.timestamps[k]
        # sample i covers [t_i, t_{i+1}): half-open selection over the frame
        # interval (ThreadSafeImuBuffer convention)
        sel = self._imu[(self._imu[:, 0] >= t0) & (self._imu[:, 0] < t1)]
        S = self.imu_window
        out = np.zeros((S, 7), np.float32)
        mask = np.zeros((S,), bool)
        times = list(sel[:S, 0]) + [t1]
        for i, row in enumerate(sel[:S]):
            out[i, 0] = times[i + 1] - times[i]
            out[i, 1:7] = row[1:7]
            mask[i] = True
        return out, mask

    def frame(self, k: int) -> FrameInputs:
        import cv2

        from dynosam_tpu import native

        rgb = cv2.cvtColor(cv2.imread(self._rgb[k]), cv2.COLOR_BGR2RGB)
        rgb = rgb.astype(np.float32) / 255.0
        raw = cv2.imread(self._depth[k], cv2.IMREAD_UNCHANGED).astype(np.float64)
        # depth = baseline * fx / (raw / 256)   (OMDDataProvider.cc:1003-1015)
        disp = raw / 256.0
        depth = np.where(
            disp > 1e-6, self.baseline * self.fx / np.maximum(disp, 1e-6), 0.0
        ).astype(np.float32)

        if k > 0 and k - 1 < len(self._flow):
            flow = read_flo(self._flow[k - 1])
        else:
            flow = np.zeros((self._h, self._w, 2), np.float32)
        mask = native.read_txt_mask(self._mask[k], self._h, self._w)

        imu = self.imu_window_for(k)
        extra = {}
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
        X = self._poses[k]
        X_raw = self._pose_raw[k]
        J = self.max_objects
        ids = np.full((J,), -1, np.int32)
        poses = np.tile(np.eye(4), (J, 1, 1))
        motions = np.tile(np.eye(4), (J, 1, 1))
        valid = np.zeros((J,), bool)
        objs = self._object_gt.get(k, {})
        prev = self._object_gt.get(k - 1, {})
        for j, (oid, L_raw) in enumerate(sorted(objs.items())[:J]):
            ids[j] = oid
            # reference: relative pose in camera, re-expressed in the aligned
            # world (OMDDataProvider.cc:1292-1299)
            L_w = X @ (np.linalg.inv(X_raw) @ L_raw)
            poses[j] = L_w
            valid[j] = True
            if oid in prev and k > 0:
                L_w_prev = self._poses[k - 1] @ (
                    np.linalg.inv(self._pose_raw[k - 1]) @ prev[oid]
                )
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
