"""Project Aria loader (egocentric RGB-D, dyno-preprocessed layout).

Reference parity: /root/reference/dynosam/src/dataprovider/
ProjectAriaDataProvider.cc (382 LoC). On-disk layout:

  rgb_sync/*.png        RGB frames (synchronised)
  right/*.png           right greyscale stream (raw — one extra file, the
                        reference pops the last, :189-192)
  depth_sync/*.png      depth, imread-unchanged -> float (loadDepth applies
                        no scaling; `depth_scale` divides raw values for
                        16-bit-packed fixtures)
  optical_flow/<t_ns>.flo  flow files; their count DEFINES the dataset size
                        and their stems are nanosecond timestamps (:157-174)
  instance_masks/*.png  masks with arbitrary ids, relabelled 1..N with a
                        PERSISTENT mapping across frames (:108-137)
  calibration_undistort.json / sync_timestamp.csv exist on disk but the
  reference hardcodes the rectified pinhole (:260-275):
  fx = 267.644012, fy = 311.656128, cx = 267.644012, cy = 174.2612, 640x360.

No ground-truth trajectory ships with the preprocessed sequences; the
reference's GT packets are empty and evaluation is qualitative.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from dynosam_tpu.cv import camera as cam
from dynosam_tpu.dataproviders.kitti import read_flo
from dynosam_tpu.frontend.types import FrameInputs, GroundTruthFrame

INTRINSICS = dict(fx=267.644012, fy=311.656128, cx=267.644012, cy=174.2612)


class ProjectAriaDataProvider:
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

        def listing(sub):
            d = os.path.join(path, sub)
            return [os.path.join(d, f) for f in sorted(os.listdir(d))]

        self._rgb = listing("rgb_sync")
        self._right = listing("right")
        if len(self._right) == len(self._rgb) + 1:
            self._right = self._right[:-1]      # raw stream has one extra
        self._depth = listing("depth_sync")
        self._mask = listing("instance_masks")
        self._flow = listing("optical_flow")
        self._n = len(self._flow)
        if self._n == 0:
            raise FileNotFoundError(f"no flow files under {path}/optical_flow")
        self.timestamps: List[float] = [
            float(os.path.splitext(os.path.basename(f))[0]) / 1e9
            for f in self._flow
        ]

        import cv2

        first = cv2.imread(self._rgb[0])
        self._h, self._w = first.shape[:2]
        self._intr = cam.CameraIntrinsics.create(
            width=self._padded(self._w), height=self._padded(self._h),
            **INTRINSICS,
        )
        # persistent mask relabelling 1..N (getInstanceMask, :108-137)
        self._relabel: Dict[int, int] = {}

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

    def _relabel_mask(self, mask: np.ndarray) -> np.ndarray:
        out = np.zeros_like(mask)
        for old in (int(v) for v in np.unique(mask) if v != 0):
            if old not in self._relabel:
                self._relabel[old] = len(self._relabel) + 1
            out[mask == old] = self._relabel[old]
        return out

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return self._n

    def timestamp(self, k: int) -> float:
        return self.timestamps[k]

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
        mask_raw = cv2.imread(self._mask[k], cv2.IMREAD_UNCHANGED)
        if mask_raw.ndim == 3:
            mask_raw = mask_raw[..., 0]
        mask = self._relabel_mask(mask_raw.astype(np.int32))

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
        return None  # no GT ships with the preprocessed Aria sequences

    def __iter__(self):
        for k in range(len(self)):
            yield self.frame(k), self.ground_truth(k)
