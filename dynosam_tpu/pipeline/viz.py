"""Visualization: tracking overlays and trajectory dumps.

The role of the reference's display pipelines (dynosam_ros displays +
ImageDisplayQueue -> OpenCV windows, FrontendDSDRos.cc:45-63) without ROS:
render tracking images (static/dynamic features colour-coded by object id,
object boxes) and top-down trajectory plots to PNG files.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

# distinct object colours (BGR), index by object_id % len
_COLOURS = [
    (66, 135, 245), (52, 235, 86), (235, 64, 52), (235, 192, 52),
    (168, 52, 235), (52, 235, 222), (235, 52, 155), (130, 235, 52),
]


def render_tracking_image(
    rgb: np.ndarray,
    packet,
    radius: int = 2,
) -> np.ndarray:
    """Overlay tracked features on the RGB frame (FeatureTracker viz parity).

    Static features are green dots; dynamic features are coloured by object
    id. Returns an HxWx3 uint8 BGR image (cv2 convention).
    """
    import cv2

    img = np.ascontiguousarray(
        (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)[..., ::-1]
    )

    st = packet.static_tracks
    uv = np.asarray(st.uv)
    for i in np.nonzero(np.asarray(st.valid))[0]:
        cv2.circle(img, (int(uv[i, 0]), int(uv[i, 1])), radius, (0, 200, 0), -1)

    dt = packet.dynamic_tracks
    uv = np.asarray(dt.uv)
    oids = np.asarray(dt.object_id)
    for i in np.nonzero(np.asarray(dt.valid))[0]:
        c = _COLOURS[int(oids[i]) % len(_COLOURS)]
        cv2.circle(img, (int(uv[i, 0]), int(uv[i, 1])), radius, c, -1)

    # object bounding boxes from their feature extents
    for oid in np.unique(oids[np.asarray(dt.valid)]):
        if oid <= 0:
            continue
        sel = (oids == oid) & np.asarray(dt.valid)
        pts = uv[sel]
        x1, y1 = pts.min(axis=0)
        x2, y2 = pts.max(axis=0)
        c = _COLOURS[int(oid) % len(_COLOURS)]
        cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), c, 1)
        cv2.putText(img, str(int(oid)), (int(x1), int(y1) - 3),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.4, c, 1)
    return img


def render_trajectory_topdown(
    trajectory: np.ndarray,
    object_poses: Optional[dict] = None,
    size: int = 512,
    margin: float = 0.1,
) -> np.ndarray:
    """Top-down (x-z) trajectory plot. trajectory: (K, 4, 4).

    object_poses: optional {object_id: (K_j, 4, 4)} trails.
    """
    import cv2

    img = np.full((size, size, 3), 255, np.uint8)
    pts = [np.asarray(trajectory)[:, [0, 2], 3]]
    if object_poses:
        pts += [np.asarray(v)[:, [0, 2], 3] for v in object_poses.values()]
    allp = np.concatenate(pts, axis=0)
    lo = allp.min(axis=0)
    hi = allp.max(axis=0)
    span = np.maximum(hi - lo, 1e-3)
    scale = size * (1 - 2 * margin) / span.max()

    def to_px(p):
        q = (p - lo) * scale + size * margin
        return int(q[0]), size - int(q[1])

    cam = pts[0]
    for a, b in zip(cam[:-1], cam[1:]):
        cv2.line(img, to_px(a), to_px(b), (180, 60, 0), 2)
    if object_poses:
        for oid, traj in object_poses.items():
            c = _COLOURS[int(oid) % len(_COLOURS)]
            t = np.asarray(traj)[:, [0, 2], 3]
            for a, b in zip(t[:-1], t[1:]):
                cv2.line(img, to_px(a), to_px(b), c, 1)
    return img


class DisplayWriter:
    """Dumps per-frame tracking images + a final trajectory plot to disk
    (the ImageDisplayQueue / display-node replacement)."""

    def __init__(self, output_path: str, every: int = 1):
        self.path = os.path.join(output_path, "viz")
        os.makedirs(self.path, exist_ok=True)
        self.every = every
        self._count = 0

    def write_tracking(self, rgb, packet):
        import cv2

        if self._count % self.every == 0:
            img = render_tracking_image(rgb, packet)
            cv2.imwrite(
                os.path.join(self.path, f"tracking_{self._count:06d}.png"), img
            )
        self._count += 1

    def write_trajectory(self, trajectory, object_poses=None):
        import cv2

        img = render_trajectory_topdown(np.stack(trajectory), object_poses)
        cv2.imwrite(os.path.join(self.path, "trajectory_topdown.png"), img)

    def write_video(self, fps: float = 10.0, name: str = "tracking.mp4"):
        """Assemble the dumped tracking frames into a video (the live-display
        role of the reference's OpenCVImageDisplayQueue; headless here)."""
        import cv2

        frames = sorted(
            f for f in os.listdir(self.path)
            if f.startswith("tracking_") and f.endswith(".png")
        )
        if not frames:
            return None
        first = cv2.imread(os.path.join(self.path, frames[0]))
        h, w = first.shape[:2]
        out_path = os.path.join(self.path, name)
        vw = cv2.VideoWriter(
            out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        for f in frames:
            vw.write(cv2.imread(os.path.join(self.path, f)))
        vw.release()
        return out_path
