"""Estimation CSV loggers with the reference's exact schemas.

Reference parity: /root/reference/dynosam_common/src/logger/Logger.cc:140-171
(EstimationModuleLogger): per-module files
  <module>_camera_pose_log.csv   frame_id,tx,ty,tz,qx,qy,qz,qw,gt_* (7)
  <module>_object_pose_log.csv   frame_id,object_id,pose(7),gt(7)
  <module>_object_motion_log.csv frame_id,object_id,motion(7),gt(7)
  <module>_map_points_log.csv    frame_id,object_id,tracklet_id,x,y,z (world)
  frame_id_timestamp.csv         frame_id,timestamp [ns]
Matching the schemas keeps the evaluation suite (and the reference's own
eval tooling) usable on our outputs.
"""

from __future__ import annotations

import csv
import os
from typing import Optional

import numpy as np


def _rot_to_quat_np(R: np.ndarray) -> np.ndarray:
    """Pure-numpy rotation->quaternion (xyzw), Shepperd's method.

    The logger writes thousands of rows per run; calling the JAX lie.rot_to
    _quat here dispatched a tiny device program (plus a blocking pull) PER
    CSV ROW — measured ~45 s of a 60-frame real-io run on the tunneled TPU.
    """
    R = np.asarray(R, np.float64)
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] >= R[1, 1] and R[0, 0] >= R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] >= R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([x, y, z, w])
    return q / np.linalg.norm(q)


def _pose_to_row(T) -> list:
    T = np.asarray(T)
    q = _rot_to_quat_np(T[:3, :3])
    t = T[:3, 3]
    return [t[0], t[1], t[2], q[0], q[1], q[2], q[3]]  # tx ty tz qx qy qz qw


class EstimationModuleLogger:
    def __init__(self, module_name: str, output_path: str):
        self.module = module_name
        self.path = output_path
        os.makedirs(output_path, exist_ok=True)
        self._files = {}
        self._writers = {}
        self._open(
            "camera_pose",
            ["frame_id", "tx", "ty", "tz", "qx", "qy", "qz", "qw",
             "gt_tx", "gt_ty", "gt_tz", "gt_qx", "gt_qy", "gt_qz", "gt_qw"],
        )
        self._open(
            "object_pose",
            ["frame_id", "object_id", "tx", "ty", "tz", "qx", "qy", "qz", "qw",
             "gt_tx", "gt_ty", "gt_tz", "gt_qx", "gt_qy", "gt_qz", "gt_qw"],
        )
        self._open(
            "object_motion",
            ["frame_id", "object_id", "tx", "ty", "tz", "qx", "qy", "qz", "qw",
             "gt_tx", "gt_ty", "gt_tz", "gt_qx", "gt_qy", "gt_qz", "gt_qw"],
        )
        self._open(
            "map_points",
            ["frame_id", "object_id", "tracklet_id", "x_world", "y_world", "z_world"],
        )
        # reference: Logger.cc:165-167 object_bbx_log schema
        self._open(
            "object_bbx",
            ["frame_id", "object_id", "min_bbx_x", "min_bbx_y", "min_bbx_z",
             "max_bbx_x", "max_bbx_y", "max_bbx_z",
             "px", "py", "pz", "qw", "qx", "qy", "qz"],
        )

    def _open(self, kind: str, header):
        fname = os.path.join(self.path, f"{self.module}_{kind}_log.csv")
        f = open(fname, "w", newline="")
        w = csv.writer(f)
        w.writerow(header)
        self._files[kind] = f
        self._writers[kind] = w
        self._headers = getattr(self, "_headers", {})
        self._headers[kind] = header

    def reset(self, kinds):
        """Truncate + reopen the given logs (used by full-batch mode to
        rewrite streamed rows from the final solve)."""
        for kind in kinds:
            self._files[kind].close()
            self._open(kind, self._headers[kind])

    # ------------------------------------------------------------------
    def log_camera_pose(self, frame_id: int, T, T_gt=None):
        gt = _pose_to_row(T_gt) if T_gt is not None else [""] * 7
        self._writers["camera_pose"].writerow([frame_id] + _pose_to_row(T) + gt)

    def log_object_pose(self, frame_id: int, object_id: int, L, L_gt=None):
        gt = _pose_to_row(L_gt) if L_gt is not None else [""] * 7
        self._writers["object_pose"].writerow(
            [frame_id, object_id] + _pose_to_row(L) + gt
        )

    def log_object_motion(self, frame_id: int, object_id: int, H, H_gt=None):
        gt = _pose_to_row(H_gt) if H_gt is not None else [""] * 7
        self._writers["object_motion"].writerow(
            [frame_id, object_id] + _pose_to_row(H) + gt
        )

    def log_object_bbx(self, frame_id: int, object_id: int, min_xyz, max_xyz, L):
        """3D bounding box of an object's landmarks + the object pose
        (reference: EstimationModuleLogger::logObjectBbxes, Logger.cc:365)."""
        row = _pose_to_row(L)
        # reference column order: px py pz qw qx qy qz
        pose_cols = [row[0], row[1], row[2], row[6], row[3], row[4], row[5]]
        self._writers["object_bbx"].writerow(
            [frame_id, object_id]
            + [float(v) for v in np.asarray(min_xyz)]
            + [float(v) for v in np.asarray(max_xyz)]
            + pose_cols
        )

    def log_map_points(self, frame_id: int, object_ids, tracklet_ids, points):
        w = self._writers["map_points"]
        for oid, tid, p in zip(
            np.asarray(object_ids), np.asarray(tracklet_ids), np.asarray(points)
        ):
            w.writerow([frame_id, int(oid), int(tid), p[0], p[1], p[2]])

    def close(self):
        for f in self._files.values():
            f.close()
        self._files = {}
