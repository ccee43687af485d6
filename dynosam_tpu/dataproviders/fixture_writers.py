"""Serialize rendered scenes into the OMD and native-VKITTI on-disk formats.

Counterparts of `kitti_writer.py` for the other two benchmark layouts — a
written sequence is a bit-faithful fixture validating each loader's decode
conventions (disparity scaling, VKITTI 16-bit flow encoding, indexed-png
instance masks, GT frame conventions) against analytic ground truth.

Formats per the reference loaders:
  * OMD: /root/reference/dynosam/src/dataprovider/OMDDataProvider.cc:963-1380
  * VKITTI: /root/reference/dynosam/src/dataprovider/
    VirtualKittidataProvider.cc (see vkitti.py for the field map)
"""

from __future__ import annotations

import os

import numpy as np

from dynosam_tpu.dataproviders.kitti_writer import _yaw_from_rotation, write_flo


def _axis_angle_from_R(R: np.ndarray) -> np.ndarray:
    cos = np.clip((np.trace(R) - 1) / 2, -1.0, 1.0)
    theta = np.arccos(cos)
    if theta < 1e-12:
        return np.zeros(3)
    w = np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    ) / (2 * np.sin(theta))
    return w * theta


def write_omd_sequence(
    dense, out_dir: str, timestep: float = 0.1, imu: bool = False
) -> None:
    """DenseScenario -> OMD (old dyno) layout."""
    import cv2

    for sub in ("image_0", "flow", "depth", "semantic"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    scn = dense.scn
    intr = dense.intr
    n = scn.spec.num_frames
    fx = float(intr.fx)
    baseline = float(intr.baseline)
    X_gt = [np.asarray(x, np.float64) for x in scn.X_gt]
    frames = [dense.frame(k) for k in range(n)]

    with open(os.path.join(out_dir, "times.txt"), "w") as f:
        for k in range(n):
            f.write(f"{k * timestep:.6f}\n")

    with open(os.path.join(out_dir, "oxford.yaml"), "w") as f:
        f.write(
            f"Camera.fx: {fx}\nCamera.fy: {float(intr.fy)}\n"
            f"Camera.cx: {float(intr.cx)}\nCamera.cy: {float(intr.cy)}\n"
            f"Camera.baseline: {baseline}\n"
        )

    with open(os.path.join(out_dir, "pose_gt.txt"), "w") as f:
        for k in range(n):
            vals = " ".join(f"{v:.9f}" for v in X_gt[k].reshape(-1))
            f.write(f"{k} {vals}\n")

    obj_lines = []
    for k in range(n):
        inp = frames[k]
        name = f"{k:06d}"
        rgb = np.asarray(inp.rgb)
        cv2.imwrite(
            os.path.join(out_dir, "image_0", name + ".png"),
            cv2.cvtColor((rgb * 255.0).astype(np.uint8), cv2.COLOR_RGB2BGR),
        )
        # raw = disparity * 256, depth = baseline * fx / disparity
        depth = np.asarray(inp.depth, np.float64)
        disp = baseline * fx / np.maximum(depth, 1e-6)
        cv2.imwrite(
            os.path.join(out_dir, "depth", name + ".png"),
            np.clip(np.round(disp * 256.0), 0, 65535).astype(np.uint16),
        )
        mask = np.asarray(inp.mask, np.int32)
        np.savetxt(os.path.join(out_dir, "semantic", name + ".txt"), mask, fmt="%d")
        if k + 1 < n:
            write_flo(
                os.path.join(out_dir, "flow", name + ".flo"),
                np.asarray(frames[k + 1].flow),
            )

        for j, oid in enumerate(scn.object_ids):
            if not (mask == oid).any():
                continue
            L_w = np.asarray(scn.L_gt[j][k], np.float64)
            r = _axis_angle_from_R(L_w[:3, :3])
            t = L_w[:3, 3]
            obj_lines.append(
                f"{k} {oid} {t[0]:.9f} {t[1]:.9f} {t[2]:.9f} "
                f"{r[0]:.9f} {r[1]:.9f} {r[2]:.9f}"
            )
    with open(os.path.join(out_dir, "object_pose.txt"), "w") as f:
        f.write("\n".join(obj_lines) + "\n")

    if imu:
        # exact IMU from the piecewise-constant-twist GT (simulator contract)
        rows = []
        for k in range(1, n):
            samples, valid = scn.imu_window(k, n_samples=32)
            t0 = (k - 1) * timestep
            s = np.asarray(samples, np.float64)
            # sample i applies over [t_i, t_{i+1}): write START timestamps
            ts = t0 + np.cumsum(s[:, 0]) - s[:, 0]
            for i in range(s.shape[0]):
                if valid[i]:
                    rows.append([float(ts[i])] + s[i, 1:7].tolist())
        with open(os.path.join(out_dir, "imu.csv"), "w") as f:
            for r in rows:
                f.write(" ".join(f"{v:.9f}" for v in r) + "\n")


def encode_vkitti_flow(flow: np.ndarray) -> np.ndarray:
    """(H, W, 2) float flow -> (H, W, 3) uint16 BGR (VKITTI png content)."""
    h, w = flow.shape[:2]
    scale = (2.0**16 - 1.0) / 2.0
    fx16 = np.clip((flow[..., 0] / (w - 1.0) + 1.0) * scale, 0, 65535)
    fy16 = np.clip((flow[..., 1] / (h - 1.0) + 1.0) * scale, 0, 65535)
    b = np.full_like(fx16, 65535.0)           # valid everywhere
    return np.stack([b, fy16, fx16], axis=-1).round().astype(np.uint16)


def write_vkitti_sequence(
    dense,
    out_dir: str,
    scene: str = "Scene01",
    scene_type: str = "clone",
    version: str = "vkitti_2.0.3",
) -> None:
    """DenseScenario -> native VKITTI-2 layout."""
    import cv2
    from PIL import Image

    def sub(kind, leaf):
        d = os.path.join(
            out_dir, f"{version}_{kind}", scene, scene_type, "frames", leaf,
            "Camera_0",
        )
        os.makedirs(d, exist_ok=True)
        return d

    rgb_dir = sub("rgb", "rgb")
    depth_dir = sub("depth", "depth")
    flow_dir = sub("forwardFlow", "forwardFlow")
    inst_dir = sub("instanceSegmentation", "instanceSegmentation")
    textgt = os.path.join(out_dir, f"{version}_textgt", scene, scene_type)
    os.makedirs(textgt, exist_ok=True)

    scn = dense.scn
    intr = dense.intr
    n = scn.spec.num_frames
    X_gt = [np.asarray(x, np.float64) for x in scn.X_gt]
    frames = [dense.frame(k) for k in range(n)]

    with open(os.path.join(textgt, "intrinsic.txt"), "w") as f:
        f.write("frame cameraID K[0,0] K[1,1] K[0,2] K[1,2]\n")
        for k in range(n):
            f.write(
                f"{k} 0 {float(intr.fx)} {float(intr.fy)} "
                f"{float(intr.cx)} {float(intr.cy)}\n"
            )

    with open(os.path.join(textgt, "extrinsic.txt"), "w") as f:
        f.write("frame cameraID r1,1 r1,2 r1,3 t1 r2,1 r2,2 r2,3 t2 "
                "r3,1 r3,2 r3,3 t3 0 0 0 1\n")
        for k in range(n):
            T_cw = np.linalg.inv(X_gt[k])     # world -> camera
            vals = " ".join(f"{v:.9f}" for v in T_cw.reshape(-1))
            f.write(f"{k} 0 {vals}\n")

    pose_lines = [
        "frame cameraID trackID alpha width height length "
        "world_space_X world_space_Y world_space_Z "
        "rotation_world_space_y rotation_world_space_x rotation_world_space_z "
        "camera_space_X camera_space_Y camera_space_Z "
        "rotation_camera_space_y rotation_camera_space_x rotation_camera_space_z"
    ]
    bbox_lines = [
        "frame cameraID trackID left right top bottom number_pixels "
        "truncation_ratio occupancy_ratio isMoving"
    ]
    for k in range(n):
        inp = frames[k]
        name = f"{k:05d}"
        rgb = np.asarray(inp.rgb)
        cv2.imwrite(
            os.path.join(rgb_dir, f"rgb_{name}.jpg"),
            cv2.cvtColor((rgb * 255.0).astype(np.uint8), cv2.COLOR_RGB2BGR),
            [cv2.IMWRITE_JPEG_QUALITY, 98],
        )
        depth_cm = np.clip(
            np.round(np.asarray(inp.depth, np.float64) * 100.0), 0, 65535
        ).astype(np.uint16)
        cv2.imwrite(os.path.join(depth_dir, f"depth_{name}.png"), depth_cm)
        if k + 1 < n:
            cv2.imwrite(
                os.path.join(flow_dir, f"flow_{name}.png"),
                encode_vkitti_flow(np.asarray(frames[k + 1].flow)),
            )
        # indexed png: pixel = trackID + 1 == our mask labels directly
        mask = np.asarray(inp.mask, np.int32)
        pal_img = Image.fromarray(mask.astype(np.uint8), mode="P")
        pal = []
        for i in range(256):
            pal += [(i * 37) % 256, (i * 73) % 256, (i * 151) % 256]
        pal_img.putpalette(pal)
        pal_img.save(os.path.join(inst_dir, f"instancegt_{name}.png"))

        for j, oid in enumerate(scn.object_ids):
            obj_mask = mask == oid
            if not obj_mask.any():
                continue
            L_w = np.asarray(scn.L_gt[j][k], np.float64)
            L_cam = np.linalg.inv(X_gt[k]) @ L_w
            ry = _yaw_from_rotation(L_cam[:3, :3])
            t = L_cam[:3, 3]
            rows = np.any(obj_mask, axis=1).nonzero()[0]
            cols = np.any(obj_mask, axis=0).nonzero()[0]
            pose_lines.append(
                f"{k} 0 {oid - 1} 0.0 1.0 1.0 1.0 0 0 0 0 0 0 "
                f"{t[0]:.9f} {t[1]:.9f} {t[2]:.9f} {ry:.9f} 0.0 0.0"
            )
            bbox_lines.append(
                f"{k} 0 {oid - 1} {cols[0]} {cols[-1] + 1} {rows[0]} "
                f"{rows[-1] + 1} {int(obj_mask.sum())} 0.0 1.0 True"
            )
    with open(os.path.join(textgt, "pose.txt"), "w") as f:
        f.write("\n".join(pose_lines) + "\n")
    with open(os.path.join(textgt, "bbox.txt"), "w") as f:
        f.write("\n".join(bbox_lines) + "\n")
