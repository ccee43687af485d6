"""Generate the committed dyno-KITTI-format fixture sequence.

Renders the analytically-consistent dense scene (rigid plane objects, exact
depth/flow/mask, yaw-only rotations) at KITTI-tracking proportions and writes
it to disk in the reference's exact dataset layout via
`dynosam_tpu.dataproviders.kitti_writer`. The result is loadable with
`--dataset_type 0` and has exact ground truth, so it validates the loader's
flow-timing convention, uint16-disparity decode, and GT parsing end-to-end
(formats: /root/reference/dynosam/include/dynosam/dataprovider/
KittiDataProvider.hpp:46-292).

Intrinsics are real KITTI-tracking values (fx=721.5377, cx=609.5593,
cy=172.854 at 1242x375) scaled to the fixture resolution; the disparity
base_line scales with fx exactly as the reference's virtual-stereo encoding
(base_line = 387.5744 = fx * 0.537m).

Usage:
  python scripts/make_fixture_sequence.py [--out tests/fixtures/kitti_fixture]
      [--frames 60] [--width 320] [--height 96]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KITTI_W, KITTI_H = 1242.0, 375.0
KITTI_FX, KITTI_CX, KITTI_CY = 721.5377, 609.5593, 172.854
KITTI_BASELINE_M = 387.5744 / KITTI_FX  # 0.537m virtual stereo baseline


def fixture_scenario(num_frames=60, width=320, height=96, rich=False):
    """KITTI-proportioned dense scene: forward-driving camera with slow yaw,
    three car-like objects with yaw-only constant body motions (the only
    rotations the KITTI object-GT format can represent).

    rich=True (the real-resolution preset) adds a fourth car cutting across
    the lane: it passes BEHIND the lead car (z-buffer occlusion drops its
    mask below the tracker's minimum), disappears for a stretch, and
    re-emerges — the occlusion/re-entry stress the reference sequences carry
    (KITTI 0000's crossing pedestrians, 0020's parked-car re-entries)."""
    from dynosam_tpu.cv import camera as cam
    from dynosam_tpu.dataproviders.simulator import ObjectSpec, ScenarioSpec
    from dynosam_tpu.dataproviders.synthetic_dense import DenseScenario

    s = width / KITTI_W
    fx = KITTI_FX * s
    intr = cam.CameraIntrinsics.create(
        fx=fx,
        fy=KITTI_FX * (height / KITTI_H),
        cx=KITTI_CX * s,
        cy=KITTI_CY * (height / KITTI_H),
        width=width,
        height=height,
        baseline=KITTI_BASELINE_M,
    )
    spec = ScenarioSpec(
        num_frames=num_frames,
        num_static=0,
        # forward 0.25 m/frame with slow yaw — a gentle right-hand curve
        camera_motion_xi=np.array([0.0, 0.002, 0.0, 0.0, 0.0, 0.25]),
        objects=[
            # lead car slightly left, pulling away with a slow left yaw
            ObjectSpec(
                object_id=1,
                initial_pose_xi=np.array([0.0, 0.0, 0.0, -2.0, 0.3, 8.0]),
                motion_xi=np.array([0.0, 0.005, 0.0, 0.0, 0.0, 0.30]),
                num_points=0,
            ),
            # car in the right lane, near-constant heading
            ObjectSpec(
                object_id=2,
                initial_pose_xi=np.array([0.0, 0.0, 0.0, 2.5, 0.0, 14.0]),
                motion_xi=np.array([0.0, -0.004, 0.0, 0.0, 0.0, 0.28]),
                num_points=0,
            ),
            # distant car drifting across the lane, slowly being caught up —
            # it must HOLD range: beyond ~25 m the 320x96 fixture's
            # quantization (1 px ~ 15 cm lateral, ~4 cm disparity steps) is
            # decimeter-scale measurement noise and the object's GT stops
            # being recoverable at useful accuracy
            ObjectSpec(
                object_id=3,
                initial_pose_xi=np.array([0.0, 0.0, 0.0, 0.5, -0.4, 20.0]),
                motion_xi=np.array([0.0, 0.006, 0.0, -0.04, 0.0, 0.21]),
                num_points=0,
            ),
        ]
        + (
            [
                # crossing car: cuts right-to-left behind the lead car —
                # z-buffer occlusion blanks its mask mid-sequence, then it
                # re-emerges (tracklet break + object re-entry)
                ObjectSpec(
                    object_id=4,
                    initial_pose_xi=np.array([0.0, 0.0, 0.0, 6.5, 0.1, 16.0]),
                    motion_xi=np.array([0.0, 0.0, 0.0, -0.17, 0.0, 0.27]),
                    num_points=0,
                ),
            ]
            if rich
            else []
        ),
    )
    return DenseScenario(
        spec, intr, ground_y=1.5, far_depth=55.0, object_half_extent=1.2
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/fixtures/kitti_fixture")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument(
        "--rich",
        action="store_true",
        help="add the occluded/re-entering crossing car (real-resolution "
        "preset: --width 1242 --height 375 --frames 100 --rich)",
    )
    args = ap.parse_args()

    from dynosam_tpu.dataproviders.kitti_writer import write_kitti_sequence
    from dynosam_tpu.utils import lie

    dense = fixture_scenario(args.frames, args.width, args.height, rich=args.rich)

    # visibility report (objects must stay in frame for useful GT)
    vis = {oid: 0 for oid in dense.scn.object_ids}
    for k in range(args.frames):
        mask = np.asarray(dense.frame(k).mask)
        for oid in vis:
            if (mask == oid).sum() >= 25:
                vis[oid] += 1
    print("frames visible (>=25 px):", vis, "of", args.frames)

    base_line = dense.intr.fx * KITTI_BASELINE_M
    # non-identity world offset exercises the loader's align-to-identity path
    offset = np.asarray(
        lie.se3_exp(np.array([0.0, 0.3, 0.0, 5.0, -1.0, 2.0], np.float32)),
        np.float64,
    )
    write_kitti_sequence(
        dense,
        args.out,
        base_line=float(base_line),
        depth_scale_factor=256.0,
        world_offset=offset,
    )
    n_files = sum(len(fs) for _, _, fs in os.walk(args.out))
    size_mb = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(args.out)
        for f in fs
    ) / 1e6
    print(f"wrote {args.out}: {n_files} files, {size_mb:.1f} MB")


if __name__ == "__main__":
    main()
