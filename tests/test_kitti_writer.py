"""Round-trip: dense renderer -> dyno-KITTI files on disk -> KittiDataProvider.

Validates the loader's flow-timing convention, uint16-disparity decode, mask
parsing, and camera/object GT reconstruction against analytic ground truth
(the on-disk formats of /root/reference/dynosam/include/dynosam/dataprovider/
KittiDataProvider.hpp:46-292).
"""

import numpy as np
import pytest

from dynosam_tpu.dataproviders.kitti import KittiDataProvider
from dynosam_tpu.dataproviders.kitti_writer import write_kitti_sequence
from dynosam_tpu.utils import lie

N_FRAMES, W, H = 6, 160, 48


@pytest.fixture(scope="module")
def fixture_pair(tmp_path_factory):
    import sys, os

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
    )
    from make_fixture_sequence import KITTI_BASELINE_M, fixture_scenario

    dense = fixture_scenario(N_FRAMES, W, H)
    out = str(tmp_path_factory.mktemp("kitti_roundtrip"))
    base_line = float(dense.intr.fx * KITTI_BASELINE_M)
    offset = np.asarray(
        lie.se3_exp(np.array([0.0, 0.2, 0.0, 3.0, -0.5, 1.0], np.float32)),
        np.float64,
    )
    write_kitti_sequence(dense, out, base_line=base_line, world_offset=offset)
    ds = KittiDataProvider(
        out,
        base_line=base_line,
        intrinsics=dict(
            fx=float(dense.intr.fx),
            fy=float(dense.intr.fy),
            cx=float(dense.intr.cx),
            cy=float(dense.intr.cy),
        ),
    )
    return dense, ds


def test_frame_count_and_intrinsics(fixture_pair):
    dense, ds = fixture_pair
    assert len(ds) == N_FRAMES
    assert np.isclose(float(ds.intrinsics().fx), float(dense.intr.fx))


def test_depth_roundtrip_within_quantization(fixture_pair):
    dense, ds = fixture_pair
    for k in (0, 3):
        d_gt = np.asarray(dense.frame(k).depth)
        d_ld = np.asarray(ds.frame(k).depth)[:H, :W]
        # uint16 disparity quantization: |d_err| <= d^2 / (base_line*scale) / 2
        bound = d_gt**2 / (ds.base_line * 256.0) * 0.51 + 1e-4
        assert np.all(np.abs(d_ld - d_gt) <= bound), (
            np.abs(d_ld - d_gt).max(),
            bound.max(),
        )


def test_flow_convention_frame_k_carries_km1_to_k(fixture_pair):
    """The .flo file at index k stores the k->k+1 flow; the loader must serve
    frame k with the (k-1->k) flow = file k-1 (kitti.py module doc)."""
    dense, ds = fixture_pair
    for k in (1, 4):
        f_gt = np.asarray(dense.frame(k).flow)  # renderer: (k-1->k) at frame k
        f_ld = np.asarray(ds.frame(k).flow)[:H, :W]
        np.testing.assert_allclose(f_ld, f_gt, atol=1e-6)
    # frame 0 has zero flow
    assert np.all(np.asarray(ds.frame(0).flow) == 0)


def test_mask_roundtrip_exact(fixture_pair):
    dense, ds = fixture_pair
    for k in (0, 2, 5):
        m_gt = np.asarray(dense.frame(k).mask)
        m_ld = np.asarray(ds.frame(k).mask)[:H, :W]
        np.testing.assert_array_equal(m_ld, m_gt)


def test_camera_pose_gt_aligned(fixture_pair):
    """World offset on disk must be removed by align-to-identity; the loaded
    poses then equal the renderer's (whose first pose is identity)."""
    dense, ds = fixture_pair
    for k in range(N_FRAMES):
        X_gt = np.asarray(dense.scn.X_gt[k])
        X_ld = np.asarray(ds.ground_truth(k).X_world_cam)
        np.testing.assert_allclose(X_ld, X_gt, atol=5e-5)


def test_object_pose_and_motion_gt(fixture_pair):
    dense, ds = fixture_pair
    ids_scene = list(dense.scn.object_ids)
    for k in (1, 3, 5):
        gt = ds.ground_truth(k)
        ids = np.asarray(gt.object_ids)
        valid = np.asarray(gt.object_valid)
        for j, oid in enumerate(ids):
            if not valid[j]:
                continue
            js = ids_scene.index(int(oid))
            L_gt = np.asarray(dense.scn.L_gt[js][k])
            L_ld = np.asarray(gt.object_poses[j])
            np.testing.assert_allclose(L_ld, L_gt, atol=2e-4)
            H_gt = np.asarray(dense.scn.H_gt[js][k])
            H_ld = np.asarray(gt.object_motions[j])
            np.testing.assert_allclose(H_ld, H_gt, atol=5e-4)
        # every scene object visible in the mask must have GT
        m = np.asarray(dense.frame(k).mask)
        for oid in ids_scene:
            if (m == oid).any():
                assert oid in ids[valid].tolist()
