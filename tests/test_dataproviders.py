"""KITTI loader round-trip on a fabricated mini-dataset + factory tests."""

import os

import numpy as np
import pytest

from dynosam_tpu.dataproviders.base import DatasetType, create_dataset
from dynosam_tpu.dataproviders.kitti import KittiDataProvider, read_flo

H, W = 40, 60


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("kitti_seq")
    for sub in ["image_0", "flow", "depth", "motion"]:
        os.makedirs(root / sub)

    rng = np.random.default_rng(0)
    n = 3
    base_line = 387.5744
    for k in range(n):
        name = f"{k:06d}"
        cv2.imwrite(
            str(root / "image_0" / f"{name}.png"),
            rng.integers(0, 255, (H, W, 3), np.uint8),
        )
        # disparity encoding depth ~ 10m: raw = base_line/depth * 256
        depth = np.full((H, W), 10.0 + k)
        raw = (base_line / depth * 256.0).astype(np.uint16)
        cv2.imwrite(str(root / "depth" / f"{name}.png"), raw)
        # .flo
        flow = np.full((H, W, 2), 0.5 * k, np.float32)
        with open(root / "flow" / f"{name}.flo", "wb") as f:
            np.float32(202021.25).tofile(f)
            np.int32(W).tofile(f)
            np.int32(H).tofile(f)
            flow.astype(np.float32).tofile(f)
        # txt mask: object 2 occupies a block
        mask = np.zeros((H, W), np.int32)
        mask[10:20, 15:30] = 2
        np.savetxt(root / "motion" / f"{name}.txt", mask, fmt="%d")

    # pose_gt.txt: frame_id + 16 values; camera translating +z
    with open(root / "pose_gt.txt", "w") as f:
        for k in range(n):
            T = np.eye(4)
            T[2, 3] = 0.5 * k + 1.0  # nonzero first pose -> alignment check
            f.write(str(k) + " " + " ".join(str(v) for v in T.reshape(-1)) + "\n")

    # object_pose.txt: frame obj_id bbox4 t3 ry
    with open(root / "object_pose.txt", "w") as f:
        for k in range(n):
            f.write(f"{k} 2 0 0 10 10 1.0 0.5 {8.0 + k} 0.1\n")
    return str(root)


class TestKitti:
    def test_basic_loading(self, kitti_dir):
        ds = KittiDataProvider(kitti_dir)
        assert len(ds) == 3
        fr = ds.frame(1)
        assert fr.rgb.shape == (H, W, 3)
        assert fr.depth.shape == (H, W)
        # depth decoded: base_line / (raw/256) == 11 at frame 1
        np.testing.assert_allclose(np.asarray(fr.depth)[5, 5], 11.0, rtol=1e-3)
        # flow delivered with frame k is file k-1
        np.testing.assert_allclose(np.asarray(fr.flow)[0, 0], [0.0, 0.0], atol=1e-6)
        fr2 = ds.frame(2)
        np.testing.assert_allclose(np.asarray(fr2.flow)[0, 0], [0.5, 0.5], atol=1e-6)
        assert np.asarray(fr.mask)[15, 20] == 2
        assert np.asarray(fr.mask)[0, 0] == 0

    def test_gt_alignment(self, kitti_dir):
        ds = KittiDataProvider(kitti_dir)
        gt0 = ds.ground_truth(0)
        np.testing.assert_allclose(np.asarray(gt0.X_world_cam), np.eye(4), atol=1e-6)
        gt1 = ds.ground_truth(1)
        np.testing.assert_allclose(
            np.asarray(gt1.X_world_cam)[2, 3], 0.5, atol=1e-6
        )

    def test_object_gt(self, kitti_dir):
        ds = KittiDataProvider(kitti_dir)
        gt1 = ds.ground_truth(1)
        ids = np.asarray(gt1.object_ids)
        assert ids[0] == 2
        assert bool(gt1.object_valid[0])
        # motion between frames: object moved +1 z in camera while camera
        # moved +0.5 z -> world motion translation +1.5... object z in cam
        # frame grows by 1, camera by 0.5 -> world displacement = 1.5
        H_w = np.asarray(gt1.object_motions[0])
        np.testing.assert_allclose(H_w[2, 3], 1.5, atol=1e-5)

    def test_padding(self, kitti_dir):
        ds = KittiDataProvider(kitti_dir, pad_to_multiple=32)
        fr = ds.frame(0)
        assert fr.rgb.shape[0] % 32 == 0 and fr.rgb.shape[1] % 32 == 0
        assert ds.intrinsics().height % 32 == 0

    def test_factory(self, kitti_dir):
        ds = create_dataset(DatasetType.KITTI, kitti_dir)
        assert len(ds) == 3
        # every reference dataset type is implemented; a KITTI directory
        # simply isn't one of the others
        for t in (DatasetType.CLUSTER, DatasetType.ARIA):
            with pytest.raises(FileNotFoundError):
                create_dataset(t, kitti_dir)

    def test_iter(self, kitti_dir):
        ds = KittiDataProvider(kitti_dir)
        items = list(ds)
        assert len(items) == 3
        assert items[0][1] is not None
