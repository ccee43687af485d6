"""OMD + native-VKITTI providers: write a rendered scene in each format,
load it back, and validate decode conventions + GT against analytic truth."""

import numpy as np
import pytest

from dynosam_tpu.dataproviders.base import DatasetType, create_dataset
from dynosam_tpu.dataproviders.fixture_writers import (
    encode_vkitti_flow,
    write_omd_sequence,
    write_vkitti_sequence,
)
from dynosam_tpu.dataproviders.synthetic_dense import default_dense_scenario
from dynosam_tpu.dataproviders.vkitti import decode_vkitti_flow

pytestmark = pytest.mark.slow  # heavy jit-compile e2e tier


@pytest.fixture(scope="module")
def dense():
    # lift the scene so depths clear the disparity encodings comfortably
    return default_dense_scenario(num_frames=6)


class TestFlowCodec:
    def test_vkitti_flow_roundtrip(self):
        rng = np.random.default_rng(0)
        flow = rng.uniform(-30, 30, (64, 96, 2)).astype(np.float32)
        dec = decode_vkitti_flow(encode_vkitti_flow(flow))
        # 16-bit quantization over the image dimension: ~dim/2^16 per px
        assert np.max(np.abs(dec - flow)) < 3e-3


class TestOmdProvider:
    @pytest.fixture(scope="class")
    def ds(self, dense, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("omd"))
        write_omd_sequence(dense, out, imu=True)
        return create_dataset(DatasetType.OMD, out), out

    def test_sizes_and_intrinsics(self, ds, dense):
        p, _ = ds
        assert len(p) == dense.scn.spec.num_frames
        intr = p.intrinsics()
        assert float(intr.fx) == pytest.approx(float(dense.intr.fx))
        assert intr.baseline == pytest.approx(float(dense.intr.baseline))

    def test_depth_roundtrip(self, ds, dense):
        p, _ = ds
        f = p.frame(2)
        gt = np.asarray(dense.frame(2).depth)
        got = np.asarray(f.depth)
        # uint16 disparity quantization: relative error grows with depth
        rel = np.abs(got - gt) / gt
        assert np.median(rel) < 5e-3

    def test_flow_and_mask_roundtrip(self, ds, dense):
        p, _ = ds
        f = p.frame(3)
        assert np.allclose(
            np.asarray(f.flow), np.asarray(dense.frame(3).flow), atol=1e-5
        )
        assert np.array_equal(
            np.asarray(f.mask), np.asarray(dense.frame(3).mask)
        )

    def test_gt_poses_and_motions(self, ds, dense):
        p, _ = ds
        for k in (1, 4):
            gt = p.ground_truth(k)
            assert np.allclose(
                np.asarray(gt.X_world_cam), np.asarray(dense.scn.X_gt[k]),
                atol=1e-5,
            )
            gids = np.asarray(gt.object_ids)
            for j, oid in enumerate(dense.scn.object_ids):
                hit = np.nonzero(gids == oid)[0]
                if not len(hit):
                    continue
                i = int(hit[0])
                assert np.allclose(
                    np.asarray(gt.object_poses[i]),
                    np.asarray(dense.scn.L_gt[j][k]),
                    atol=1e-4,
                )
                assert np.allclose(
                    np.asarray(gt.object_motions[i]),
                    np.asarray(dense.scn.H_gt[j][k]),
                    atol=1e-4,
                )

    def test_imu_windows_present(self, ds):
        p, _ = ds
        f = p.frame(2)
        assert f.imu_samples is not None
        assert bool(np.asarray(f.imu_valid).any())
        # dts over the window sum to the frame interval
        dts = np.asarray(f.imu_samples)[:, 0][np.asarray(f.imu_valid)]
        assert np.sum(dts) == pytest.approx(0.1, abs=1e-3)


class TestVkittiProvider:
    @pytest.fixture(scope="class")
    def ds(self, dense, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("vkitti"))
        write_vkitti_sequence(dense, out)
        return create_dataset(DatasetType.VIRTUAL_KITTI, out), out

    def test_sizes_and_intrinsics(self, ds, dense):
        p, _ = ds
        assert len(p) == dense.scn.spec.num_frames
        assert float(p.intrinsics().fx) == pytest.approx(float(dense.intr.fx))

    def test_depth_centimeter_decode(self, ds, dense):
        p, _ = ds
        got = np.asarray(p.frame(2).depth)
        gt = np.asarray(dense.frame(2).depth)
        assert np.max(np.abs(got - gt)) < 0.006   # 1 cm quantization

    def test_flow_decode(self, ds, dense):
        p, _ = ds
        got = np.asarray(p.frame(3).flow)
        gt = np.asarray(dense.frame(3).flow)
        assert np.max(np.abs(got - gt)) < 5e-3

    def test_instance_mask_indexed_png(self, ds, dense):
        p, _ = ds
        got = np.asarray(p.frame(2).mask)
        gt = np.asarray(dense.frame(2).mask)
        assert np.array_equal(got, gt)

    def test_motion_mask_removes_static(self, dense, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("vkitti_static"))
        write_vkitti_sequence(dense, out)
        # flip all isMoving flags to False -> motion mask must empty out
        import os

        bbox = os.path.join(out, "vkitti_2.0.3_textgt", "Scene01", "clone", "bbox.txt")
        txt = open(bbox).read().replace("True", "False")
        open(bbox, "w").write(txt)
        p = create_dataset(DatasetType.VIRTUAL_KITTI, out, mask_type="motion")
        assert not np.any(np.asarray(p.frame(2).mask))

    def test_gt_poses(self, ds, dense):
        p, _ = ds
        for k in (1, 4):
            gt = p.ground_truth(k)
            assert np.allclose(
                np.asarray(gt.X_world_cam), np.asarray(dense.scn.X_gt[k]),
                atol=1e-5,
            )
            gids = np.asarray(gt.object_ids)
            for j, oid in enumerate(dense.scn.object_ids):
                hit = np.nonzero(gids == oid)[0]
                if not len(hit):
                    continue
                i = int(hit[0])
                assert np.allclose(
                    np.asarray(gt.object_poses[i]),
                    np.asarray(dense.scn.L_gt[j][k]),
                    atol=1e-4,
                )


class TestPipelineOnOmd:
    def test_three_frames_run(self, dense, tmp_path_factory):
        """Drive the full pipeline over the OMD fixture (loader -> frontend
        -> backend) for a few frames."""
        from dynosam_tpu.config import (
            BackendParams,
            DynoConfig,
            FrontendParams,
            OptimizerParams,
            TrackerParams,
        )
        from dynosam_tpu.pipeline.pipeline import DynoPipeline

        out = str(tmp_path_factory.mktemp("omd_pipe"))
        write_omd_sequence(dense, out)
        ds = create_dataset(DatasetType.OMD, out)
        cfg = DynoConfig(
            frontend=FrontendParams(
                max_objects=4,
                tracker=TrackerParams(
                    max_features_per_frame=128,
                    min_features_per_frame=48,
                    max_dynamic_features_per_frame=128,
                    detection_cell_size=8,
                    min_corner_response=1e-6,
                ),
            ),
            backend=BackendParams(
                optimization_mode=1,
                backend_updater_enum=3,
                max_frames=6,
                optimizer=OptimizerParams(max_iterations=4),
            ),
        )
        pipe = DynoPipeline(cfg, ds.intrinsics())
        for k in range(4):
            pipe.process_frame(ds.frame(k), ds.ground_truth(k))
        err = np.linalg.norm(
            pipe.trajectory[3][:3, 3] - np.asarray(dense.scn.X_gt[3])[:3, 3]
        )
        assert err < 0.05
