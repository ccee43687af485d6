"""TartanAir-Shibuya / VIODE / ClusterSlam providers + dense stereo matching:
write a rendered scene in each on-disk format, load it back, and validate
decode conventions + GT against analytic truth."""

import numpy as np
import pytest

from dynosam_tpu.dataproviders.base import DatasetType, create_dataset
from dynosam_tpu.dataproviders.fixture_writers import (
    write_clusterslam_sequence,
    write_tartanair_sequence,
    write_viode_sequence,
)
from dynosam_tpu.dataproviders.synthetic_dense import default_dense_scenario

pytestmark = pytest.mark.slow  # heavy jit-compile e2e tier


@pytest.fixture(scope="module")
def dense():
    return default_dense_scenario(num_frames=6)


class TestDenseStereo:
    def test_constant_shift_recovered(self):
        from scipy.ndimage import gaussian_filter

        from dynosam_tpu.cv.stereo import dense_disparity

        rng = np.random.default_rng(0)
        H, W, d_true = 64, 96, 7
        tex = gaussian_filter(
            rng.uniform(0, 1, (H, W + 32)).astype(np.float32), 1.0
        )
        L = tex[:, 16 : 16 + W]
        # a feature at x in the left image sits at x - d in the right image
        R = tex[:, 16 + d_true : 16 + d_true + W]
        disp, valid = dense_disparity(L, R, num_disparities=32, block_size=5)
        disp, valid = np.asarray(disp), np.asarray(valid)
        assert valid.mean() > 0.8
        assert np.median(np.abs(disp[valid] - d_true)) < 0.1


class TestTartanAirProvider:
    @pytest.fixture(scope="class")
    def ds(self, dense, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("tartanair"))
        write_tartanair_sequence(dense, out)
        return create_dataset(
            DatasetType.TARTAN_AIR_SHIBUYA, out, depth_scale=256.0
        )

    def test_size_is_flow_count(self, ds, dense):
        # flow-file count defines the dataset size (one fewer than images)
        assert len(ds) == dense.scn.spec.num_frames - 1

    def test_intrinsics_hardcoded(self, ds):
        intr = ds.intrinsics()
        assert float(intr.fx) == pytest.approx(772.5483399593904)
        assert float(intr.cy) == pytest.approx(180.0)

    def test_depth_flow_mask_roundtrip(self, ds, dense):
        f = ds.frame(2)
        gt_depth = np.asarray(dense.frame(2).depth)
        rel = np.abs(np.asarray(f.depth) - gt_depth) / gt_depth
        assert np.median(rel) < 5e-3           # uint16/256 quantization
        assert np.allclose(
            np.asarray(f.flow), np.asarray(dense.frame(2).flow), atol=1e-5
        )
        assert np.array_equal(
            np.asarray(f.mask), np.asarray(dense.frame(2).mask)
        )

    def test_gt_aligned_through_ned(self, ds, dense):
        # writer stores NED orientations + a global offset; the provider must
        # recover the aligned CV-frame trajectory exactly
        for k in (0, 3):
            gt = ds.ground_truth(k)
            assert np.allclose(
                np.asarray(gt.X_world_cam),
                np.asarray(dense.scn.X_gt[k]),
                atol=1e-5,
            )
            assert not bool(np.asarray(gt.object_valid).any())


class TestViodeProvider:
    @pytest.fixture(scope="class")
    def ds(self, dense, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("viode"))
        write_viode_sequence(dense, out)
        intr = dense.intr
        return create_dataset(
            DatasetType.VIODE,
            out,
            intrinsics=dict(
                fx=float(intr.fx), fy=float(intr.fy),
                cx=float(intr.cx), cy=float(intr.cy),
            ),
            baseline=0.5,
            num_disparities=64,
        )

    def test_frames_synced_to_odometry(self, ds, dense):
        assert len(ds) == dense.scn.spec.num_frames

    def test_gt_pose_roundtrip(self, ds, dense):
        for k in (0, 2, 5):
            gt = ds.ground_truth(k)
            assert np.allclose(
                np.asarray(gt.X_world_cam),
                np.asarray(dense.scn.X_gt[k]),
                atol=1e-5,
            )

    def test_imu_windows(self, ds):
        f = ds.frame(2)
        assert f.imu_samples is not None
        valid = np.asarray(f.imu_valid)
        assert bool(valid.any())
        dts = np.asarray(f.imu_samples)[:, 0][valid]
        assert np.sum(dts) == pytest.approx(0.1, abs=1e-3)

    def test_dense_stereo_depth(self, ds, dense):
        got = np.asarray(ds.frame(2).depth)
        gt = np.asarray(dense.frame(2).depth)
        valid = got > 0
        # dense block matching on a synthesized right view: median relative
        # error within a few percent on valid (textured, unoccluded) pixels
        assert valid.mean() > 0.2
        rel = np.abs(got[valid] - gt[valid]) / gt[valid]
        assert np.median(rel) < 0.05

    def test_mask_and_flow(self, ds, dense):
        f = ds.frame(3)
        assert np.array_equal(
            np.asarray(f.mask), np.asarray(dense.frame(3).mask)
        )
        assert np.allclose(
            np.asarray(f.flow), np.asarray(dense.frame(3).flow), atol=1e-5
        )


class TestClusterSlamProvider:
    @pytest.fixture(scope="class")
    def ds(self, dense, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("clusterslam"))
        write_clusterslam_sequence(dense, out)
        return create_dataset(DatasetType.CLUSTER, out, num_disparities=64)

    def test_intrinsics_and_baseline_from_projections(self, ds, dense):
        intr = ds.intrinsics()
        assert float(intr.fx) == pytest.approx(float(dense.intr.fx), rel=1e-6)
        assert ds.baseline == pytest.approx(2.0, rel=1e-5)  # writer default

    def test_mask_relabelled_to_cluster_ids(self, ds, dense):
        # the on-disk masks are scrambled (3*id + 5); the landmark vote must
        # recover the original cluster labels
        got = np.asarray(ds.frame(2).mask)
        want = np.asarray(dense.frame(2).mask)
        labels = [v for v in np.unique(want) if v != 0]
        for oid in labels:
            sel = want == oid
            vals, counts = np.unique(got[sel], return_counts=True)
            assert vals[np.argmax(counts)] == oid

    def test_gt_poses_and_motions(self, ds, dense):
        for k in (1, 4):
            gt = ds.ground_truth(k)
            assert np.allclose(
                np.asarray(gt.X_world_cam),
                np.asarray(dense.scn.X_gt[k]),
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

    def test_depth_dense_stereo(self, ds, dense):
        got = np.asarray(ds.frame(2).depth)
        gt = np.asarray(dense.frame(2).depth)
        valid = got > 0
        assert valid.mean() > 0.2
        rel = np.abs(got[valid] - gt[valid]) / gt[valid]
        assert np.median(rel) < 0.05


class TestAriaProvider:
    @pytest.fixture(scope="class")
    def ds(self, dense, tmp_path_factory):
        from dynosam_tpu.dataproviders.fixture_writers import (
            write_aria_sequence,
        )

        out = str(tmp_path_factory.mktemp("aria"))
        write_aria_sequence(dense, out)
        return create_dataset(DatasetType.ARIA, out, depth_scale=256.0)

    def test_size_and_hardcoded_intrinsics(self, ds, dense):
        assert len(ds) == dense.scn.spec.num_frames - 1
        intr = ds.intrinsics()
        assert float(intr.fx) == pytest.approx(267.644012)
        assert float(intr.fy) == pytest.approx(311.656128)

    def test_persistent_mask_relabelling(self, ds, dense):
        # scrambled ids come back as a stable 1..N mapping consistent with
        # the original labels across frames
        m2 = np.asarray(ds.frame(2).mask)
        m3 = np.asarray(ds.frame(3).mask)
        w2 = np.asarray(dense.frame(2).mask)
        w3 = np.asarray(dense.frame(3).mask)
        mapping = {}
        for orig, got in ((w2, m2), (w3, m3)):
            for oid in (v for v in np.unique(orig) if v != 0):
                sel = orig == oid
                vals, counts = np.unique(got[sel], return_counts=True)
                label = vals[np.argmax(counts)]
                assert label > 0
                if oid in mapping:
                    assert mapping[oid] == label
                mapping[oid] = label

    def test_depth_and_flow(self, ds, dense):
        f = ds.frame(2)
        gt = np.asarray(dense.frame(2).depth)
        rel = np.abs(np.asarray(f.depth) - gt) / gt
        assert np.median(rel) < 5e-3
        assert np.allclose(
            np.asarray(f.flow), np.asarray(dense.frame(2).flow), atol=1e-5
        )
        assert ds.ground_truth(2) is None
