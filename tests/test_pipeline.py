"""End-to-end pipeline test: dense synthetic scene -> frontend -> backend ->
logs -> metrics. The full-system regression (reference: eval_launch round
trip, SURVEY.md §3.5)."""

import os

import numpy as np
import pytest

from dynosam_tpu.config import (
    BackendParams,
    DynoConfig,
    FrontendParams,
    OptimizerParams,
    TrackerParams,
)
from dynosam_tpu.dataproviders.synthetic_dense import default_dense_scenario
from dynosam_tpu.eval import metrics
from dynosam_tpu.pipeline.pipeline import DynoPipeline
from dynosam_tpu.utils.stats import Statistics

pytestmark = pytest.mark.slow  # heavy jit-compile e2e tier


@pytest.fixture(scope="module")
def result(tmp_path_factory):
    Statistics.reset()
    dense = default_dense_scenario(num_frames=8)
    cfg = DynoConfig(
        frontend=FrontendParams(
            max_objects=4,
            tracker=TrackerParams(
                max_features_per_frame=256,
                min_features_per_frame=100,
                max_dynamic_features_per_frame=256,
                detection_cell_size=8,
                min_corner_response=1e-6,
            ),
        ),
        backend=BackendParams(
            optimization_mode=1,
            max_frames=8,
            max_objects=4,
            max_static_landmarks=256,
            max_dynamic_landmarks=256,
            optimizer=OptimizerParams(max_iterations=8),
        ),
    )
    out_dir = str(tmp_path_factory.mktemp("run"))
    pipe = DynoPipeline(cfg, dense.intr, output_path=out_dir, module_name="wcme")
    gts = [dense.scn.ground_truth(k, max_objects=4) for k in range(8)]
    pipe.run([dense.frame(k) for k in range(8)], gts)
    return pipe, dense, out_dir


class TestPipeline:
    def test_trajectory_accuracy(self, result):
        pipe, dense, _ = result
        est = np.stack(pipe.trajectory)
        gt = np.stack([np.asarray(dense.scn.X_gt[k]) for k in range(8)])
        r = metrics.ate(est, gt, align=False)
        assert r.trans_rmse < 0.05, r.trans_rmse
        assert r.rot_rmse < 0.01, r.rot_rmse

    def test_object_motion_accuracy(self, result):
        pipe, dense, _ = result
        # collect backend motions for object 1 over frames 2..7
        H_est, H_gt = [], []
        for k in range(3, 8):
            H = pipe.backend.motion_at(k, object_id=1)
            if H is None:
                continue
            H_est.append(H)
            H_gt.append(np.asarray(dense.scn.H_gt[0][k]))
        assert len(H_est) >= 3
        r = metrics.ame(np.stack(H_est), np.stack(H_gt))
        # WCME world-frame AME is lever-arm dominated; the hybrid
        # formulation's tighter bounds live in test_hybrid.py / ACCURACY.md
        assert r.trans_rmse < 0.3, r.trans_rmse

    def test_logs_written(self, result):
        _, _, out_dir = result
        files = os.listdir(out_dir)
        assert "wcme_camera_pose_log.csv" in files
        assert "wcme_object_motion_log.csv" in files
        cam = open(os.path.join(out_dir, "wcme_camera_pose_log.csv")).read().splitlines()
        assert len(cam) == 9  # header + 8 frames
        motion = open(
            os.path.join(out_dir, "wcme_object_motion_log.csv")
        ).read().splitlines()
        assert len(motion) > 4

    def test_stats_collected(self, result):
        assert Statistics.get("pipeline.frontend").count >= 8
        assert Statistics.get("pipeline.backend").count >= 8

    def test_sequential_mode(self):
        dense = default_dense_scenario(num_frames=3, width=80, height=64)
        cfg = DynoConfig(
            frontend=FrontendParams(
                max_objects=2,
                tracker=TrackerParams(
                    max_features_per_frame=64,
                    min_features_per_frame=16,
                    max_dynamic_features_per_frame=64,
                    detection_cell_size=8,
                    min_corner_response=1e-7,
                ),
            ),
            backend=BackendParams(
                optimization_mode=2,
                max_frames=4,
                max_objects=2,
                max_static_landmarks=64,
                max_dynamic_landmarks=64,
            ),
        )
        cfg.pipeline.parallel_run = False
        pipe = DynoPipeline(cfg, dense.intr)
        outs = pipe.run([dense.frame(k) for k in range(3)])
        assert len(outs) == 3


class TestViz:
    def test_rendering(self, tmp_path):
        import numpy as np

        from dynosam_tpu.dataproviders.simulator import Scenario, ScenarioSpec
        from dynosam_tpu.pipeline import viz
        from dynosam_tpu.utils import lie
        import jax.numpy as jnp

        scn = Scenario(ScenarioSpec.default_two_objects(num_frames=3))
        pkt = scn.measurements(1, 4)
        rgb = np.zeros((480, 640, 3), np.float32)
        img = viz.render_tracking_image(rgb, pkt)
        assert img.shape == (480, 640, 3) and img.dtype == np.uint8
        assert img.any()  # something was drawn

        traj = np.stack([np.asarray(scn.X_gt[k]) for k in range(3)])
        top = viz.render_trajectory_topdown(traj, {1: traj})
        assert top.shape == (512, 512, 3)

        w = viz.DisplayWriter(str(tmp_path))
        w.write_tracking(rgb, pkt)
        w.write_trajectory([t for t in traj])
        import os
        files = os.listdir(os.path.join(str(tmp_path), "viz"))
        assert "tracking_000000.png" in files
        assert "trajectory_topdown.png" in files


class TestPrefetchDeterminism:
    """Race-detection role (SURVEY §5): the host prefetch thread must not
    change results — parallel_run and sequential runs produce identical
    trajectories, and the shutdown dump writes samples + summary."""

    def _cfg(self):
        cfg = DynoConfig(
            frontend=FrontendParams(
                max_objects=2,
                tracker=TrackerParams(
                    max_features_per_frame=64,
                    min_features_per_frame=16,
                    max_dynamic_features_per_frame=64,
                    detection_cell_size=8,
                    min_corner_response=1e-7,
                ),
            ),
            backend=BackendParams(
                optimization_mode=1,
                max_frames=4,
                max_objects=2,
                max_static_landmarks=64,
                max_dynamic_landmarks=64,
            ),
        )
        return cfg

    def test_parallel_equals_sequential(self, tmp_path):
        dense = default_dense_scenario(num_frames=6)
        frames = [dense.frame(k) for k in range(6)]

        cfg_seq = self._cfg()
        cfg_seq.pipeline.parallel_run = False
        p_seq = DynoPipeline(cfg_seq, dense.intr)
        p_seq.run(frames)

        cfg_par = self._cfg()
        cfg_par.pipeline.parallel_run = True
        out = str(tmp_path / "par")
        p_par = DynoPipeline(cfg_par, dense.intr, output_path=out)
        p_par.run(frames)
        p_par.finish()

        np.testing.assert_allclose(
            np.stack(p_seq.trajectory), np.stack(p_par.trajectory), atol=1e-6
        )
        # shutdown dump (PipelineManager.cc:146-147 contract)
        assert os.path.exists(os.path.join(out, "statistics_samples.csv"))
        assert os.path.exists(os.path.join(out, "statistics_summary.txt"))

    def test_deferred_outputs_equal_eager(self, tmp_path):
        """defer_host_outputs (throughput mode: zero per-frame host syncs)
        must produce byte-identical trajectories, outputs, and CSV logs —
        the drain is a pure time-shift of the host work."""
        dense = default_dense_scenario(num_frames=6)
        frames = [dense.frame(k) for k in range(6)]

        out_e = str(tmp_path / "eager")
        p_e = DynoPipeline(self._cfg(), dense.intr, output_path=out_e)
        p_e.run(frames)

        cfg_d = self._cfg()
        cfg_d.pipeline.defer_host_outputs = True
        cfg_d.pipeline.drain_every = 3  # exercise a mid-run drain too
        out_d = str(tmp_path / "defer")
        p_d = DynoPipeline(cfg_d, dense.intr, output_path=out_d)
        for f in frames:
            assert p_d.process_frame(f) is None  # documented: no per-frame out
        p_d.finish()

        assert len(p_d.outputs) == len(p_e.outputs) == 6
        np.testing.assert_allclose(
            np.stack(p_e.trajectory), np.stack(p_d.trajectory), atol=1e-6
        )
        for a, b in zip(p_e.outputs, p_d.outputs):
            np.testing.assert_allclose(a.X_world_cam, b.X_world_cam, atol=1e-6)
            np.testing.assert_allclose(
                a.object_motions, b.object_motions, atol=1e-6
            )
            assert (a.object_motion_valid == b.object_motion_valid).all()
            # WCME pose init path (round-4 advisor): first-seen centroid
            # init must survive the lite snapshot, not degenerate to identity
            np.testing.assert_allclose(
                a.object_poses, b.object_poses, atol=1e-5
            )
        for name in ("camera_pose", "object_motion", "object_pose"):
            fe = open(os.path.join(out_e, f"dynosam_tpu_{name}_log.csv")).read()
            fd = open(os.path.join(out_d, f"dynosam_tpu_{name}_log.csv")).read()
            assert fe == fd, f"{name} log differs between eager and deferred"


class TestBatchRelog:
    """Full-batch logs must reflect the FINAL solve (post-finish), not the
    streamed pre-optimization rows."""

    def test_relog_rewrites_from_final_state(self, tmp_path):
        dense = default_dense_scenario(num_frames=6)
        cfg = DynoConfig(
            frontend=FrontendParams(
                max_objects=2,
                tracker=TrackerParams(
                    max_features_per_frame=64,
                    min_features_per_frame=16,
                    max_dynamic_features_per_frame=64,
                    detection_cell_size=8,
                    min_corner_response=1e-7,
                ),
            ),
            backend=BackendParams(
                optimization_mode=0,
                max_frames=6,
                max_objects=2,
                max_static_landmarks=64,
                max_dynamic_landmarks=64,
            ),
        )
        cfg.pipeline.parallel_run = False
        out = str(tmp_path / "batch")
        pipe = DynoPipeline(cfg, dense.intr, output_path=out)
        pipe.run(
            [dense.frame(k) for k in range(6)],
            [dense.scn.ground_truth(k) for k in range(6)],
        )
        import csv

        with open(os.path.join(out, "dynosam_tpu_object_motion_log.csv")) as f:
            rows = list(csv.DictReader(f))
        assert rows, "no motion rows logged"
        # rewritten rows must match the final backend state exactly
        for r in rows[:5]:
            fid, oid = int(r["frame_id"]), int(r["object_id"])
            H = pipe.backend.motion_at(fid, object_id=oid)
            assert H is not None
            assert abs(float(r["tx"]) - float(H[0, 3])) < 1e-6
