"""Tests for eval metrics, config system, stats registry, CSV loggers."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.config import DynoConfig, load_flags_file
from dynosam_tpu.eval import metrics
from dynosam_tpu.utils import lie
from dynosam_tpu.utils.logger import EstimationModuleLogger
from dynosam_tpu.utils.stats import Statistics, timed


def make_traj(n, xi):
    T = [np.eye(4)]
    d = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    for _ in range(n - 1):
        T.append(T[-1] @ d)
    return np.stack(T)


class TestMetrics:
    def test_ate_zero_for_identical(self):
        t = make_traj(10, [0.01, 0, 0.02, 0.3, 0, 0.1])
        r = metrics.ate(t, t)
        assert r.trans_rmse < 1e-6 and r.rot_rmse < 1e-5

    def test_ate_alignment_removes_gauge(self):
        t = make_traj(10, [0.0, 0.02, 0.0, 0.25, 0.0, 0.1])
        offset = np.asarray(lie.se3_exp(jnp.array([0.0, 0.4, 0.0, 1.0, -2.0, 0.5])))
        est = np.einsum("ij,kjl->kil", offset, t)
        r = metrics.ate(est, t, align=True)
        assert r.trans_rmse < 1e-4
        r_noalign = metrics.ate(est, t, align=False)
        assert r_noalign.trans_rmse > 0.5

    def test_rpe_detects_drift(self):
        t = make_traj(10, [0, 0, 0, 0, 0, 1.0])
        est = make_traj(10, [0, 0, 0, 0, 0, 1.1])
        r = metrics.rpe(est, t)
        np.testing.assert_allclose(r.trans_rmse, 0.1, atol=1e-5)

    def test_ame(self):
        H_gt = make_traj(5, [0.0, 0.05, 0.0, 0.3, 0, 0])
        H_est = H_gt.copy()
        H_est[:, 0, 3] += 0.2
        r = metrics.ame(H_est, H_gt)
        np.testing.assert_allclose(r.trans_rmse, 0.2, atol=1e-5)

    def test_rme_identity_when_perfect(self):
        # H consistent with poses: L_k = H_k L_{k-1}
        L = make_traj(6, [0.0, 0.04, 0.0, 0.4, 0.1, 0.0])
        H = L[1:] @ np.linalg.inv(L[:-1])
        r = metrics.rme(H, L[:-1], L[1:])
        assert r.trans_rmse < 1e-5


class TestConfig:
    def test_defaults_and_overrides(self):
        cfg = DynoConfig()
        cfg2 = cfg.with_overrides(
            {"backend.noise.odometry_rotation_sigma": 0.05, "opt_window_size": 20}
        )
        assert cfg2.backend.noise.odometry_rotation_sigma == 0.05
        assert cfg2.backend.opt_window_size == 20
        # original untouched (immutably replaced)
        assert cfg.backend.opt_window_size == 10

    def test_unknown_flag_raises(self):
        import pytest

        with pytest.raises(KeyError):
            DynoConfig().with_overrides({"not_a_flag": 1})

    def test_flags_file(self, tmp_path):
        p = tmp_path / "backend.flags"
        p.write_text(
            "# comment\n--opt_window_size=12\n--use_vo_factor=false\n"
            "--motion_ternary_factor_noise_sigma=0.01\n"
        )
        overrides = load_flags_file(str(p))
        cfg = DynoConfig().with_overrides(overrides)
        assert cfg.backend.opt_window_size == 12
        assert cfg.backend.use_vo_factor is False
        assert cfg.backend.noise.motion_ternary_factor_noise_sigma == 0.01

    def test_from_dict(self):
        cfg = DynoConfig.from_dict(
            {"frontend": {"max_objects": 3, "tracker": {"max_features_per_frame": 99}}}
        )
        assert cfg.frontend.max_objects == 3
        assert cfg.frontend.tracker.max_features_per_frame == 99


class TestStats:
    def test_registry(self):
        Statistics.reset()
        Statistics.add_sample("a.b", 1.0)
        Statistics.add_sample("a.b", 3.0)
        c = Statistics.get("a.b")
        assert c.mean == 2.0 and c.count == 2
        assert "a.b" in Statistics.summary()

    def test_timer_and_csv(self, tmp_path):
        Statistics.reset()
        with timed("x"):
            pass
        Statistics.add_sample("y", 5.0)
        out = tmp_path / "statistics_samples.csv"
        Statistics.write_all_samples_to_csv(str(out))
        text = out.read_text().splitlines()
        assert text[0] == "x,y"


class TestLogger:
    def test_schemas(self, tmp_path):
        log = EstimationModuleLogger("testmod", str(tmp_path))
        T = np.eye(4)
        log.log_camera_pose(0, T, T)
        log.log_object_motion(1, 2, T)
        log.log_object_pose(1, 2, T, T)
        log.log_map_points(1, [2], [7], np.zeros((1, 3)))
        log.close()

        cam_csv = (tmp_path / "testmod_camera_pose_log.csv").read_text().splitlines()
        assert cam_csv[0] == (
            "frame_id,tx,ty,tz,qx,qy,qz,qw,"
            "gt_tx,gt_ty,gt_tz,gt_qx,gt_qy,gt_qz,gt_qw"
        )
        row = cam_csv[1].split(",")
        assert row[0] == "0" and float(row[7]) == 1.0  # identity quat qw=1
        mp = (tmp_path / "testmod_map_points_log.csv").read_text().splitlines()
        assert mp[0] == "frame_id,object_id,tracklet_id,x_world,y_world,z_world"


class TestEvaluator:
    def test_round_trip(self, tmp_path):
        """Logger -> evaluator round trip with synthetic GT."""
        import jax.numpy as jnp

        from dynosam_tpu.eval.evaluator import DatasetEvaluator
        from dynosam_tpu.utils.logger import EstimationModuleLogger

        log = EstimationModuleLogger("hybrid", str(tmp_path))
        # camera: est = gt shifted 0.1 in x; objects: H with known offset
        L_prev = np.eye(4)
        for k in range(6):
            T_gt = np.eye(4)
            T_gt[2, 3] = 0.5 * k
            T_est = T_gt.copy()
            T_est[0, 3] += 0.1
            log.log_camera_pose(k, T_est, T_gt)
            H_gt = np.eye(4)
            H_gt[2, 3] = 0.3
            H_est = H_gt.copy()
            H_est[1, 3] += 0.05
            if k > 0:
                L_curr = H_gt @ L_prev
                log.log_object_motion(k, 2, H_est, H_gt)
                log.log_object_pose(k, 2, L_curr, L_curr)
                L_prev = L_curr
            else:
                log.log_object_pose(k, 2, L_prev, L_prev)
        log.close()

        ev = DatasetEvaluator(str(tmp_path))
        assert ev.modules() == ["hybrid"]
        res = ev.evaluate_module("hybrid")
        # constant offset is removed by alignment
        assert res["camera"]["ate_trans_rmse"] < 1e-6
        np.testing.assert_allclose(
            res["camera"]["ate_unaligned_trans_rmse"], 0.1, atol=1e-6
        )
        assert res["camera"]["rpe_trans_rmse"] < 1e-6
        obj = res["objects"][2]
        np.testing.assert_allclose(obj["ame_trans_rmse"], 0.05, atol=1e-6)
        np.testing.assert_allclose(obj["rme_trans_rmse"], 0.05, atol=1e-6)
        # report write
        p = ev.write_report()
        assert p.endswith("evaluation_results.json")
        # plot collection (evaluation_lib PDF-plots role)
        import os

        plots = ev.write_plots()
        if plots is not None:     # matplotlib present
            assert os.path.exists(
                os.path.join(plots, "hybrid_trajectory.png")
            )
            assert os.path.exists(
                os.path.join(plots, "hybrid_motion_error.png")
            )
