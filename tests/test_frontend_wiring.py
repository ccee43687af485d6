"""Wiring tests for in-loop stereoTrack, propogateMask, and
marginalization-time (mature) estimates — each config flag must change
observable behavior (no dead config fields).

Reference contracts:
  * propogateMask: FeatureTracker.cc:109 -> 1212 (every-frame mask repair)
  * stereoTrack:   RGBDInstanceFrontendModule.cc:177,188-197 (in-loop sparse
    stereo depth refinement, before the camera solve and again after joint-OF
    refinement)
  * fixed-lag output contract: a windowed smoother reports frame k's estimate
    when k leaves the window (SlidingWindowOptimization logs post-solve).
"""

import dataclasses

import jax
import jax.numpy as jnp
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
from dynosam_tpu.frontend.frontend import empty_frontend_state, frontend_step

pytestmark = pytest.mark.slow  # heavy jit-compile e2e tier


def _tracker_params(**kw):
    return TrackerParams(
        max_features_per_frame=256,
        min_features_per_frame=100,
        max_dynamic_features_per_frame=256,
        detection_cell_size=8,
        min_corner_response=1e-6,
        min_dynamic_tracks=5,
        **kw,
    )


def _run_frontend(dense, params, frames):
    step = jax.jit(lambda st, inp: frontend_step(st, inp, dense.intr, params))
    hw = (dense.intr.height, dense.intr.width)
    state = empty_frontend_state(params, image_shape=hw)
    packets = []
    for inp in frames:
        state, pkt = step(state, inp)
        packets.append(jax.tree.map(np.asarray, pkt))
    return state, packets


# ---------------------------------------------------------------------------
# propogateMask
# ---------------------------------------------------------------------------
class TestPropogateMask:
    @pytest.fixture(scope="class")
    def dense(self):
        return default_dense_scenario(num_frames=4)

    def _frames_with_dropout(self, dense):
        """Frames 0-2 normal; frame 3's instance mask zeroed — a detector
        dropout the reference's propogateMask exists to repair."""
        frames = [dense.frame(k) for k in range(4)]
        frames[3] = frames[3].replace(mask=jnp.zeros_like(frames[3].mask))
        return frames

    def _valid_dynamic(self, pkt):
        d = pkt.dynamic_tracks
        return int((d.valid & (d.object_id > 0)).sum())

    def test_flag_on_recovers_dropped_objects(self, dense):
        params = FrontendParams(
            max_objects=8, use_propogate_mask=True, tracker=_tracker_params()
        )
        _, packets = _run_frontend(dense, params, self._frames_with_dropout(dense))
        # objects survive the detector dropout via mask advection
        assert self._valid_dynamic(packets[3]) >= 8
        ids = set(packets[3].object_ids[packets[3].object_ids > 0].tolist())
        assert ids >= {1, 2}

    def test_flag_off_loses_dropped_objects(self, dense):
        params = FrontendParams(
            max_objects=8, use_propogate_mask=False, tracker=_tracker_params()
        )
        _, packets = _run_frontend(dense, params, self._frames_with_dropout(dense))
        assert self._valid_dynamic(packets[3]) == 0

    def test_noop_when_detector_healthy(self, dense):
        """With an intact mask stream the repair must not change tracking."""
        frames = [dense.frame(k) for k in range(4)]
        outs = []
        for flag in (True, False):
            params = FrontendParams(
                max_objects=8, use_propogate_mask=flag, tracker=_tracker_params()
            )
            _, packets = _run_frontend(dense, params, frames)
            outs.append(packets)
        for p_on, p_off in zip(*outs):
            np.testing.assert_array_equal(
                p_on.dynamic_tracks.object_id, p_off.dynamic_tracks.object_id
            )
            np.testing.assert_allclose(p_on.X_world_cam, p_off.X_world_cam)


# ---------------------------------------------------------------------------
# stereoTrack
# ---------------------------------------------------------------------------
class TestStereoTrack:
    @pytest.fixture(scope="class")
    def dense(self):
        return default_dense_scenario(num_frames=3, world_texture=True)

    @pytest.fixture(scope="class")
    def frames(self, dense):
        """Rectified stereo pairs with CORRUPTED provided depth (+15%): the
        right image is rendered from a camera displaced by +baseline along
        camera-x, so triangulated stereo depth is the only route back to the
        true geometry."""
        b = float(dense.intr.baseline)
        T_lr = jnp.eye(4).at[0, 3].set(b)
        out = []
        for k in range(3):
            inp = dense.frame(k)
            X_r = dense.scn.X_gt[k] @ T_lr
            L_k = (
                dense._L_all[:, k]
                if len(dense.scn.object_ids)
                else dense._L_all[:, 0]
            )
            depth_r, mask_r = dense._depth_mask(X_r, L_k)
            right = dense._world_rgb(X_r, L_k, depth_r, mask_r)
            out.append(inp.replace(depth=inp.depth * 1.15, right=right))
        return out

    def _static_depth_relerr(self, dense, pkt, k):
        """Median relative depth error over NEAR static tracks (gt < 15 m):
        at this fixture's fx=80 / b=0.54 the far wall subtends ~1 px of
        disparity, where stereo depth is ill-conditioned by geometry — the
        wiring test asserts on the range stereo can actually constrain."""
        true_depth, _ = dense.depth_mask(k)
        true_depth = np.asarray(true_depth)
        s = pkt.static_tracks
        sel = np.asarray(s.valid) & (np.asarray(s.depth) > 0)
        uv = np.asarray(s.uv)[sel]
        iu = np.clip(np.round(uv[:, 0]).astype(int), 0, true_depth.shape[1] - 1)
        iv = np.clip(np.round(uv[:, 1]).astype(int), 0, true_depth.shape[0] - 1)
        gt = true_depth[iv, iu]
        est = np.asarray(s.depth)[sel]
        near = gt < 15.0
        assert near.sum() >= 5, f"too few near static tracks ({near.sum()})"
        return np.median(np.abs(est[near] - gt[near]) / gt[near])

    def test_stereo_on_repairs_depth(self, dense, frames):
        params = FrontendParams(
            max_objects=8, use_stereo_track=True, tracker=_tracker_params()
        )
        _, packets = _run_frontend(dense, params, frames)
        err = self._static_depth_relerr(dense, packets[1], 1)
        assert err < 0.05, f"stereo-refined depth off by {err:.3f}"

    def test_stereo_off_keeps_corrupted_depth(self, dense, frames):
        params = FrontendParams(
            max_objects=8, use_stereo_track=False, tracker=_tracker_params()
        )
        _, packets = _run_frontend(dense, params, frames)
        err = self._static_depth_relerr(dense, packets[1], 1)
        assert err > 0.10, f"expected ~15% corruption to persist, got {err:.3f}"


# ---------------------------------------------------------------------------
# Mature (marginalization-time) estimates
# ---------------------------------------------------------------------------
class TestMatureEstimates:
    def test_sliding_window_matures_every_frame(self, tmp_path):
        from dynosam_tpu.pipeline.pipeline import DynoPipeline
        from dynosam_tpu.utils.stats import Statistics

        Statistics.reset()
        n = 12
        dense = default_dense_scenario(num_frames=n)
        # object 2 is small in this scene (~6 tracks); lower the per-object
        # track floors so both objects reach the backend
        from dynosam_tpu.config import MotionSolverParams, RansacParams

        cfg = DynoConfig(
            frontend=FrontendParams(
                max_objects=4,
                min_object_points=5,
                motion_solver=MotionSolverParams(
                    object=RansacParams(min_inliers=5)
                ),
                tracker=_tracker_params(),
            ),
            backend=BackendParams(
                optimization_mode=1,
                max_frames=6,
                max_objects=4,
                max_static_landmarks=256,
                max_dynamic_landmarks=256,
                optimizer=OptimizerParams(max_iterations=6),
            ),
        )
        pipe = DynoPipeline(
            cfg, dense.intr, output_path=str(tmp_path), module_name="wcme"
        )
        gts = [dense.scn.ground_truth(k, max_objects=4) for k in range(n)]
        pipe.run([dense.frame(k) for k in range(n)], gts)

        # exactly one mature pose per frame: departed frames stashed at
        # marginalization time, in-window frames at finalize
        assert sorted(pipe.backend.matured_pose.keys()) == list(range(n))
        # the trajectory must carry the mature values, not first-solve ones
        for fid in range(n):
            np.testing.assert_allclose(
                pipe.trajectory[fid], pipe.backend.matured_pose[fid]
            )
        # motions mature for both objects over (nearly) all motion frames
        mm = pipe.backend.matured_motion
        for oid in (1, 2):
            fids = sorted(f for (f, o) in mm if o == oid)
            assert len(fids) >= n - 4, (oid, fids)

    def test_full_batch_pose_at_prefers_final_solve(self, tmp_path):
        """In full-batch mode finalize_matured records the final solve —
        pose_at must agree with the optimized state."""
        from dynosam_tpu.pipeline.pipeline import DynoPipeline
        from dynosam_tpu.utils.stats import Statistics

        Statistics.reset()
        n = 6
        dense = default_dense_scenario(num_frames=n)
        cfg = DynoConfig(
            frontend=FrontendParams(max_objects=4, tracker=_tracker_params()),
            backend=BackendParams(
                optimization_mode=0,
                max_frames=n,
                max_objects=4,
                max_static_landmarks=256,
                max_dynamic_landmarks=256,
                optimizer=OptimizerParams(max_iterations=6),
            ),
        )
        pipe = DynoPipeline(
            cfg, dense.intr, output_path=str(tmp_path), module_name="wcme"
        )
        gts = [dense.scn.ground_truth(k, max_objects=4) for k in range(n)]
        pipe.run([dense.frame(k) for k in range(n)], gts)
        ids = np.asarray(pipe.backend.state.frame_ids)
        X = np.asarray(pipe.backend.state.X)
        for i, fid in enumerate(ids):
            if fid >= 0:
                np.testing.assert_allclose(pipe.backend.pose_at(int(fid)), X[i])
