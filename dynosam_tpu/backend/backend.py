"""Backend module: mode dispatch, jitted step, and state accessors.

Reference parity: /root/reference/dynosam/src/backend/RegularBackendModule.cc
(FULL_BATCH / SLIDING_WINDOW / INCREMENTAL dispatch, :286-322) and
backend/Accessor.hpp:55 (canonical state queries). The reference's iSAM2
incremental mode is replaced by warm-started sliding-window LM with marginal
priors: cost per frame is bounded by the window like iSAM2's affected-clique
property, and the warm start plays the role of the Bayes-tree's cached
solution (SURVEY.md §7 design note — deliverable is accuracy/latency parity,
not the Bayes tree itself).

Host API (`RegularBackend.step`) is thin: all compute is in two jitted
programs (`_ingest_and_optimize`, `advance`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.backend import graph, hybrid, solver, window
from dynosam_tpu.backend.graph import GraphState
from dynosam_tpu.config import BackendParams, OptimizerParams
from dynosam_tpu.cv import camera as cam
from dynosam_tpu.frontend.types import VisionPacket
from dynosam_tpu.utils import lie


@dataclass
class BackendOutput:
    """Per-frame backend output (BackendOutputPacket analogue), host-side."""

    frame_id: int
    X_world_cam: np.ndarray              # (4, 4) optimized latest pose
    object_ids: np.ndarray               # (J,) int32 (-1 pad)
    object_motions: np.ndarray           # (J, 4, 4) optimized H at latest frame
    object_motion_valid: np.ndarray      # (J,) bool
    object_poses: np.ndarray             # (J, 4, 4) propagated object poses
    static_landmarks: np.ndarray         # (Ls, 3)
    static_valid: np.ndarray             # (Ls,) bool
    dynamic_landmarks: np.ndarray        # (Ld, 3) at latest frame
    dynamic_valid: np.ndarray            # (Ld,) bool
    dynamic_object_ids: np.ndarray       # (Ld,) int32 object id per landmark


class RegularBackend:
    """Full-batch / sliding-window / incremental dynamic-SLAM backend."""

    def __init__(self, cfg: BackendParams, intr: cam.CameraIntrinsics):
        self.cfg = cfg
        self.intr = intr
        self.state = graph.empty_graph(cfg)
        # object pose map (reference: propogateObjectPoses / ObjectPoseMap):
        # object_id -> (4,4) pose, propagated L_k = H_k L_{k-1}.
        self.object_poses: Dict[int, np.ndarray] = {}
        self._step_count = 0
        # Marginalization-time ("mature") estimates for windowed modes: a
        # fixed-lag smoother's estimate of frame k is final when k leaves the
        # window — that is the value a fixed-lag system reports (the
        # reference's SlidingWindowOptimization logs after the window solve,
        # not at first ingestion). pose: frame_id -> (4,4);
        # motion/objpose: (frame_id, object_id) -> (4,4).
        self.matured_pose: Dict[int, np.ndarray] = {}
        self.matured_motion: Dict[tuple, np.ndarray] = {}
        self.matured_objpose: Dict[tuple, np.ndarray] = {}

        mode_cfg = cfg
        if cfg.optimization_mode == 2:  # incremental: few warm-started GN iters
            import dataclasses

            # warm-started LM with per-iteration accept/reject: plain GN
            # (no rejection) diverges on weakly-conditioned windows — the
            # cost evaluation is worth the accuracy (see ACCURACY.md)
            mode_cfg = dataclasses.replace(
                cfg,
                optimizer=dataclasses.replace(
                    cfg.optimizer,
                    max_iterations=cfg.optimizer.incremental_iterations,
                    accept_reject=True,
                ),
            )
        self._opt_cfg = mode_cfg

        # Formulation dispatch (backend_updater_enum, RegularBackendModule
        # parity): 0 = WCME (MotionInWorld), 3 = hybrid (object-centric
        # keyframed — the reference's ParallelHybrid, objects batched).
        self.hybrid = cfg.backend_updater_enum in (2, 3)
        self.wcpe = cfg.backend_updater_enum == 1
        if self.hybrid:
            update_fn = graph.update_from_packet_hybrid
            optimize_fn = hybrid.optimize
            advance_fn = window.advance_hybrid
        elif self.wcpe:
            from dynosam_tpu.backend import wcpe

            update_fn = wcpe.update_from_packet_wcpe
            optimize_fn = wcpe.optimize
            advance_fn = window.advance_wcpe
        else:
            update_fn = graph.update_from_packet
            optimize_fn = solver.optimize
            advance_fn = window.advance

        self._jit_update = jax.jit(
            lambda st, pkt: update_fn(st, pkt, intr, cfg)
        )
        self._jit_optimize = jax.jit(
            lambda st: optimize_fn(st, self._opt_cfg)
        )
        self._jit_advance = jax.jit(lambda st: advance_fn(st, cfg))
        self._jit_outputs = jax.jit(self._device_outputs)
        self._jit_margin = jax.jit(self._device_margin_outputs)

    # ------------------------------------------------------------------
    def step(self, packet: VisionPacket, optimize: Optional[bool] = None) -> BackendOutput:
        cfg = self.cfg
        if cfg.regular_backend_static_only:
            # reference flag: the backend estimates the camera/static scene
            # only — dynamic measurements and object motions are dropped at
            # ingestion (RegularBackendModule static-only configuration)
            packet = packet.replace(
                dynamic_tracks=packet.dynamic_tracks.replace(
                    valid=jnp.zeros_like(packet.dynamic_tracks.valid)
                ),
                object_valid=jnp.zeros_like(packet.object_valid),
            )
        if int(self.state.num_frames) >= cfg.max_frames:
            if cfg.optimization_mode == 0:
                raise RuntimeError(
                    "FULL_BATCH window capacity exceeded; raise max_frames"
                )
            # Advance stride (reference FLAGS_opt_window_overlap,
            # RegularBackendModule.cc:240): slide so `overlap` frames stay
            # shared between consecutive full windows; -1 = slide by one.
            # Each slide stashes the departing frame's smoothed (mature)
            # estimate before marginalisation drops it.
            if cfg.opt_window_overlap < 0:
                stride = 1
            else:
                stride = max(1, cfg.max_frames - 1 - cfg.opt_window_overlap)
            for _ in range(stride):
                self._stash_matured(self._jit_margin(self.state))
                self.state = self._jit_advance(self.state)

        self.state = self._jit_update(self.state, packet)

        if optimize is None:
            # full-batch defers optimization to `finish` except for pose init;
            # sliding-window/incremental optimize every frame.
            optimize = cfg.optimization_mode != 0
        if optimize:
            self.state = self._jit_optimize(self.state)

        return self._extract_output(packet)

    def finish(self) -> None:
        """Full-batch final solve (reference: updateBatch at last frame)."""
        self.state = self._jit_optimize(self.state)

    # ------------------------------------------------------------------
    def _motion_slot_outputs(self, st, f):
        """Jit-safe (motion (J,4,4), valid (J,), obj pose (J,4,4)) at slot f.

        f2f motions need the f-1 reference, so for hybrid/WCPE the motion of
        slot f's frame is last formable while slot f-1 is still in the window.
        """
        fprev = jnp.maximum(f - 1, 0)
        if self.wcpe:
            from dynosam_tpu.backend import wcpe as wcpe_mod

            H_m = wcpe_mod.f2f_motion(st, f)
            valid = st.H_valid[:, f] & st.H_valid[:, fprev] & (f > 0)
            L = st.H[:, f]
        elif self.hybrid:
            H_m = hybrid.f2f_motion(st, f)
            valid = (
                st.H_valid[:, f]
                & (st.H_valid[:, fprev] | (st.kf_slot == fprev))
                & (f > 0)
            )
            L = hybrid.object_pose(st, f)
        else:
            H_m = st.H[:, f]
            valid = st.H_valid[:, f]
            L = jnp.broadcast_to(jnp.eye(4, dtype=st.X.dtype), (st.J, 4, 4))
        return H_m, valid, L

    def _device_margin_outputs(self, st):
        """Mature estimates extracted just before a window advance drops
        slot 0: the pose of slot 0's frame (final — never re-optimized) and
        the object motions of the oldest slot still able to form them
        (slot 1 for hybrid/WCPE f2f chains, slot 0 for WCME's per-frame
        motion variables)."""
        f_m = jnp.asarray(0 if not (self.hybrid or self.wcpe) else 1, jnp.int32)
        H_m, valid, L = self._motion_slot_outputs(st, f_m)
        return dict(
            pose_fid=st.frame_ids[0],
            X=st.X[0],
            motion_fid=st.frame_ids[f_m],
            H=H_m,
            H_valid=valid,
            obj_pose=L,
            obj_ids=st.obj_ids,
        )

    def _stash_matured(self, rec):
        rec = jax.tree.map(np.asarray, rec)
        pfid = int(rec["pose_fid"])
        if pfid >= 0:
            self.matured_pose[pfid] = rec["X"]
        mfid = int(rec["motion_fid"])
        if mfid >= 0:
            for j, oid in enumerate(rec["obj_ids"]):
                oid = int(oid)
                if oid > 0 and bool(rec["H_valid"][j]):
                    self.matured_motion[(mfid, oid)] = rec["H"][j]
                    self.matured_objpose[(mfid, oid)] = rec["obj_pose"][j]

    def finalize_matured(self) -> None:
        """Record mature estimates for frames still in the window (called at
        sequence end, after the final solve): every in-window pose, and the
        motions of every slot that can still form one. Together with the
        per-advance stashes this yields exactly one mature estimate per
        frame — the fixed-lag output contract."""
        st = self.state
        n = int(st.num_frames)
        if n == 0:
            return
        ids = np.asarray(st.frame_ids)
        X = np.asarray(st.X)
        for f in range(n):
            if ids[f] >= 0:
                self.matured_pose[int(ids[f])] = X[f]
        f0 = 0 if not (self.hybrid or self.wcpe) else 1
        obj_ids = np.asarray(st.obj_ids)
        for f in range(f0, n):
            H_m, valid, L = jax.tree.map(
                np.asarray,
                self._jit_motion_slot(st, jnp.asarray(f, jnp.int32)),
            )
            fid = int(ids[f])
            if fid < 0:
                continue
            for j, oid in enumerate(obj_ids):
                oid = int(oid)
                if oid > 0 and bool(valid[j]):
                    self.matured_motion[(fid, oid)] = H_m[j]
                    self.matured_objpose[(fid, oid)] = L[j]

    @property
    def _jit_motion_slot(self):
        if not hasattr(self, "_jit_motion_slot_fn"):
            self._jit_motion_slot_fn = jax.jit(self._motion_slot_outputs)
        return self._jit_motion_slot_fn

    def marginal_covariances(self):
        """(cov_X (F, 6, 6), cov_H (J, F, 6, 6)) marginals at the current
        estimate — the gtsam::Marginals role (the reference computes the
        camera-pose covariance in the static estimator and per-object
        covariances in each ParallelObjectISAM; here one dense inverse of
        the reduced system gives the exact joint marginals). Hybrid
        formulations only. Computed on demand: it is not part of the
        per-frame step."""
        if not self.hybrid:
            raise NotImplementedError(
                "marginal covariances are exported for the hybrid "
                "formulations (backend_updater_enum 2/3)"
            )
        if not hasattr(self, "_jit_marginals"):
            self._jit_marginals = jax.jit(
                lambda st: hybrid.marginal_covariances(st, self._opt_cfg)
            )
        cov_X, cov_H = self._jit_marginals(self.state)
        return np.asarray(cov_X), np.asarray(cov_H)

    # ------------------------------------------------------------------
    def _device_outputs(self, st):
        """Jitted accessor: canonical outputs from the graph state."""
        f = jnp.clip(st.num_frames - 1, 0, st.F - 1)
        fprev = jnp.maximum(f - 1, 0)
        if self.wcpe:
            from dynosam_tpu.backend import wcpe as wcpe_mod

            H_out = wcpe_mod.f2f_motion(st, f)
            md_world = st.md[:, f]
            obj_pose = st.H[:, f]
            # an F2F motion needs BOTH pose variables: L at f-1 and f.
            # Without the f-1 gate the first motion frame reports
            # L_f * I^{-1} = the centroid pose as a "motion".
            H_valid = st.H_valid[:, f] & st.H_valid[:, fprev] & (f > 0)
        elif self.hybrid:
            H_out = hybrid.f2f_motion(st, f)          # F2F for output parity
            md_world = lie.transform_points(
                hybrid.object_pose(st, f)[
                    jnp.clip(st.d_obj, 0, st.J - 1)
                ],
                st.m_hyb,
            )
            obj_pose = hybrid.object_pose(st, f)
            # slot f-1 is valid as a motion reference if it carries a motion
            # variable OR is the object's keyframe (H_{e,e} = I, a constant)
            H_valid = (
                st.H_valid[:, f]
                & (st.H_valid[:, fprev] | (st.kf_slot == fprev))
                & (f > 0)
            )
        else:
            H_out = st.H[:, f]
            md_world = st.md[:, f]
            obj_pose = jnp.broadcast_to(jnp.eye(4, dtype=st.X.dtype), (st.J, 4, 4))
            H_valid = st.H_valid[:, f]
        return dict(
            X=st.X[f],
            H=H_out,
            H_valid=H_valid,
            md_world=md_world,
            obj_pose=obj_pose,
        )

    def _extract_output(self, packet: VisionPacket) -> BackendOutput:
        st = self.state
        dev = jax.tree.map(np.asarray, self._jit_outputs(st))
        X = dev["X"]
        obj_ids = np.asarray(st.obj_ids)
        H = dev["H"]
        H_valid = dev["H_valid"]
        f = int(st.num_frames) - 1

        d_obj = np.asarray(st.d_obj)
        d_valid = np.asarray(st.d_valid[:, f])
        md = dev["md_world"]
        if self.hybrid or self.wcpe:
            # hybrid/WCPE: object poses are direct state
            obj_poses = dev["obj_pose"]
            for j, oid in enumerate(obj_ids):
                if int(oid) > 0:
                    self.object_poses[int(oid)] = obj_poses[j]
        else:
            # WCME: propagate L_k = H_k * L_{k-1}, centroid-initialised
            # (reference propogateObjectPoses, MotionSolver.cc:580-590).
            obj_poses = np.tile(np.eye(4, dtype=X.dtype), (len(obj_ids), 1, 1))
            for j, oid in enumerate(obj_ids):
                oid = int(oid)
                if oid <= 0:
                    continue
                if oid in self.object_poses and H_valid[j]:
                    self.object_poses[oid] = H[j] @ self.object_poses[oid]
                elif oid not in self.object_poses:
                    pts = md[(d_obj == j) & d_valid]
                    centroid = pts.mean(axis=0) if len(pts) else np.zeros(3)
                    L0 = np.eye(4, dtype=X.dtype)
                    L0[:3, 3] = centroid
                    self.object_poses[oid] = L0
                obj_poses[j] = self.object_poses[oid]

        s_valid = np.asarray(st.s_valid).any(axis=0)
        d_oid = np.full(st.Ld, -1, np.int32)
        mask = d_obj >= 0
        d_oid[mask] = obj_ids[d_obj[mask]]

        return BackendOutput(
            frame_id=int(packet.frame_id),
            X_world_cam=X,
            object_ids=obj_ids,
            object_motions=H,
            object_motion_valid=H_valid,
            object_poses=obj_poses,
            static_landmarks=np.asarray(st.ms),
            static_valid=s_valid,
            dynamic_landmarks=md,
            dynamic_valid=d_valid,
            dynamic_object_ids=d_oid,
        )

    # ------------------------------------------------------------------
    def pose_at(self, frame_id: int) -> Optional[np.ndarray]:
        if frame_id in self.matured_pose:
            return self.matured_pose[frame_id]
        ids = np.asarray(self.state.frame_ids)
        hits = np.nonzero(ids == frame_id)[0]
        if len(hits) == 0:
            return None
        return np.asarray(self.state.X[int(hits[0])])

    def motion_at(self, frame_id: int, object_id: int) -> Optional[np.ndarray]:
        if (frame_id, object_id) in self.matured_motion:
            return self.matured_motion[(frame_id, object_id)]
        ids = np.asarray(self.state.frame_ids)
        hits = np.nonzero(ids == frame_id)[0]
        if len(hits) == 0:
            return None
        f = int(hits[0])
        obj_ids = np.asarray(self.state.obj_ids)
        js = np.nonzero(obj_ids == object_id)[0]
        if len(js) == 0:
            return None
        j = int(js[0])
        if not bool(self.state.H_valid[j, f]):
            return None
        fprev = max(f - 1, 0)
        if self.hybrid:
            # F2F needs the f-1 reference: a motion variable there, or the
            # object's keyframe slot (H_{e,e} = I)
            if f == 0 or not (
                bool(self.state.H_valid[j, fprev])
                or int(self.state.kf_slot[j]) == fprev
            ):
                return None
            return np.asarray(hybrid.f2f_motion(self.state, f)[j])
        if self.wcpe:
            from dynosam_tpu.backend import wcpe

            if f == 0 or not bool(self.state.H_valid[j, fprev]):
                return None
            return np.asarray(wcpe.f2f_motion(self.state, f)[j])
        return np.asarray(self.state.H[j, f])
