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
        # Host mirror of state.num_frames: int(state.num_frames) would force
        # a device->host sync EVERY frame (a full round trip on tunneled
        # runtimes); the window arithmetic is deterministic, so mirror it.
        self._n_frames_host = 0
        # Deferred mature-estimate stashes (defer_margin): records are
        # packed into one device ring buffer (utils/packing.py) and drained
        # in ONE transfer before any mature read — per-array pulls cost a
        # full round trip each on tunneled runtimes.
        self.defer_margin = False
        self._marg_cap = 512
        self._marg_n = 0
        self._marg_buf = None
        self._marg_pack = None
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
        # FULL_BATCH warm start (see BackendParams.batch_warm_start): short
        # warm-started LM per ingestion so the final batch solve starts from
        # a path-followed estimate, not 60+ frames of cold odometry chaining.
        self._jit_warm = None
        if cfg.optimization_mode == 0 and cfg.batch_warm_start:
            import dataclasses

            warm_cfg = dataclasses.replace(
                cfg,
                optimizer=dataclasses.replace(
                    cfg.optimizer,
                    max_iterations=cfg.optimizer.incremental_iterations,
                    accept_reject=True,
                ),
            )
            self._jit_warm = jax.jit(lambda st: optimize_fn(st, warm_cfg))
        self._jit_advance = jax.jit(lambda st: advance_fn(st, cfg))
        self._jit_outputs = jax.jit(self._device_outputs)
        self._jit_margin = jax.jit(self._device_margin_outputs)

    # ------------------------------------------------------------------
    def step(
        self,
        packet: VisionPacket,
        optimize: Optional[bool] = None,
        extract: bool = True,
    ) -> Optional[BackendOutput]:
        """extract=False skips host materialization of the output (returns
        None) — pair with device_output_snapshot()/materialize_output() for
        the deferred-throughput pipeline path."""
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
        if self._n_frames_host >= cfg.max_frames:
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
                if self.defer_margin:
                    # pack the record into the device ring buffer; drained
                    # lazily in one transfer (throughput mode)
                    if self._marg_pack is None:
                        self._build_marg_packer()
                    if self._marg_n >= self._marg_cap:
                        self.drain_matured()
                    self._marg_buf = self._jit_marg_write(
                        self._marg_buf,
                        jnp.asarray(self._marg_n, jnp.int32),
                        self.state,
                    )
                    self._marg_n += 1
                else:
                    self._stash_matured(self._jit_margin(self.state))
                self.state = self._jit_advance(self.state)
                self._n_frames_host -= 1

        self.state = self._jit_update(self.state, packet)
        self._n_frames_host += 1

        if optimize is None:
            # full-batch defers the FULL optimization to `finish`;
            # sliding-window/incremental optimize every frame.
            optimize = cfg.optimization_mode != 0
        if optimize:
            self.state = self._jit_optimize(self.state)
        elif self._jit_warm is not None:
            self.state = self._jit_warm(self.state)

        return self._extract_output(packet) if extract else None

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

    def _build_marg_packer(self):
        from dynosam_tpu.utils.packing import build_packer

        shapes = jax.eval_shape(self._device_margin_outputs, self.state)
        pack, unpack, width = build_packer(dict(shapes))
        self._marg_pack, self._marg_unpack = pack, unpack
        self._marg_buf = jnp.zeros((self._marg_cap, width), jnp.float32)

        def write(buf, i, state):
            return buf.at[i].set(pack(dict(self._device_margin_outputs(state))))

        self._jit_marg_write = jax.jit(write, donate_argnums=0)

    def drain_matured(self):
        """Materialize deferred mature-estimate records (defer_margin mode)
        — the packed ring buffer arrives in ONE device->host transfer
        (per-array pulls are a blocking round trip each on tunneled
        runtimes)."""
        n, self._marg_n = self._marg_n, 0
        if not n:
            return
        rows = np.asarray(self._marg_buf[:n])
        for i in range(n):
            self._stash_matured(self._marg_unpack(rows[i]))

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
        self.drain_matured()
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
        # full per-frame snapshot: everything the host-side BackendOutput
        # needs, captured on device so materialization can be deferred
        # (defer_host_outputs throughput mode — no per-frame sync)
        d_valid_f = st.d_valid[:, f]
        # per-object landmark bounding boxes in the OBJECT frame, computed on
        # device (Logger.cc:365 logObjectBbxes role) — the deferred snapshot
        # ships these (J, 3) bounds instead of the full landmark tables,
        # which are ~93% of the packed bytes
        Lj = obj_pose[jnp.clip(st.d_obj, 0, st.J - 1)]        # (Ld, 4, 4)
        local = lie.einsum(
            "lab,la->lb", lie.rotation(Lj), md_world - Lj[:, :3, 3]
        )                                                      # (Ld, 3)
        sel = (
            d_valid_f[:, None]
            & (st.d_obj[:, None] == jnp.arange(st.J)[None, :])
        )                                                      # (Ld, J)
        big = jnp.asarray(jnp.inf, local.dtype)
        per = jnp.where(sel[:, :, None], local[:, None, :], big)
        bbx_min = jnp.min(per, axis=0)                         # (J, 3)
        bbx_max = jnp.max(jnp.where(sel[:, :, None], local[:, None, :], -big), axis=0)
        bbx_ok = jnp.any(sel, axis=0)
        # per-object WORLD-frame landmark centroid (J, 3) — WCME pose init
        # for first-seen objects (MotionSolver.cc:580-590 role). Shipped in
        # the LITE snapshot too: materialize_output must not need the full
        # landmark tables to initialise object poses.
        cnt = jnp.sum(sel, axis=0)                             # (J,)
        obj_centroid = jnp.sum(
            jnp.where(sel[:, :, None], md_world[:, None, :], 0.0), axis=0
        ) / jnp.maximum(cnt, 1)[:, None].astype(md_world.dtype)
        return dict(
            X=st.X[f],
            H=H_out,
            H_valid=H_valid,
            md_world=md_world,
            obj_pose=obj_pose,
            obj_ids=st.obj_ids,
            slot_open=st.slot_open,
            d_obj=st.d_obj,
            d_valid_f=d_valid_f,
            ms=st.ms,
            s_valid_any=jnp.any(st.s_valid, axis=0),
            bbx_min=bbx_min,
            bbx_max=bbx_max,
            bbx_ok=bbx_ok,
            obj_centroid=obj_centroid,
        )

    # landmark-table snapshot keys dropped from the DEFERRED pack: they are
    # ~93% of the packed bytes and the throughput path replaces their one
    # consumer (host bbx logging) with the device-computed bbx fields above
    _HEAVY_SNAPSHOT_KEYS = ("md_world", "d_obj", "d_valid_f", "ms", "s_valid_any")

    def _device_outputs_lite(self, st):
        dev = self._device_outputs(st)
        for k in self._HEAVY_SNAPSHOT_KEYS:
            dev.pop(k)
        return dev

    def device_output_snapshot(self):
        """The current frame's full output snapshot, ON DEVICE (no sync) —
        pair with `materialize_output` at drain time."""
        return self._jit_outputs(self.state)

    def _extract_output(self, packet: VisionPacket) -> BackendOutput:
        return self.materialize_output(
            self.device_output_snapshot(), int(packet.frame_id)
        )

    def materialize_output(self, dev, frame_id: int) -> BackendOutput:
        """Host BackendOutput from a device snapshot (order-sensitive: the
        object-pose propagation is sequential — call in frame order).

        Lite (deferred-throughput) snapshots omit the landmark tables: the
        corresponding BackendOutput fields (static/dynamic_landmarks,
        *_valid, dynamic_object_ids) come back empty — so the map_points CSV
        gets no rows in deferred mode — while the bbx log uses the
        device-computed bounds and WCME pose init uses the device-computed
        per-object centroid, keeping trajectory/motion/pose/bbx logs
        identical to the eager path."""
        dev = jax.tree.map(np.asarray, dev)
        X = dev["X"]
        obj_ids = dev["obj_ids"]
        H = dev["H"]
        H_valid = dev["H_valid"]

        lite = "md_world" not in dev
        Ld = self.state.Ld
        d_obj = dev["d_obj"] if not lite else np.full((Ld,), -1, np.int32)
        d_valid = dev["d_valid_f"] if not lite else np.zeros((Ld,), bool)
        md = dev["md_world"] if not lite else np.zeros((Ld, 3), np.float32)
        if self.hybrid or self.wcpe:
            # hybrid/WCPE: object poses are direct state. Open slots win over
            # closed epochs sharing the id (the closed epoch's pose at the
            # latest frame is stale — its H stopped updating at the break).
            obj_poses = dev["obj_pose"]
            open_np = dev["slot_open"]
            for j, oid in enumerate(obj_ids):
                oid = int(oid)
                if oid > 0 and (open_np[j] or oid not in self.object_poses):
                    self.object_poses[oid] = obj_poses[j]
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
                    # device-computed centroid — present in BOTH full and
                    # lite snapshots, so WCME pose init survives the
                    # deferred-throughput path (round-4 advisor finding)
                    centroid = np.asarray(dev["obj_centroid"][j])
                    L0 = np.eye(4, dtype=X.dtype)
                    L0[:3, 3] = centroid
                    self.object_poses[oid] = L0
                obj_poses[j] = self.object_poses[oid]

        Ls = self.state.Ls
        s_valid = dev["s_valid_any"] if not lite else np.zeros((Ls,), bool)
        d_oid = np.full(d_obj.shape[0], -1, np.int32)
        mask = d_obj >= 0
        d_oid[mask] = obj_ids[d_obj[mask]]

        return BackendOutput(
            frame_id=frame_id,
            X_world_cam=X,
            object_ids=obj_ids,
            object_motions=H,
            object_motion_valid=H_valid,
            object_poses=obj_poses,
            static_landmarks=dev["ms"] if not lite else np.zeros(
                (Ls, 3), np.float32
            ),
            static_valid=s_valid,
            dynamic_landmarks=md,
            dynamic_valid=d_valid,
            dynamic_object_ids=d_oid,
        )

    # ------------------------------------------------------------------
    def pose_at(self, frame_id: int) -> Optional[np.ndarray]:
        if self._marg_n:
            self.drain_matured()
        if frame_id in self.matured_pose:
            return self.matured_pose[frame_id]
        ids = np.asarray(self.state.frame_ids)
        hits = np.nonzero(ids == frame_id)[0]
        if len(hits) == 0:
            return None
        return np.asarray(self.state.X[int(hits[0])])

    def motion_at(self, frame_id: int, object_id: int) -> Optional[np.ndarray]:
        if self._marg_n:
            self.drain_matured()
        if (frame_id, object_id) in self.matured_motion:
            return self.matured_motion[(frame_id, object_id)]
        ids = np.asarray(self.state.frame_ids)
        hits = np.nonzero(ids == frame_id)[0]
        if len(hits) == 0:
            return None
        f = int(hits[0])
        obj_ids = np.asarray(self.state.obj_ids)
        # An id may occupy several slots (hybrid epochs after re-entry
        # breaks); their valid frames are disjoint — take the slot whose
        # motion exists at f.
        js = np.nonzero(obj_ids == object_id)[0]
        fprev = max(f - 1, 0)
        for j in (int(x) for x in js):
            if not bool(self.state.H_valid[j, f]):
                continue
            if self.hybrid:
                # F2F needs the f-1 reference: a motion variable there, or
                # the object's keyframe slot (H_{e,e} = I)
                if f == 0 or not (
                    bool(self.state.H_valid[j, fprev])
                    or int(self.state.kf_slot[j]) == fprev
                ):
                    continue
                return np.asarray(hybrid.f2f_motion(self.state, f)[j])
            if self.wcpe:
                from dynosam_tpu.backend import wcpe

                if f == 0 or not bool(self.state.H_valid[j, fprev]):
                    continue
                return np.asarray(wcpe.f2f_motion(self.state, f)[j])
            return np.asarray(self.state.H[j, f])
        return None
