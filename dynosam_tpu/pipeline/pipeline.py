"""Host-side pipeline orchestration.

Replaces the reference's thread/queue pipeline (DynoPipelineManager,
/root/reference/dynosam/src/pipeline/PipelineManager.cc:47-433: 5 spinner
threads connected by ThreadsafeQueues) with the natural JAX shape: two jitted
device programs (frontend step, backend step) driven by a thin host loop with
a background prefetch thread staging the next frame's images onto the device
while the current frame computes. JAX's async dispatch provides the
frontend/backend overlap the reference gets from threads.

`parallel_run=False` (the reference's sequential mode) simply disables the
prefetch thread.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterable, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.backend.backend import BackendOutput, RegularBackend
from dynosam_tpu.config import DynoConfig
from dynosam_tpu.cv import camera as cam
from dynosam_tpu.utils.packing import build_packer
from dynosam_tpu.frontend.frontend import empty_frontend_state, frontend_step
from dynosam_tpu.frontend.types import FrameInputs, GroundTruthFrame, VisionPacket
from dynosam_tpu.utils import lie
from dynosam_tpu.utils.logger import EstimationModuleLogger
from dynosam_tpu.utils.stats import Statistics, Timer


def _prefetch(it: Iterator, size: int) -> Iterator:
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(jax.tree.map(jax.device_put, item))
        finally:
            q.put(_END)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item


class DynoPipeline:
    """Frontend + backend, wired; the DynoPipelineManager analogue."""

    def __init__(
        self,
        cfg: DynoConfig,
        intr: cam.CameraIntrinsics,
        output_path: Optional[str] = None,
        module_name: str = "dynosam_tpu",
        detector=None,
    ):
        """detector: optional ObjectDetectionEngine (nn/detector.py). When
        given and prefer_provided_object_detection is False, the engine's
        instance masks replace the dataset-provided masks (the reference's
        FeatureTracker::objectDetection path, FeatureTracker.cc:104-105)."""
        cfg = cfg.normalized()
        self.cfg = cfg
        self.intr = intr
        self.detector = detector
        self._use_detector = (
            detector is not None
            and not cfg.frontend.tracker.prefer_provided_object_detection
        )
        self.frontend_state = empty_frontend_state(
            cfg.frontend, image_shape=(intr.height, intr.width)
        )
        self._frontend_step = jax.jit(
            lambda st, inp: frontend_step(st, inp, intr, cfg.frontend)
        )
        self.backend = RegularBackend(cfg.backend, intr)
        self.logger = (
            EstimationModuleLogger(module_name, output_path) if output_path else None
        )
        # Parallel "frontend" module log (reference logs frontend and
        # backend modules separately): the pre-optimization estimates, so
        # evaluation can report the backend's value-add, not assume it.
        self.frontend_logger = (
            EstimationModuleLogger("frontend", output_path) if output_path else None
        )
        self.trajectory: List[np.ndarray] = []   # backend camera poses
        self.last_packet: Optional[VisionPacket] = None
        self.frontend_trajectory: List[np.ndarray] = []
        self.outputs: List[BackendOutput] = []
        self._gts: List[Optional[GroundTruthFrame]] = []
        # Throughput mode (PipelineParams.defer_host_outputs): per-frame
        # records are PACKED into one device ring buffer and drained in one
        # transfer — see config.py and utils/packing.py for the rationale.
        self._defer = cfg.pipeline.defer_host_outputs
        self.backend.defer_margin = self._defer
        self._pending_gts: List = []
        self._snap_buf = None          # (drain_every, width) device f32
        self._snap_pack = None         # built lazily from the first frame

    # ------------------------------------------------------------------
    def process_frame(
        self, inputs: FrameInputs, gt: Optional[GroundTruthFrame] = None
    ) -> BackendOutput:
        if self._use_detector:
            t = Timer("pipeline.detector").start()
            inputs = inputs.replace(mask=self.detector.process(inputs.rgb))
            t.stop(block_on=inputs.mask)

        if self._defer:
            # no per-frame host syncs: frontend + backend dispatches stay
            # async; the output snapshot is packed into one device ring
            # buffer and drained in ONE transfer (finish() or every
            # drain_every frames)
            self.frontend_state, packet = self._frontend_step(
                self.frontend_state, inputs
            )
            self.backend.step(packet, extract=False)
            if self._snap_pack is None:
                self._build_snap_packer(packet)
            self._snap_buf = self._jit_snap_write(
                self._snap_buf,
                jnp.asarray(len(self._pending_gts), jnp.int32),
                self.backend.state,
                packet,
            )
            self._pending_gts.append(gt)
            self.last_packet = packet
            if len(self._pending_gts) >= self.cfg.pipeline.drain_every:
                self._drain_outputs()
            return None

        t = Timer("pipeline.frontend").start()
        self.frontend_state, packet = self._frontend_step(self.frontend_state, inputs)
        t.stop(block_on=packet.X_world_cam)

        t = Timer("pipeline.backend").start()
        out = self.backend.step(packet)
        t.stop()

        self.frontend_trajectory.append(np.asarray(packet.X_world_cam))
        self.trajectory.append(out.X_world_cam)
        self.outputs.append(out)
        self._gts.append(gt)
        self.last_packet = packet
        if self.logger is not None:
            self._log(out, gt)
        if self.frontend_logger is not None:
            self._log_frontend(packet, gt)
        return out

    def _build_snap_packer(self, packet: VisionPacket):
        """Lazy-build the snapshot packer + ring buffer + write jit from the
        first real frame's shapes."""
        dev_shapes = jax.eval_shape(
            self.backend._device_outputs_lite, self.backend.state
        )
        rec_shapes = dict(dev_shapes)
        for k, v in self._pk_fields(packet).items():
            rec_shapes[k] = jax.ShapeDtypeStruct(v.shape, v.dtype)
        pack, unpack, width = build_packer(rec_shapes)
        self._snap_pack, self._snap_unpack = pack, unpack
        self._snap_buf = jnp.zeros(
            (self.cfg.pipeline.drain_every, width), jnp.float32
        )

        def write(buf, i, state, pkt):
            rec = dict(self.backend._device_outputs_lite(state))
            rec.update(self._pk_fields(pkt))
            return buf.at[i].set(pack(rec))

        self._jit_snap_write = jax.jit(write, donate_argnums=0)

    @staticmethod
    def _pk_fields(packet: VisionPacket):
        return {
            "pk_frame_id": packet.frame_id,
            "pk_X_world_cam": packet.X_world_cam,
            "pk_object_ids": packet.object_ids,
            "pk_object_motions": packet.object_motions,
            "pk_object_valid": packet.object_valid,
        }

    def _drain_outputs(self):
        """Materialize + log the deferred per-frame records, in order.

        The whole backlog arrives in ONE device->host transfer (the packed
        ring buffer) — per-array pulls cost a full round trip each (~60-85
        ms tunneled, measured size-independent), so a naive per-frame drain
        of ~20 arrays costs minutes while the compute takes <1 s."""
        gts, self._pending_gts = self._pending_gts, []
        if not gts:
            return
        rows = np.asarray(self._snap_buf[: len(gts)])   # the one transfer
        for i, gt in enumerate(gts):
            rec = self._snap_unpack(rows[i])
            pk_i = {k[3:]: v for k, v in rec.items() if k.startswith("pk_")}
            dev_i = {k: v for k, v in rec.items() if not k.startswith("pk_")}
            out = self.backend.materialize_output(dev_i, int(pk_i["frame_id"]))
            self.frontend_trajectory.append(pk_i["X_world_cam"])
            self.trajectory.append(out.X_world_cam)
            self.outputs.append(out)
            self._gts.append(gt)
            if self.logger is not None:
                self._log(out, gt)
                # bbx rows from the device-computed bounds (the lite
                # snapshot omits the landmark tables the eager path uses)
                for j, oid in enumerate(out.object_ids):
                    oid = int(oid)
                    if (
                        oid > 0
                        and out.object_motion_valid[j]
                        and dev_i["bbx_ok"][j]
                    ):
                        self.logger.log_object_bbx(
                            int(pk_i["frame_id"]), oid,
                            dev_i["bbx_min"][j], dev_i["bbx_max"][j],
                            out.object_poses[j],
                        )
            if self.frontend_logger is not None:
                self._log_frontend_np(pk_i, gt)

    def run(
        self,
        frames: Iterable[FrameInputs],
        gts: Optional[Iterable[Optional[GroundTruthFrame]]] = None,
    ) -> List[BackendOutput]:
        it: Iterator = iter(frames)
        if self.cfg.pipeline.parallel_run:
            it = _prefetch(it, self.cfg.pipeline.data_provider_prefetch)
        gts_it = iter(gts) if gts is not None else None
        t = Timer("pipeline.total").start()
        for inputs in it:
            gt = next(gts_it) if gts_it is not None else None
            self.process_frame(inputs, gt)
        t.stop()
        self.finish()
        return self.outputs

    def finish(self):
        # idempotent: run() already finishes; a second explicit finish() must
        # not re-log into closed CSV files
        if getattr(self, "_finished", False):
            return
        self._finished = True
        if self._defer:
            self._drain_outputs()
        if self.cfg.backend.optimization_mode == 0:
            self.backend.finish()
        # Mature estimates: full-batch takes everything from the final solve;
        # windowed modes combine per-advance marginalization-time stashes
        # (the fixed-lag smoothed value of each departed frame) with the
        # final window contents.
        self.backend.finalize_matured()
        for fid in range(len(self.trajectory)):
            X = self.backend.pose_at(fid)
            if X is not None:
                self.trajectory[fid] = X
        if self.logger is not None:
            self._relog_final()
        if self.frontend_logger is not None:
            self.frontend_logger.close()
        if self.logger is not None:
            self.logger.close()
            # shutdown dump (PipelineManager.cc:146-147): per-tag timing
            # samples + the human-readable summary next to the CSV logs
            out_dir = self.logger.path
            from dynosam_tpu.utils.stats import Statistics

            Statistics.write_all_samples_to_csv(
                os.path.join(out_dir, "statistics_samples.csv")
            )
            with open(os.path.join(out_dir, "statistics_summary.txt"), "w") as f:
                f.write(Statistics.summary())

    def _relog_final(self):
        """Rewrite the camera-pose / object-motion / object-pose logs from
        the MATURE estimates: the final solve for full-batch (the reference's
        batch mode logs after updateBatch), and the marginalization-time
        values for sliding-window/incremental (a fixed-lag smoother's
        estimate of frame k is the one carrying the full window's
        information — streamed first-solve rows structurally understate
        every windowed mode)."""
        self.logger.reset(("camera_pose", "object_motion", "object_pose"))
        L_cur = {}
        for fid, out in enumerate(self.outputs):
            gt = self._gts[fid] if fid < len(self._gts) else None
            gt_X = np.asarray(gt.X_world_cam) if gt is not None else None
            self.logger.log_camera_pose(fid, self.trajectory[fid], gt_X)
            for j, oid in enumerate(out.object_ids):
                oid = int(oid)
                if oid <= 0 or not out.object_motion_valid[j]:
                    continue
                H = self.backend.motion_at(fid, object_id=oid)
                H = np.asarray(H) if H is not None else out.object_motions[j]
                if (fid, oid) in self.backend.matured_objpose:
                    L_cur[oid] = self.backend.matured_objpose[(fid, oid)]
                # re-propagate poses with the final motions from the object's
                # streamed anchor pose
                elif oid not in L_cur:
                    L_cur[oid] = np.asarray(out.object_poses[j])
                else:
                    L_cur[oid] = H @ L_cur[oid]
                H_gt = None
                L_gt = None
                if gt is not None:
                    gids = np.asarray(gt.object_ids)
                    hit = np.nonzero(gids == oid)[0]
                    if len(hit):
                        H_gt = np.asarray(gt.object_motions[int(hit[0])])
                        L_gt = np.asarray(gt.object_poses[int(hit[0])])
                self.logger.log_object_motion(fid, oid, H, H_gt)
                self.logger.log_object_pose(fid, oid, L_cur[oid], L_gt)

    def _log_frontend_np(self, pk_np, gt):
        """Deferred-drain variant of _log_frontend from the stacked pull."""
        self._log_frontend_rows(
            int(pk_np["frame_id"]), pk_np["X_world_cam"],
            pk_np["object_ids"], pk_np["object_valid"],
            pk_np["object_motions"], gt,
        )

    def _log_frontend(self, packet: VisionPacket, gt):
        self._log_frontend_rows(
            int(packet.frame_id), np.asarray(packet.X_world_cam),
            np.asarray(packet.object_ids), np.asarray(packet.object_valid),
            np.asarray(packet.object_motions), gt,
        )

    def _log_frontend_rows(self, fid, X, obj_ids, obj_valid, motions, gt):
        """Log the frontend's own estimates under the 'frontend' module."""
        gt_X = np.asarray(gt.X_world_cam) if gt is not None else None
        self.frontend_logger.log_camera_pose(fid, X, gt_X)
        for j, oid in enumerate(obj_ids):
            oid = int(oid)
            if oid <= 0 or not obj_valid[j]:
                continue
            H_gt = None
            if gt is not None:
                gids = np.asarray(gt.object_ids)
                hit = np.nonzero(gids == oid)[0]
                if len(hit):
                    H_gt = np.asarray(gt.object_motions[int(hit[0])])
            self.frontend_logger.log_object_motion(fid, oid, motions[j], H_gt)

    # ------------------------------------------------------------------
    def _log(self, out: BackendOutput, gt):
        fid = out.frame_id
        gt_X = np.asarray(gt.X_world_cam) if gt is not None else None
        self.logger.log_camera_pose(fid, out.X_world_cam, gt_X)
        for j, oid in enumerate(out.object_ids):
            oid = int(oid)
            if oid <= 0 or not out.object_motion_valid[j]:
                continue
            H_gt = None
            L_gt = None
            if gt is not None:
                gids = np.asarray(gt.object_ids)
                hit = np.nonzero(gids == oid)[0]
                if len(hit):
                    H_gt = np.asarray(gt.object_motions[int(hit[0])])
                    L_gt = np.asarray(gt.object_poses[int(hit[0])])
            self.logger.log_object_motion(fid, oid, out.object_motions[j], H_gt)
            self.logger.log_object_pose(fid, oid, out.object_poses[j], L_gt)
            # 3D bbox of this object's landmarks in the OBJECT frame
            # (Logger.cc:365 logObjectBbxes)
            sel = out.dynamic_valid & (out.dynamic_object_ids == oid)
            if sel.any():
                L = out.object_poses[j]
                pts_local = (out.dynamic_landmarks[sel] - L[:3, 3]) @ L[:3, :3]
                self.logger.log_object_bbx(
                    fid, oid, pts_local.min(axis=0), pts_local.max(axis=0), L
                )
        valid = out.dynamic_valid
        if valid.any():
            self.logger.log_map_points(
                fid,
                out.dynamic_object_ids[valid],
                np.nonzero(valid)[0],
                out.dynamic_landmarks[valid],
            )

    def write_stats(self, path: str):
        Statistics.write_all_samples_to_csv(path)
