"""Is hybrid full-batch worse than sliding because of COLD initialization?

Three variants on the 60-frame fixture, AME computed directly against GT:
  batch-cold : mode 0 as shipped (ingest all, one final LM)
  batch-warm : mode 0 but each frame also runs the windowed LM during
               ingestion (warm path-following init), then the final LM
  sliding    : mode 1 reference point

Usage: python scripts/probe_batch_warm.py [--frames 60]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_variant(ds, n, mode, warm):
    from dynosam_tpu.config import (
        BackendParams, DynoConfig, FrontendParams, OptimizerParams,
        TrackerParams,
    )
    from dynosam_tpu.pipeline.pipeline import DynoPipeline

    cfg = DynoConfig(
        frontend=FrontendParams(
            max_objects=8,
            tracker=TrackerParams(
                max_features_per_frame=512,
                min_features_per_frame=200,
                max_dynamic_features_per_frame=768,
                detection_cell_size=8,
                min_corner_response=1e-6,
            ),
        ),
        backend=BackendParams(
            optimization_mode=mode,
            backend_updater_enum=3,
            max_frames=n if mode == 0 else 8,
            optimizer=OptimizerParams(max_iterations=10),
        ),
    )
    pipe = DynoPipeline(cfg, ds.intrinsics())
    if warm:
        orig_step = pipe.backend.step
        pipe.backend.step = lambda pkt, optimize=None: orig_step(
            pkt, optimize=True
        )
    for k in range(n):
        pipe.process_frame(ds.frame(k), ds.ground_truth(k))
    pipe.finish()

    errs_t, errs_r = [], []
    for k in range(2, n):
        gt = ds.ground_truth(k)
        gids = np.asarray(gt.object_ids)
        for i, oid in enumerate(gids):
            oid = int(oid)
            if oid <= 0:
                continue
            H = pipe.backend.motion_at(k, object_id=oid)
            if H is None:
                continue
            E = np.linalg.inv(np.asarray(gt.object_motions[i])) @ np.asarray(H)
            errs_t.append(np.linalg.norm(E[:3, 3]))
            c = np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1)
            errs_r.append(np.arccos(c))
    t = np.asarray(errs_t)
    return (
        float(np.sqrt(np.mean(t**2))) * 100,
        float(np.median(t)) * 100,
        float(np.sqrt(np.mean(np.asarray(errs_r) ** 2))),
        len(t),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--dataset", default="tests/fixtures/kitti_fixture")
    args = ap.parse_args()

    from dynosam_tpu.dataproviders.kitti import KittiDataProvider

    ds = KittiDataProvider(args.dataset)
    n = min(args.frames, len(ds))
    for name, mode, warm in [
        ("batch-cold", 0, False),
        ("batch-warm", 0, True),
        ("sliding", 1, False),
    ]:
        rms, med, rot, cnt = run_variant(ds, n, mode, warm)
        print(
            f"{name:11s} AME rms {rms:7.3f} cm  med {med:6.3f} cm  "
            f"rot {rot:.5f} rad  [{cnt} motions]",
            flush=True,
        )


if __name__ == "__main__":
    main()
