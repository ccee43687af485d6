"""Count _relog_final fallbacks: how many re-logged object motions come from
backend.motion_at (the optimized estimate) vs the stream-time packet fallback
(pre-optimization for full-batch). A high fallback rate means the accuracy
tables measure the FRONTEND, not the backend (VERDICT r3 weak #2/#3).

Usage: python scripts/probe_relog.py [--frames 60] [--form 3] [--mode 0]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--dataset", default="tests/fixtures/kitti_fixture")
    ap.add_argument("--forms", type=int, nargs="*", default=[3])
    ap.add_argument("--modes", type=int, nargs="*", default=[0, 1, 2])
    args = ap.parse_args()

    from dynosam_tpu.config import (
        BackendParams, DynoConfig, FrontendParams, OptimizerParams,
        TrackerParams,
    )
    from dynosam_tpu.dataproviders.kitti import KittiDataProvider
    from dynosam_tpu.pipeline.pipeline import DynoPipeline

    ds = KittiDataProvider(args.dataset)
    n = min(args.frames, len(ds))

    for form in args.forms:
        for mode in args.modes:
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
                    backend_updater_enum=form,
                    max_frames=n if mode == 0 else 8,
                    optimizer=OptimizerParams(max_iterations=10),
                ),
            )
            out_dir = tempfile.mkdtemp(prefix="relogprobe_")
            pipe = DynoPipeline(cfg, ds.intrinsics(), output_path=out_dir)
            for k in range(n):
                pipe.process_frame(ds.frame(k), ds.ground_truth(k))

            # finish() but count motion_at hits/misses during the re-log
            orig = pipe.backend.motion_at
            hits = misses = 0

            def counting(fid, object_id):
                nonlocal hits, misses
                H = orig(fid, object_id=object_id)
                if H is None:
                    misses += 1
                else:
                    hits += 1
                return H

            pipe.backend.motion_at = counting
            pipe.finish()
            print(
                f"form={form} mode={mode}: motion_at hits={hits} "
                f"fallbacks={misses} "
                f"({misses / max(hits + misses, 1) * 100:.1f}% fallback)",
                flush=True,
            )


if __name__ == "__main__":
    main()
