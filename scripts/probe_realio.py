"""Per-frame wall time of the real-io path: is the 0.3-0.43 FPS row compile
time hiding inside the timed region (window-full jits trigger at frame
max_frames), or a genuine steady-state cost?

Usage: python scripts/probe_realio.py [--frames 60] [--defer]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--defer", action="store_true")
    ap.add_argument("--dataset", default="tests/fixtures/kitti_fixture")
    args = ap.parse_args()

    from dynosam_tpu.config import (
        BackendParams, DynoConfig, FrontendParams, OptimizerParams,
        PipelineParams, TrackerParams,
    )
    from dynosam_tpu.dataproviders.kitti import KittiDataProvider
    from dynosam_tpu.pipeline.pipeline import DynoPipeline

    ds = KittiDataProvider(args.dataset)
    n = min(args.frames, len(ds))
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
            optimization_mode=2,
            backend_updater_enum=3,
            max_frames=8,
            optimizer=OptimizerParams(max_iterations=2),
        ),
        pipeline=PipelineParams(defer_host_outputs=args.defer),
    )
    pipe = DynoPipeline(cfg, ds.intrinsics())
    times = []
    t_all = time.time()
    for k in range(n):
        f = ds.frame(k)
        t0 = time.time()
        pipe.process_frame(f)
        times.append(time.time() - t0)
    total = time.time() - t_all
    pipe.finish()
    drain = time.time() - t_all - total

    import numpy as np

    t = np.asarray(times) * 1e3
    print(f"defer={args.defer} frames={n} total={total:.1f}s  "
          f"finish/drain={drain:.1f}s")
    print("per-frame ms:", np.array2string(t, precision=0, threshold=100))
    print(f"steady-state (last 40): {t[-40:].mean():.1f} ms "
          f"-> {1e3 / t[-40:].mean():.2f} FPS")


if __name__ == "__main__":
    main()
