"""Diagnose (and A/B) the rich-fixture partial-occlusion AME tail.

The round-4 reading (ACCURACY.md): hybrid sliding RMS is ~18x its median
because during PARTIAL occlusion the crossing car keeps min_obs with
contaminated tracks, so motions stay "valid" while wrong. The round-5 fix is
the requiresSampling mask-IoU epoch trigger (reference FeatureTracker.cc:1018
-> HybridEstimator.hpp:1154-1177 KeyFrameData ranges). This probe runs hybrid
sliding-window on the rich fixture with per-frame tracker diagnostics
(per-object mask IoU, track counts, resample flags) next to the per-frame AME
trace, so the trigger's firing pattern can be checked against the frames that
actually dominate the RMS.

Usage:
  python scripts/probe_occlusion.py [--dir /tmp/kitti_rich] [--frames 100]
      [--no-reanchor]   # A/B: disable the epoch trigger
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/kitti_rich")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--no-reanchor", action="store_true")
    ap.add_argument("--min-epoch-len", type=int, default=3)
    ap.add_argument("--mode", type=int, default=1)
    ap.add_argument(
        "--min-area", type=float, default=0.0,
        help="TrackerParams.min_observable_mask_area ((0,1) = image frac)",
    )
    args = ap.parse_args()

    from accuracy_rich import ensure_fixture

    import dynosam_tpu.config as C
    from dynosam_tpu.dataproviders.kitti import KittiDataProvider
    from dynosam_tpu.eval.evaluator import DatasetEvaluator
    from dynosam_tpu.pipeline.pipeline import DynoPipeline

    ensure_fixture(args.dir, args.frames)
    ds = KittiDataProvider(args.dir)
    n = min(args.frames, len(ds))

    cfg = C.DynoConfig(
        frontend=C.FrontendParams(
            max_objects=8,
            tracker=C.TrackerParams(
                max_features_per_frame=512,
                min_features_per_frame=200,
                max_dynamic_features_per_frame=768,
                detection_cell_size=8,
                min_corner_response=1e-6,
                min_observable_mask_area=args.min_area,
            ),
        ),
        backend=C.BackendParams(
            optimization_mode=args.mode,
            backend_updater_enum=3,
            max_frames=8,
            optimizer=C.OptimizerParams(max_iterations=10),
            reanchor_on_resample=not args.no_reanchor,
            reanchor_min_epoch_len=args.min_epoch_len,
        ),
    )

    out_dir = tempfile.mkdtemp(prefix="occl_")
    diag = []  # per frame: (obj_ids, iou, resampled, n_tracks per object)
    try:
        pipe = DynoPipeline(cfg, ds.intrinsics(), output_path=out_dir)
        t0 = time.time()
        for k in range(n):
            pipe.process_frame(ds.frame(k), ds.ground_truth(k))
            trk = pipe.frontend_state.tracker
            oid = np.asarray(trk.obj_ids)
            iou = np.asarray(trk.obj_mask_iou)
            res = np.asarray(trk.obj_resampled)
            da = np.asarray(trk.obj_det_area)
            nt = np.asarray(
                (np.asarray(trk.d_oid)[None, :] == oid[:, None])
                & np.asarray(trk.d_valid)[None, :]
            ).sum(axis=1)
            diag.append((oid, iou, res, nt, da))
        pipe.finish()
        print(f"run: {time.time()-t0:.0f}s", flush=True)
        rep = json.load(open(DatasetEvaluator(out_dir).write_report()))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    mod = rep["dynosam_tpu"]
    print(f"camera ATE {mod['camera']['ate_unaligned_trans_rmse']*100:.3f} cm")
    all_rms = []
    for oid, o in sorted(mod.get("objects", {}).items()):
        all_rms.append(o["ame_trans_rmse"])
        print(
            f"object {oid}: AME rms {o['ame_trans_rmse']*100:8.3f} cm  "
            f"median {o['ame_trans_median']*100:6.3f} cm  "
            f"n={o['n_frames']}  worst={o['worst_frames']}"
        )
        trace = {f: e for f, e in o["ame_trace"]}
        # print the per-frame picture around every bad frame (>3x median)
        bad = [f for f, e in o["ame_trace"] if e > 5 * o["ame_trans_median"]]
        shown = set()
        for bf in bad:
            for f in range(max(0, bf - 2), min(n, bf + 3)):
                if f in shown or f >= len(diag):
                    continue
                shown.add(f)
                od, io, rs, nt, da = diag[f]
                j = np.nonzero(od == int(oid))[0]
                j = int(j[0]) if len(j) else -1
                e = trace.get(f, float("nan"))
                print(
                    f"  f={f:3d} ame={e*100:9.3f} cm  "
                    + (
                        f"iou={io[j]:.3f} resampled={bool(rs[j])} "
                        f"tracks={nt[j]} det_area={da[j]:.0f}"
                        if j >= 0
                        else "(object not in tracker slots)"
                    )
                )
    rms = float(np.sqrt(np.mean(np.square(all_rms)))) if all_rms else float("nan")
    print(f"AME rms over objects: {rms*100:.3f} cm "
          f"(reanchor={'off' if args.no_reanchor else 'on'})")


if __name__ == "__main__":
    main()
