"""Detected-masks vs provided-masks accuracy (VERDICT r3 #4).

Runs the full pipeline on the committed 60-frame fixture twice — once with
dataset-provided instance masks, once with the TRAINED YOLOv8-seg engine +
ByteTrack supplying them (the reference's actual operating mode,
YoloV8ObjectDetector.cc -> FeatureTracker.cc:104-105) — and appends a
comparison section to ACCURACY.md.

Usage: python scripts/accuracy_detector.py [--frames 60]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

DET_BEGIN = "<!-- detector-section-begin -->"
DET_END = "<!-- detector-section-end -->"


def run_cell(ds, n, detector):
    import dataclasses

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
            optimization_mode=1,
            backend_updater_enum=3,
            max_frames=8,
            optimizer=OptimizerParams(max_iterations=10),
        ),
    )
    if detector is not None:
        cfg = dataclasses.replace(
            cfg,
            frontend=dataclasses.replace(
                cfg.frontend,
                tracker=dataclasses.replace(
                    cfg.frontend.tracker,
                    prefer_provided_object_detection=False,
                ),
            ),
        )
    pipe = DynoPipeline(cfg, ds.intrinsics(), detector=detector)
    gts = []
    for k in range(n):
        gt = ds.ground_truth(k)
        gts.append(gt)
        pipe.process_frame(ds.frame(k), gt)
    pipe.finish()

    # camera ATE (unaligned translation RMSE)
    est = np.stack(pipe.trajectory)
    gt_X = np.stack([np.asarray(g.X_world_cam) for g in gts])
    ate_t = float(np.sqrt(np.mean(np.sum(
        (est[:, :3, 3] - gt_X[:, :3, 3]) ** 2, axis=-1
    ))))

    # Associate estimated object ids -> GT ids by object-pose trajectory
    # proximity (detected ids are ByteTrack ids — they never equal the
    # dataset ids, so id-keyed evaluation is impossible; the provided-masks
    # row goes through the same association for symmetry).
    be = pipe.backend
    est_pos = {}  # est_id -> {frame: (3,)}
    for (fid, oid), L in be.matured_objpose.items():
        est_pos.setdefault(oid, {})[fid] = np.asarray(L)[:3, 3]
    gt_pos = {}   # gt_id -> {frame: (3,)}
    gt_mot = {}   # gt_id -> {frame: (4,4)}
    for k, g in enumerate(gts):
        for i, goid in enumerate(np.asarray(g.object_ids)):
            goid = int(goid)
            if goid <= 0:
                continue
            gt_pos.setdefault(goid, {})[k] = np.asarray(g.object_poses[i])[:3, 3]
            gt_mot.setdefault(goid, {})[k] = np.asarray(g.object_motions[i])

    assoc = {}
    for eid, traj in est_pos.items():
        best, best_d = None, np.inf
        for goid, gtraj in gt_pos.items():
            common = sorted(set(traj) & set(gtraj))
            if len(common) < 3:
                continue
            d = float(np.mean([
                np.linalg.norm(traj[f] - gtraj[f]) for f in common
            ]))
            if d < best_d:
                best, best_d = goid, d
        if best is not None and best_d < 3.0:
            assoc[eid] = best

    errs = []
    for (fid, eid), H in be.matured_motion.items():
        goid = assoc.get(eid)
        if goid is None or fid not in gt_mot.get(goid, {}):
            continue
        E = np.linalg.inv(gt_mot[goid][fid]) @ np.asarray(H)
        errs.append(np.linalg.norm(E[:3, 3]))
    errs = np.asarray(errs)
    return dict(
        ate_t=ate_t,
        ame_t=float(np.sqrt(np.mean(errs**2))) if len(errs) else float("nan"),
        ame_t_med=float(np.median(errs)) if len(errs) else float("nan"),
        n_motions=int(len(errs)),
        n_tracks=len(est_pos),
        n_assoc=len(assoc),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--dataset", default="tests/fixtures/kitti_fixture")
    ap.add_argument("--out", default="ACCURACY.md")
    args = ap.parse_args()

    from accuracy_rich import splice

    from dynosam_tpu.dataproviders.kitti import KittiDataProvider
    from dynosam_tpu.nn.detector import YoloV8DetectorEngine

    ds = KittiDataProvider(args.dataset)
    n = min(args.frames, len(ds))
    intr = ds.intrinsics()
    hw = (int(intr.height), int(intr.width))

    rows = []
    for name, det in [
        ("provided masks", None),
        ("detected masks (trained YOLOv8t-seg)",
         YoloV8DetectorEngine(input_hw=hw, score_threshold=0.35)),
    ]:
        t0 = time.time()
        r = run_cell(ds, n, det)
        rows.append((name, r))
        print(f"{name:40s} ATE {r['ate_t']*100:7.3f} cm  "
              f"AME {r['ame_t']*100:7.3f} cm  med {r['ame_t_med']*100:6.3f}  "
              f"[{r['n_motions']} motions, {time.time()-t0:.0f}s]", flush=True)

    lines = [
        "## Detected vs provided masks (60-frame fixture, hybrid "
        "sliding-window)\n\n",
        "The detected row runs the TRAINED YOLOv8t-seg checkpoint "
        "(dynosam_tpu/nn/checkpoints) + the tracker's untracked-mask "
        "ByteTrack path end to end — the reference's actual operating mode "
        "(detection supplies the instance masks; "
        "YoloV8ObjectDetector.cc, FeatureTracker.cc:104-105). Generated by "
        "scripts/accuracy_detector.py.\n\n",
        "| masks | camera ATE (cm) | AME rms (cm) | AME median (cm) | "
        "#motions | tracks (assoc/total) |\n|---|---|---|---|---|---|\n",
    ]
    for name, r in rows:
        lines.append(
            f"| {name} | {r['ate_t']*100:.3f} | {r['ame_t']*100:.3f} | "
            f"{r['ame_t_med']*100:.3f} | {r['n_motions']} | "
            f"{r['n_assoc']}/{r['n_tracks']} |\n"
        )
    lines.append("\n")
    splice(args.out, DET_BEGIN, DET_END, "".join(lines))
    print("detector section written", flush=True)


if __name__ == "__main__":
    main()
