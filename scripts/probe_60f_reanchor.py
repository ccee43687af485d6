"""A/B the requiresSampling epoch trigger on the 60-frame fixture.

The round-5 sweep (W=8 row == the main-table hybrid sliding config) shows
AME RMS 15.3 cm at HEAD vs 1.25 cm recorded at r4 — did the re-anchor
trigger that bought the rich fixture -64 cm cost the coarse fixture its
tail? Runs hybrid sliding W=8 with reanchor_on_resample on/off and prints
per-object worst frames for the 'on' run.

Usage: python scripts/probe_60f_reanchor.py [--off-only|--on-only]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(reanchor: bool):
    import dynosam_tpu.config as C
    from dynosam_tpu.dataproviders.kitti import KittiDataProvider
    from dynosam_tpu.eval.evaluator import DatasetEvaluator
    from dynosam_tpu.pipeline.pipeline import DynoPipeline

    ds = KittiDataProvider("tests/fixtures/kitti_fixture")
    n = min(60, len(ds))
    cfg = C.DynoConfig(
        frontend=C.FrontendParams(
            max_objects=8,
            tracker=C.TrackerParams(
                max_features_per_frame=512,
                min_features_per_frame=200,
                max_dynamic_features_per_frame=768,
                detection_cell_size=8,
                min_corner_response=1e-6,
            ),
        ),
        backend=C.BackendParams(
            optimization_mode=1,
            backend_updater_enum=3,
            max_frames=8,
            reanchor_on_resample=reanchor,
            optimizer=C.OptimizerParams(max_iterations=10),
        ),
    )
    out_dir = tempfile.mkdtemp(prefix="probe60_")
    try:
        pipe = DynoPipeline(cfg, ds.intrinsics(), output_path=out_dir)
        for k in range(n):
            pipe.process_frame(ds.frame(k), ds.ground_truth(k))
        pipe.finish()
        rep = json.load(open(DatasetEvaluator(out_dir).write_report()))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    mod = rep["dynosam_tpu"]
    ame = [o["ame_trans_rmse"] for o in mod.get("objects", {}).values()]
    rms = float(np.sqrt(np.mean(np.square(ame))))
    print(f"reanchor={'on' if reanchor else 'off'}: "
          f"ATE {mod['camera']['ate_unaligned_trans_rmse']*100:.3f} cm  "
          f"AME rms {rms*100:.3f} cm", flush=True)
    for oid, o in sorted(mod.get("objects", {}).items()):
        worst = o.get("worst_frames", [])[:5]
        print(f"  obj {oid}: rms {o['ame_trans_rmse']*100:7.2f} cm  "
              f"med {o.get('ame_trans_median', float('nan'))*100:6.2f} cm  "
              f"n={o['n_frames']}  worst={[[int(f), round(e, 3)] for f, e in worst]}",
              flush=True)


if __name__ == "__main__":
    if "--on-only" not in sys.argv:
        run(False)
    if "--off-only" not in sys.argv:
        run(True)
