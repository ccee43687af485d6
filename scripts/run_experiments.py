"""Multi-sequence, multi-config experiment runner.

The analogue of the reference's paper-reproduction scripts
(/root/reference/dynosam_utils/src/run_experiments_tro.py:42-96 — sequence
lists x backend configs, each run logged + analysed — and
sw_vs_batch_timing.py / plot_ral_timing_data.py which consume
statistics_samples.csv). One command:

  python scripts/run_experiments.py --out results/exp1 \
      --sequence kitti:tests/fixtures/kitti_fixture [--sequence omd:/data/omd]

runs every (formulation x optimization-mode) cell on every sequence, writes
per-run CSV logs + evaluation reports, a timing summary from the statistics
registry, an aggregate summary.json + SUMMARY.md, and (when matplotlib is
available) per-stage timing plots.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FORMS = {0: "wcme", 1: "wcpe", 3: "hybrid"}
MODES = {0: "batch", 1: "sliding", 2: "incremental"}
DATASET_TYPES = {
    "kitti": 0, "vkitti": 1, "cluster": 2, "omd": 3, "aria": 4,
    "tartanair": 5, "viode": 6, "synthetic": 100,
}


def make_config(form: int, mode: int, frames: int):
    from dynosam_tpu.config import (
        BackendParams,
        DynoConfig,
        FrontendParams,
        OptimizerParams,
        TrackerParams,
    )

    return DynoConfig(
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
            max_frames=frames if mode == 0 else 8,
            optimizer=OptimizerParams(max_iterations=10),
        ),
    )


def run_cell(ds, form: int, mode: int, frames: int, out_dir: str) -> dict:
    import json as _json

    from dynosam_tpu.eval.evaluator import DatasetEvaluator
    from dynosam_tpu.pipeline.pipeline import DynoPipeline
    from dynosam_tpu.utils.stats import Statistics

    Statistics.reset()
    os.makedirs(out_dir, exist_ok=True)
    cfg = make_config(form, mode, frames)
    pipe = DynoPipeline(cfg, ds.intrinsics(), output_path=out_dir)
    for k in range(frames):
        pipe.process_frame(ds.frame(k), ds.ground_truth(k))
    pipe.finish()
    Statistics.write_all_samples_to_csv(
        os.path.join(out_dir, "statistics_samples.csv")
    )
    report_path = DatasetEvaluator(out_dir).write_report()
    with open(report_path) as f:
        rep = _json.load(f)
    mod = next(iter(rep.values()))
    cam = mod["camera"]
    objs = mod.get("objects", {})
    ame_rms = [o["ame_trans_rmse"] for o in objs.values()]
    ame_med = [o.get("ame_trans_median", float("nan")) for o in objs.values()]
    timing = timing_summary(os.path.join(out_dir, "statistics_samples.csv"))
    return {
        "ate_trans_rmse": cam["ate_unaligned_trans_rmse"],
        "ate_rot_rmse": cam["ate_rot_rmse"],
        "rpe_trans_rmse": cam["rpe_trans_rmse"],
        "ame_trans_rmse": float(np.sqrt(np.mean(np.square(ame_rms))))
        if ame_rms
        else float("nan"),
        "ame_trans_median": float(np.mean(ame_med)) if ame_med else float("nan"),
        "objects": objs,
        "timing_ms": timing,
    }


def timing_summary(stats_csv: str) -> dict:
    """Mean per-tag milliseconds from a statistics_samples.csv."""
    if not os.path.exists(stats_csv):
        return {}
    import csv

    with open(stats_csv) as f:
        rows = list(csv.reader(f))
    if not rows:
        return {}
    header = rows[0]
    out = {}
    cols = list(zip(*[r + [""] * (len(header) - len(r)) for r in rows[1:]]))
    for name, col in zip(header, cols):
        vals = [float(v) for v in col if v not in ("", None)]
        if vals:
            out[name] = float(np.mean(vals))
    return out


def plot_timing(summary: dict, out_png: str) -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    cells = [
        (f"{seq}/{cell}", r["timing_ms"])
        for seq, cells in summary.items()
        for cell, r in cells.items()
        if r.get("timing_ms")
    ]
    if not cells:
        return
    tags = sorted({t for _, tm in cells for t in tm})
    fig, ax = plt.subplots(figsize=(max(6, len(cells) * 0.9), 4))
    bottom = np.zeros(len(cells))
    for tag in tags:
        vals = np.array([tm.get(tag, 0.0) for _, tm in cells])
        ax.bar([c for c, _ in cells], vals, bottom=bottom, label=tag)
        bottom += vals
    ax.set_ylabel("mean per-frame time [ms]")
    ax.legend(fontsize=6)
    plt.xticks(rotation=45, ha="right", fontsize=6)
    plt.tight_layout()
    plt.savefig(out_png, dpi=120)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sequence",
        action="append",
        default=[],
        help="type:path, e.g. kitti:tests/fixtures/kitti_fixture (repeatable)",
    )
    ap.add_argument("--out", default="results/experiments")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--forms", default="0,1,3")
    ap.add_argument("--modes", default="0,1,2")
    args = ap.parse_args()

    if not args.sequence:
        args.sequence = ["kitti:tests/fixtures/kitti_fixture"]

    from dynosam_tpu.dataproviders.base import create_dataset

    forms = [int(v) for v in args.forms.split(",")]
    modes = [int(v) for v in args.modes.split(",")]

    summary = {}
    for seq in args.sequence:
        kind, _, path = seq.partition(":")
        name = f"{kind}_{os.path.basename(path.rstrip('/')) or kind}"
        if kind == "synthetic":
            from dynosam_tpu.dataproviders.synthetic_dense import (
                default_dense_scenario,
            )

            class _SynthDs:
                def __init__(self, d):
                    self.d = d

                def __len__(self):
                    return self.d.scn.spec.num_frames

                def intrinsics(self):
                    return self.d.intr

                def frame(self, k):
                    return self.d.frame(k)

                def ground_truth(self, k):
                    return self.d.scn.ground_truth(k)

            ds = _SynthDs(default_dense_scenario(num_frames=args.frames))
        else:
            ds = create_dataset(DATASET_TYPES[kind], path)
        n = min(args.frames, len(ds))
        summary[name] = {}
        for form in forms:
            for mode in modes:
                cell = f"{FORMS[form]}_{MODES[mode]}"
                out_dir = os.path.join(args.out, name, cell)
                print(f"== {name} / {cell} ({n} frames)", flush=True)
                try:
                    r = run_cell(ds, form, mode, n, out_dir)
                except Exception as e:  # pragma: no cover
                    print(f"   FAILED: {e}", flush=True)
                    r = {"error": str(e)}
                summary[name][cell] = r
                if "ate_trans_rmse" in r:
                    print(
                        f"   ATE {r['ate_trans_rmse']*100:.3f} cm  "
                        f"AME rms {r['ame_trans_rmse']*100:.3f} cm  "
                        f"med {r['ame_trans_median']*100:.3f} cm",
                        flush=True,
                    )

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)

    with open(os.path.join(args.out, "SUMMARY.md"), "w") as f:
        f.write("# Experiment summary\n\n")
        for name, cells in summary.items():
            f.write(
                f"## {name}\n\n| config | ATE (cm) | AME rms (cm) | "
                "AME med (cm) | frontend ms | backend ms |\n"
                "|---|---|---|---|---|---|\n"
            )
            for cell, r in cells.items():
                if "error" in r:
                    f.write(f"| {cell} | ERROR | | | | |\n")
                    continue
                tm = r.get("timing_ms", {})
                fe = tm.get("pipeline.frontend", float("nan"))
                be = tm.get("pipeline.backend", float("nan"))
                f.write(
                    f"| {cell} | {r['ate_trans_rmse']*100:.3f} | "
                    f"{r['ame_trans_rmse']*100:.3f} | "
                    f"{r['ame_trans_median']*100:.3f} | "
                    f"{fe:.2f} | {be:.2f} |\n"
                )
            f.write("\n")
    plot_timing(summary, os.path.join(args.out, "timing.png"))
    print(f"wrote {args.out}/summary.json, SUMMARY.md, timing.png")


if __name__ == "__main__":
    main()
