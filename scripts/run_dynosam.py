"""Run the full pipeline on a dataset and (optionally) evaluate the results.

The analogue of the reference's eval_launch.py entry point
(/root/reference/dynosam_utils/scripts/eval_launch.py: --dataset_path
--params_path --output_path --name --run_pipeline --run_analysis + gflag
passthrough, README.md:166-189). Flags-file overrides use the same `--name=v`
syntax via --flags.

Examples:
  # KITTI sequence with evaluation
  python scripts/run_dynosam.py --dataset_type 0 --dataset_path /data/0004 \
      --output_path results/0004 --run_analysis

  # synthetic dense scene (no dataset needed)
  python scripts/run_dynosam.py --dataset_type 100 --frames 16 \
      --output_path results/synth --run_analysis --viz

  # parameter overrides
  python scripts/run_dynosam.py ... --flags params/backend.flags \
      --override backend_updater_enum=0 --override opt_window_size=12
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_type", type=int, default=100,
                    help="DatasetType enum (0=KITTI, 1=VKITTI, 100=synthetic)")
    ap.add_argument("--dataset_path", default=None)
    ap.add_argument("--params_path", default=None, help="DynoConfig YAML")
    ap.add_argument("--flags", action="append", default=[],
                    help=".flags files with --name=value overrides")
    ap.add_argument("--override", action="append", default=[],
                    help="single override name=value")
    ap.add_argument("--output_path", default="results")
    ap.add_argument("--name", default="dynosam_tpu", help="module/log prefix")
    ap.add_argument("--frames", type=int, default=None, help="limit frames")
    ap.add_argument("--run_analysis", action="store_true")
    ap.add_argument("--viz", action="store_true", help="dump tracking images")
    ap.add_argument(
        "--use_detector", action="store_true",
        help="run the YOLOv8-seg engine instead of dataset masks "
        "(prefer_provided_object_detection=false)",
    )
    ap.add_argument(
        "--detector_weights", default=None,
        help="ultralytics state_dict .pt for the detector (else random init)",
    )
    args = ap.parse_args()

    from dynosam_tpu.config import DynoConfig, load_flags_file
    from dynosam_tpu.pipeline.pipeline import DynoPipeline
    from dynosam_tpu.utils.stats import Statistics

    cfg = (
        DynoConfig.from_yaml(args.params_path)
        if args.params_path
        else DynoConfig()
    )
    overrides = {}
    for f in args.flags:
        overrides.update(load_flags_file(f))
    for ov in args.override:
        k, v = ov.split("=", 1)
        for cast in (int, float):
            try:
                v = cast(v)
                break
            except ValueError:
                continue
        if v in ("true", "false"):
            v = v == "true"
        overrides[k] = v
    if overrides:
        cfg = cfg.with_overrides(overrides)

    # ---- dataset ----------------------------------------------------------
    if args.dataset_type == 100:
        from dynosam_tpu.dataproviders.synthetic_dense import (
            default_dense_scenario,
        )

        n = args.frames or 16
        dense = default_dense_scenario(num_frames=n)
        intr = dense.intr
        frames = [dense.frame(k) for k in range(n)]
        gts = [dense.scn.ground_truth(k, cfg.backend.max_objects) for k in range(n)]
        rgb_fn = lambda k: frames[k].rgb
    else:
        from dynosam_tpu.dataproviders.base import create_dataset

        ds = create_dataset(args.dataset_type, args.dataset_path, pad_to_multiple=32)
        n = min(args.frames or len(ds), len(ds))
        intr = ds.intrinsics()
        frames = (ds.frame(k) for k in range(n))
        gts = (ds.ground_truth(k) for k in range(n))
        rgb_fn = None

    # ---- run ---------------------------------------------------------------
    os.makedirs(args.output_path, exist_ok=True)
    detector = None
    if args.use_detector:
        import dataclasses

        from dynosam_tpu.nn.detector import YoloV8DetectorEngine
        from dynosam_tpu.nn.weights import load_ultralytics_weights

        params = (
            load_ultralytics_weights(args.detector_weights)
            if args.detector_weights
            else None
        )
        h = int(intr.height)
        w = int(intr.width)
        detector = YoloV8DetectorEngine(params=params, input_hw=(h, w))
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
    pipe = DynoPipeline(
        cfg, intr, output_path=args.output_path, module_name=args.name,
        detector=detector,
    )
    viz_writer = None
    if args.viz:
        from dynosam_tpu.pipeline.viz import DisplayWriter

        viz_writer = DisplayWriter(args.output_path)

    t0 = time.time()
    frame_list = list(frames) if not isinstance(frames, list) else frames
    gt_list = list(gts) if not isinstance(gts, list) else gts
    for k, (inp, gt) in enumerate(zip(frame_list, gt_list)):
        pipe.process_frame(inp, gt)
        if viz_writer is not None and rgb_fn is not None:
            viz_writer.write_tracking(rgb_fn(k), pipe.last_packet)
    pipe.finish()
    dt = time.time() - t0
    print(f"processed {len(frame_list)} frames in {dt:.2f}s "
          f"({len(frame_list)/dt:.1f} FPS incl. host I/O)")

    if viz_writer is not None:
        viz_writer.write_trajectory(pipe.trajectory, None)
        video = viz_writer.write_video()
        if video:
            print(f"wrote {video}")

    pipe.write_stats(os.path.join(args.output_path, "statistics_samples.csv"))
    print(Statistics.summary())

    if args.run_analysis:
        from dynosam_tpu.eval.evaluator import DatasetEvaluator

        evaluator = DatasetEvaluator(args.output_path)
        report = evaluator.write_report()
        print(f"evaluation written to {report}")
        plots = evaluator.write_plots()
        if plots:
            print(f"plots written to {plots}")
        with open(report) as f:
            print(f.read())


if __name__ == "__main__":
    main()
