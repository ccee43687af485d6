"""Honest end-to-end perf table + MFU/flops accounting.

The driver bench (bench.py) reports the steady-state device ceiling:
pre-staged device frames, provided flow/mask, no host I/O. This script adds
the rows that make the number honest (reference driver configs #2/#4/#5,
BASELINE.json) and a hardware-utilization lens:

  fused-synth       bench.py's exact path (KITTI-scale synthetic, 384x1280)
  fused-synth-klt   same, prefer_provided_optical_flow=False — in-loop
                    pyramidal inverse-compositional KLT + CLAHE
  detector-on       fused-synth + YOLOv8n-seg engine each frame (the
                    engine is its own jit, as in DynoPipeline.process_frame)
  real-io           the committed 60-frame fixture (320x96) through
                    DynoPipeline.run: disk decode, prefetch thread, logging —
                    FPS including all host work

FLOPs come from XLA's own cost model (compiled.cost_analysis()), so they
reflect the program actually executed, not a hand count. MFU is reported
against TPU v5e-1 bf16 peak (197 TFLOP/s); the pipeline is mostly f32, so
this is a conservative utilization bound. The headline frame is HBM/latency
bound, not FLOP bound — MFU quantifies exactly how much MXU headroom the
8-9 ms frame still has.

Usage: python scripts/bench_table.py [--out BENCH_TABLE.md] [--skip real-io]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_FLOPS = {
    # bf16 MXU peak per chip
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def _flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", float("nan"))) if ca else float("nan")


def _device_peak():
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in PEAK_FLOPS.items():
        if k.lower() in kind.lower():
            return kind, v
    return kind, None


def time_fused(cfg, intr, frames, warmup=10, measure=120):
    """(fps, flops/frame) for the fused step under cfg."""
    import jax

    from dynosam_tpu.parallel.batched import init_pipeline_state, make_fused_step

    step_fn = make_fused_step(cfg, intr)
    image_shape = tuple(frames[0].rgb.shape[:2])
    state = init_pipeline_state(cfg, image_shape=image_shape)
    lowered = jax.jit(step_fn, donate_argnums=0).lower(state, frames[0])
    compiled = lowered.compile()
    flops = _flops(compiled)

    step = jax.jit(step_fn, donate_argnums=0)
    n = len(frames)
    state, out = step(state, frames[0])
    jax.block_until_ready(out)
    for i in range(1, warmup):
        state, out = step(state, frames[i % n])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(measure):
        state, out = step(state, frames[(warmup + i) % n])
    jax.block_until_ready(out)
    return measure / (time.time() - t0), flops


def row_fused_synth(klt: bool):
    import dataclasses

    import jax

    import bench

    cfg, intr = bench.bench_config()
    if klt:
        cfg = dataclasses.replace(
            cfg,
            frontend=dataclasses.replace(
                cfg.frontend,
                tracker=dataclasses.replace(
                    cfg.frontend.tracker, prefer_provided_optical_flow=False
                ),
            ),
        )
    frames = bench.make_frames(intr, world_texture=klt)
    frames = [jax.device_put(f) for f in frames]
    fps, flops = time_fused(cfg, intr, frames)
    return fps, flops


def row_detector_on():
    """fused-synth plus the YOLOv8n-seg engine per frame (separate jit,
    exactly DynoPipeline.process_frame's structure)."""
    import jax

    import bench
    from dynosam_tpu.nn.detector import YoloV8DetectorEngine
    from dynosam_tpu.parallel.batched import init_pipeline_state, make_fused_step

    cfg, intr = bench.bench_config()
    _, _, frames = bench.build()
    eng = YoloV8DetectorEngine(input_hw=(384, 640))

    # eng._run is already jitted — lower it directly for the cost model
    det_flops = _flops(eng._run.lower(eng.params, frames[0].rgb).compile())

    step = jax.jit(make_fused_step(cfg, intr), donate_argnums=0)
    state = init_pipeline_state(cfg)
    fused_flops = _flops(
        jax.jit(make_fused_step(cfg, intr)).lower(state, frames[0]).compile()
    )

    n = len(frames)

    def one(i, state):
        f = frames[i % n]
        mask = eng.process(f.rgb)
        state, out = step(state, f.replace(mask=mask))
        return state, out

    state, out = one(0, state)
    jax.block_until_ready(out)
    for i in range(1, 10):
        state, out = one(i, state)
    jax.block_until_ready(out)
    t0 = time.time()
    measure = 120
    for i in range(measure):
        state, out = one(5 + i, state)
    jax.block_until_ready(out)
    fps = measure / (time.time() - t0)
    return fps, det_flops + fused_flops


def row_real_io(fixture="tests/fixtures/kitti_fixture", frames=60):
    """The committed fixture through DynoPipeline.run: decode + prefetch +
    logging + mature-estimate stashes — everything the driver bench skips."""
    import shutil
    import tempfile

    from dynosam_tpu.config import (
        BackendParams,
        DynoConfig,
        FrontendParams,
        OptimizerParams,
        PipelineParams,
        TrackerParams,
    )
    from dynosam_tpu.dataproviders.base import create_dataset
    from dynosam_tpu.pipeline.pipeline import DynoPipeline

    ds = create_dataset(0, fixture)
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
        # throughput mode: zero per-frame host syncs — outputs/mature
        # estimates stay on device and drain in bulk (round 3's 0.43 FPS
        # was ~6 blocking ~20 ms tunnel round-trips per frame)
        pipeline=PipelineParams(defer_host_outputs=True),
    )
    out_dir = tempfile.mkdtemp(prefix="benchreal_")
    try:
        n = min(frames, len(ds))
        pipe = DynoPipeline(cfg, ds.intrinsics(), output_path=out_dir)
        # warm ALL the jits outside the timed region — the window-full
        # programs (advance/margin/warm-optimize) only trigger at frame
        # max_frames, so warming frame 0 alone left ~90 s of compile inside
        # the round-3 timing (the 0.43 FPS row was mostly compile)
        warm = cfg.backend.max_frames + 2
        for k in range(warm):
            pipe.process_frame(ds.frame(k), ds.ground_truth(k))
        # flush the warm frames' deferred backlog BEFORE the timed region —
        # otherwise finish() drains/materializes them inside the timing
        # while only n-warm frames are counted (round-4 advisor finding);
        # the residual warm-frame work left in the timed finish() is the
        # CSV relog only (host microseconds/frame, noted not fixed).
        pipe._drain_outputs()
        t0 = time.time()
        pipe.run(
            (ds.frame(k) for k in range(warm, n)),
            (ds.ground_truth(k) for k in range(warm, n)),
        )
        dt = time.time() - t0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return (n - warm) / dt, float("nan")


def row_fused_gated():
    """fused-synth with per-variable-type update gating ON (sub-noise-floor
    thresholds): A/B for the trace-time cost of solver.gate_dx_by_type —
    accuracy equivalence at these thresholds is pinned by
    tests/test_backend.py::TestPerTypeUpdateGating."""
    import dataclasses

    import jax

    import bench

    cfg, intr = bench.bench_config()
    cfg = dataclasses.replace(
        cfg,
        backend=dataclasses.replace(
            cfg.backend,
            optimizer=dataclasses.replace(
                cfg.backend.optimizer,
                x_update_threshold_rot=1e-5,
                x_update_threshold_trans=1e-5,
                h_update_threshold_rot=1e-5,
                h_update_threshold_trans=1e-5,
            ),
        ),
    )
    frames = bench.make_frames(intr)
    frames = [jax.device_put(f) for f in frames]
    return time_fused(cfg, intr, frames)


BB_BEGIN = "<!-- batched-section-begin -->"
BB_END = "<!-- batched-section-end -->"
MESH_BEGIN = "<!-- mesh-section-begin -->"
MESH_END = "<!-- mesh-section-end -->"


def _preserved_section(path: str, begin: str, end: str) -> str:
    """Content between markers in the existing table (kept across full
    rewrites; scripts/bench_batched.py and scripts/bench_mesh_scaling.py
    splice into their marker pairs)."""
    if not os.path.exists(path):
        return "\n"
    text = open(path).read()
    if begin in text and end in text:
        return text.split(begin)[1].split(end)[0]
    return "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_TABLE.md")
    ap.add_argument("--skip", nargs="*", default=[])
    args = ap.parse_args()

    kind, peak = _device_peak()
    rows = []

    def add(name, note, fn):
        if name in args.skip:
            return
        fps, flops = fn()
        mfu = (flops * fps / peak) if (peak and np.isfinite(flops)) else None
        rows.append((name, note, fps, flops, mfu))
        print(
            f"{name:16s} {fps:8.2f} FPS   "
            f"{flops/1e9 if np.isfinite(flops) else float('nan'):8.2f} GFLOP/frame   "
            f"MFU {mfu*100 if mfu is not None else float('nan'):.2f}%",
            flush=True,
        )

    add("fused-synth", "driver bench path, 384x1280, provided flow/mask",
        lambda: row_fused_synth(False))
    add("fused-synth-gated", "per-variable-type update gating on "
        "(solver.gate_dx_by_type A/B; same accuracy at these thresholds)",
        row_fused_gated)
    add("fused-synth-klt", "in-loop pyramidal KLT + CLAHE (no provided flow)",
        lambda: row_fused_synth(True))
    add("detector-on", "YOLOv8-seg engine per frame (384x640 input, trained "
        "2-class checkpoint)", row_detector_on)
    add("real-io", "60-frame fixture, disk decode + prefetch + logging",
        row_real_io)

    batched = _preserved_section(args.out, BB_BEGIN, BB_END)
    meshsec = _preserved_section(args.out, MESH_BEGIN, MESH_END)
    with open(args.out, "w") as f:
        f.write(f"# Benchmark table — device: {kind}\n\n")
        f.write(
            "FLOPs are XLA cost-model values for the executed program; MFU "
            "is vs bf16 MXU peak (conservative — pipeline is f32). The frame "
            "is latency/HBM-bound, not FLOP-bound; MFU shows the MXU "
            "headroom left at the achieved FPS. All rows measured at one "
            "code state by scripts/bench_table.py.\n\n"
            "Dispatch-cost caveat: on this box the TPU is reached through a "
            "tunneled runtime — each device->host transfer costs ~60-85 ms "
            "and a blocking dispatch ~20 ms, independent of size. The "
            "driver-recorded BENCH_r0N.json runs the same fused-synth "
            "program without the tunnel; rows here are comparable to EACH "
            "OTHER, but absolute FPS understates real-hardware throughput "
            "for the host-heavy rows (real-io hardest: many small "
            "dispatches + transfers per frame).\n\n"
        )
        f.write("| config | FPS | GFLOP/frame | MFU | notes |\n|---|---|---|---|---|\n")
        for name, note, fps, flops, mfu in rows:
            gf = f"{flops/1e9:.2f}" if np.isfinite(flops) else "n/a"
            mf = f"{mfu*100:.2f}%" if mfu is not None else "n/a"
            f.write(f"| {name} | {fps:.2f} | {gf} | {mf} | {note} |\n")
        f.write(f"\n{BB_BEGIN}{batched}{BB_END}\n")
        f.write(f"\n{MESH_BEGIN}{meshsec}{MESH_END}\n")
    print(f"wrote {args.out}")
    print(json.dumps({"rows": [(r[0], round(r[2], 2)) for r in rows]}))


if __name__ == "__main__":
    main()
