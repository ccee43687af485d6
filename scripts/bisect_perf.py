"""Bisect the round-3 per-frame regression: toggle each round-3 feature
off (against the shipped bench config) and measure the fused step.

Suspects (VERDICT r3): per-object joint-OF refinement, propogateMask
advection, scene-flow stationarity, decoupled two-phase hybrid solve,
incremental iteration budget.

Usage: python scripts/bisect_perf.py [--variants name,name,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


VARIANTS = {
    "shipped": {},
    "no_obj_joint_of": {"refine_motion_with_joint_of": False},
    "no_cam_joint_of": {"refine_camera_pose_with_joint_of": False},
    "no_propogate_mask": {"use_propogate_mask": False},
    "no_scene_flow": {"scene_flow_percentage": 2.0},  # test never fires
    "joint_solve": {"decoupled_object_solve": False},
    "opt_iters_1": {"max_iterations": 1},
    "no_marg_uncert": {"marginal_point_uncertainty": False},
    "all_off": {
        "refine_motion_with_joint_of": False,
        "refine_camera_pose_with_joint_of": False,
        "use_propogate_mask": False,
        "scene_flow_percentage": 2.0,
        "decoupled_object_solve": False,
    },
}


def measure(overrides, frames, n=30, warmup=8):
    import jax

    import bench
    from dynosam_tpu.parallel.batched import init_pipeline_state, make_fused_step

    cfg, intr = bench.bench_config()
    cfg = cfg.with_overrides(overrides) if overrides else cfg
    step = jax.jit(make_fused_step(cfg, intr), donate_argnums=0)
    state = init_pipeline_state(cfg)

    t0 = time.time()
    state, out = step(state, frames[0])
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    for i in range(1, warmup):
        state, out = step(state, frames[i % len(frames)])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(n):
        state, out = step(state, frames[(warmup + i) % len(frames)])
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    return dt, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=None)
    ap.add_argument("-n", type=int, default=30)
    args = ap.parse_args()

    import bench

    _, intr = bench.bench_config()
    frames = bench.make_frames(intr)

    names = args.variants.split(",") if args.variants else list(VARIANTS)
    print(f"{'variant':24s} {'ms/frame':>9s} {'FPS':>7s} {'compile':>8s}")
    base = None
    for name in names:
        dt, cs = measure(VARIANTS[name], frames, n=args.n)
        if name == "shipped":
            base = dt
        delta = f"  ({dt - base:+.2f} ms vs shipped)" if base and name != "shipped" else ""
        print(f"{name:24s} {dt:9.3f} {1e3 / dt:7.1f} {cs:7.1f}s{delta}", flush=True)


if __name__ == "__main__":
    main()
