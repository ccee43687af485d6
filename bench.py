"""End-to-end benchmark: fused frontend+backend SLAM step at KITTI scale.

Runs the full per-frame pipeline (dense-flow tracking + RANSAC motion solves
+ windowed LM backend, incremental mode) on KITTI-tracking-sized synthetic
RGB-D frames (384 x 1280, ~800 static + 1024 dynamic tracks, 8 object slots)
on the available accelerator and reports steady-state FPS.

Baseline: the driver target is > 100 FPS end-to-end on TPU v5e-1
(BASELINE.md); the reference system is not real-time on its edge target
(/root/reference/README.md:101).

Prints exactly one JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


HEIGHT, WIDTH = 384, 1280
WARMUP = 5
MEASURE = 30
DISTINCT_FRAMES = 8

# Wedged-chip resilience (round-4 postmortem): BENCH_r04 crashed with a TPU
# FailedPrecondition at the very first device op — a transiently wedged chip,
# not a code bug (the same program re-ran at 101.8 FPS).  A poisoned TPU
# client cannot recover in-process, so the benchmark body runs in a CHILD
# process and the parent retries with a fresh process on any failure.
MAX_ATTEMPTS = 3
RETRY_DELAY_S = 20.0


def bench_config():
    """The benchmark's (cfg, intr) — shared with scripts/profile_breakdown.py."""
    from dynosam_tpu.config import (
        BackendParams,
        DynoConfig,
        FrontendParams,
        MotionSolverParams,
        OptimizerParams,
        RansacParams,
        TrackerParams,
    )
    from dynosam_tpu.cv import camera as cam

    cfg = DynoConfig(
        frontend=FrontendParams(
            max_objects=8,
            tracker=TrackerParams(
                max_features_per_frame=800,
                min_features_per_frame=300,
                max_dynamic_features_per_frame=1024,
                detection_cell_size=16,
                min_corner_response=1e-6,
            ),
            motion_solver=MotionSolverParams(
                # fixed-batch RANSAC: 128 hypotheses of 3 points give
                # P(miss) = (1 - 0.5^3)^128 < 4e-8 at 50% inliers —
                # statistically equivalent to the reference's 500 adaptive
                # iterations
                camera=RansacParams(ransac_iterations=128),
                object=RansacParams(ransac_iterations=128, min_inliers=8),
                refinement_iterations=3,
                object_refinement_iterations=2,
                refit_rounds=1,
            ),
        ),
        backend=BackendParams(
            optimization_mode=2,          # incremental (realtime mode)
            backend_updater_enum=3,       # hybrid — "Recommended for speed"
            max_frames=10,                # reference opt_window_size=10
            max_objects=8,
            max_static_landmarks=800,
            max_dynamic_landmarks=1024,
            optimizer=OptimizerParams(max_iterations=2),
        ),
    )

    intr = cam.CameraIntrinsics.create(
        fx=720.0, fy=720.0, cx=WIDTH / 2, cy=HEIGHT / 2,
        width=WIDTH, height=HEIGHT, baseline=0.537,  # KITTI stereo baseline
    )
    return cfg, intr


def make_frames(intr, num_frames=DISTINCT_FRAMES, world_texture=False):
    """The benchmark's synthetic KITTI-scale frame set (device-resident)."""
    import jax

    from dynosam_tpu.dataproviders.simulator import ObjectSpec, ScenarioSpec
    from dynosam_tpu.dataproviders.synthetic_dense import DenseScenario

    spec = ScenarioSpec(
        num_frames=num_frames,
        num_static=0,
        camera_motion_xi=np.array([0.0, 0.004, 0.0, 0.0, 0.0, 0.8]),
        objects=[
            ObjectSpec(
                object_id=1,
                initial_pose_xi=np.array([0.0, 0.0, 0.0, -4.0, 0.3, 16.0]),
                motion_xi=np.array([0.0, 0.01, 0.0, 0.5, 0.0, 0.1]),
                num_points=0,
            ),
            ObjectSpec(
                object_id=2,
                initial_pose_xi=np.array([0.0, 0.0, 0.0, 5.0, 0.0, 22.0]),
                motion_xi=np.array([0.0, -0.008, 0.0, -0.4, 0.0, 0.15]),
                num_points=0,
            ),
            ObjectSpec(
                object_id=3,
                initial_pose_xi=np.array([0.0, 0.0, 0.0, 0.5, 0.2, 28.0]),
                motion_xi=np.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.9]),
                num_points=0,
            ),
        ],
    )
    dense = DenseScenario(spec, intr, ground_y=1.6, far_depth=60.0,
                          object_half_extent=1.6, world_texture=world_texture)
    return [jax.device_put(dense.frame(k)) for k in range(num_frames)]


def build():
    import jax

    from dynosam_tpu.parallel.batched import init_pipeline_state, make_fused_step

    cfg, intr = bench_config()
    frames = make_frames(intr)
    # donate the state: the (~30 MB) pipeline state is consumed and rebuilt
    # every step — donation makes the update in-place in HBM
    step = jax.jit(make_fused_step(cfg, intr), donate_argnums=0)
    state = init_pipeline_state(cfg)
    return step, state, frames


def main():
    import jax

    step, state, frames = build()

    t0 = time.time()
    state, out = step(state, frames[0])
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    for i in range(1, WARMUP):
        state, out = step(state, frames[i % DISTINCT_FRAMES])
    jax.block_until_ready(out)

    t0 = time.time()
    for i in range(MEASURE):
        state, out = step(state, frames[(WARMUP + i) % DISTINCT_FRAMES])
    jax.block_until_ready(out)
    dt = (time.time() - t0) / MEASURE
    fps = 1.0 / dt

    print(
        f"[bench] device={jax.devices()[0].device_kind} compile={compile_s:.1f}s "
        f"per-frame={dt * 1e3:.2f}ms",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "e2e_fps_kitti_scale_synth",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 100.0, 3),
            }
        )
    )


def supervise():
    """Run `main()` in child processes, retrying on transient device failures.

    Prints exactly one JSON line on stdout (the successful child's last JSON
    line); everything else goes to stderr.  Exits non-zero only if every
    attempt fails.
    """
    last_rc = 1
    for attempt in range(1, MAX_ATTEMPTS + 1):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            text=True,
            timeout=1800,
        )
        last_rc = proc.returncode
        json_line = None
        for line in (proc.stdout or "").splitlines():
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    parsed = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "metric" in parsed and "value" in parsed:
                    json_line = line
        if proc.returncode == 0 and json_line is not None:
            print(json_line)
            return 0
        print(
            f"[bench] attempt {attempt}/{MAX_ATTEMPTS} failed "
            f"(rc={proc.returncode}, json={'yes' if json_line else 'no'})"
            + (f"; retrying in {RETRY_DELAY_S:.0f}s" if attempt < MAX_ATTEMPTS else ""),
            file=sys.stderr,
        )
        if attempt < MAX_ATTEMPTS:
            time.sleep(RETRY_DELAY_S)
    return last_rc or 1


if __name__ == "__main__":
    if "--worker" in sys.argv:
        main()
    else:
        sys.exit(supervise())
