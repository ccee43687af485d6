"""Streamed-vs-batch hybrid accuracy experiment (backend-only, fast compile).

Feeds simulator packets straight into RegularBackend (no frontend, no
renderer) so solver changes can be iterated quickly on 1 CPU. Reports
per-frame object-motion error for full-batch vs sliding-window/incremental,
using marginalization-time (mature) estimates for the windowed modes — the
fixed-lag output contract.

Usage: python scripts/exp_streaming.py [--frames N] [--window W] [--mode M]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--modes", type=str, default="0,1,2")
    ap.add_argument("--pixel_noise", type=float, default=0.4)
    ap.add_argument("--depth_noise", type=float, default=0.02)
    ap.add_argument("--iters", type=int, default=10)
    # initialization noise: the simulator feeds EXACT GT poses/motions as
    # initial values, so any motion the backend fails to update would score
    # a flattering 0.00 error. Perturb the inits (frontend-level noise) so
    # the metrics measure what the solver actually estimates.
    ap.add_argument("--init_rot_noise", type=float, default=0.01)
    ap.add_argument("--init_trans_noise", type=float, default=0.05)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from dynosam_tpu.backend.backend import RegularBackend
    from dynosam_tpu.config import BackendParams, NoiseParams, OptimizerParams
    from dynosam_tpu.dataproviders.simulator import Scenario, ScenarioSpec
    from dynosam_tpu.utils import lie

    n = args.frames
    scn = Scenario(
        ScenarioSpec.default_two_objects(
            num_frames=n,
            pixel_noise=args.pixel_noise,
            depth_noise=args.depth_noise,
            seed=5,
        )
    )
    MAX_OBJ = 4

    rng = np.random.default_rng(11)

    def _perturb(T):
        xi = np.concatenate(
            [
                rng.normal(0, args.init_rot_noise, 3),
                rng.normal(0, args.init_trans_noise, 3),
            ]
        )
        return np.asarray(lie.retract(jnp.asarray(T), jnp.asarray(xi)))

    def noisy_packet(pk, k):
        om = np.asarray(pk.object_motions)
        om = np.stack([_perturb(om[j]) for j in range(om.shape[0])])
        if k == 0:  # keep the gauge anchor exact so ATE compares cleanly
            return pk.replace(object_motions=jnp.asarray(om))
        return pk.replace(
            X_world_cam=jnp.asarray(_perturb(pk.X_world_cam)),
            odom_prev_curr=jnp.asarray(_perturb(pk.odom_prev_curr)),
            object_motions=jnp.asarray(om),
        )

    packets = [noisy_packet(scn.measurements(k, MAX_OBJ), k) for k in range(n)]

    def run(mode):
        cfg = BackendParams(
            optimization_mode=mode,
            backend_updater_enum=3,
            max_frames=n if mode == 0 else args.window,
            max_objects=MAX_OBJ,
            max_static_landmarks=256,
            max_dynamic_landmarks=96,
            noise=NoiseParams(use_range_dependent_noise=False),
            optimizer=OptimizerParams(max_iterations=args.iters),
        )
        be = RegularBackend(cfg, scn.intr)
        for k in range(n):
            be.step(packets[k])
        if mode == 0:
            be.finish()
        be.finalize_matured()
        return be

    def motion_errors(be):
        """{(k, oid): (trans_err_m, rot_err_rad)} over mature estimates."""
        out = {}
        for k in range(1, n):
            for j, ob in enumerate(scn.spec.objects):
                H = be.motion_at(k, object_id=ob.object_id)
                if H is None:
                    continue
                Hg = np.asarray(scn.H_gt[j][k])
                E = np.linalg.inv(Hg) @ H
                cos = np.clip((np.trace(E[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)
                out[(k, ob.object_id)] = (
                    float(np.linalg.norm(E[:3, 3])),
                    float(np.arccos(cos)),
                )
        return out

    def pose_errors(be):
        out = {}
        for k in range(n):
            X = be.pose_at(k)
            if X is None:
                continue
            E = np.linalg.inv(np.asarray(scn.X_gt[k])) @ X
            out[k] = float(np.linalg.norm(E[:3, 3]))
        return out

    results = {}
    for mode in [int(m) for m in args.modes.split(",")]:
        be = run(mode)
        me = motion_errors(be)
        pe = pose_errors(be)
        te = np.array([v[0] for v in me.values()])
        re = np.array([v[1] for v in me.values()])
        ate = np.sqrt(np.mean(np.square(list(pe.values()))))
        print(
            f"mode={mode} ATE {ate*100:7.3f} cm | AME rms "
            f"{np.sqrt(np.mean(te**2))*100:7.3f} cm med {np.median(te)*100:7.3f} cm "
            f"rot {np.sqrt(np.mean(re**2)):.5f} [{len(me)} motions]",
            flush=True,
        )
        results[mode] = me

    if 0 in results:
        for mode in results:
            if mode == 0:
                continue
            print(f"\nper-frame trans err (cm), batch vs mode {mode}, object 1:")
            for k in range(1, n):
                a = results[0].get((k, 1))
                b = results[mode].get((k, 1))
                fa = f"{a[0]*100:6.2f}" if a else " ----"
                fb = f"{b[0]*100:6.2f}" if b else " ----"
                print(f"  k={k:2d}  batch {fa}  streamed {fb}")


if __name__ == "__main__":
    main()
