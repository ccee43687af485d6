"""Probe the hybrid FULL_BATCH anomaly (VERDICT r3 weak #2): on both fixtures
hybrid batch is WORSE than its own sliding-window mode, and its rich-fixture
row coincides with WCPE-incremental to 5 digits — hypothesis: the batch LM
barely moves the state from its frontend initialization (iteration
starvation or step rejection), so the "optimized" output IS the init.

Prints the per-iteration error trace of both decoupled phases and the total
state displacement from init.

Usage: python scripts/probe_batch_hybrid.py [--frames 60] [--iters 10 40]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def err_trace(state, cfg, linearize_fn, apply_fn, solve_fn, error_fn, iters):
    """lm_accept_reject with the error trace exposed."""
    op = cfg.optimizer

    def step(carry, _):
        st, lam, err, done = carry
        lin = linearize_fn(st, cfg, lam)
        cand = apply_fn(st, lin, solve_fn(lin))
        new_err = error_fn(cand, cfg)
        accept = (new_err < err) & jnp.isfinite(new_err) & ~done
        st = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, st)
        decrease = err - new_err
        done = done | (
            accept
            & (
                (decrease < op.absolute_error_tol)
                | (decrease < op.relative_error_tol * err)
            )
        )
        err = jnp.where(accept, new_err, err)
        lam = jnp.where(
            accept,
            jnp.maximum(lam / op.lm_lambda_factor, op.lm_min_lambda),
            jnp.minimum(lam * op.lm_lambda_factor, op.lm_max_lambda),
        )
        return (st, lam, err, done), (err, accept, done)

    err0 = error_fn(state, cfg)
    lam0 = jnp.asarray(op.lm_initial_lambda, state.X.dtype)
    (state, _, _, _), (errs, accepts, dones) = jax.lax.scan(
        step, (state, lam0, err0, jnp.array(False)), None, length=iters
    )
    return state, err0, errs, accepts, dones


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--iters", type=int, nargs="*", default=[10, 40])
    ap.add_argument("--dataset", default="tests/fixtures/kitti_fixture")
    args = ap.parse_args()

    from dynosam_tpu.backend import hybrid as hybrid_mod
    from dynosam_tpu.config import (
        BackendParams, DynoConfig, FrontendParams, OptimizerParams,
        TrackerParams,
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
            optimization_mode=0,
            backend_updater_enum=3,
            max_frames=n,
            optimizer=OptimizerParams(max_iterations=10),
        ),
    )
    pipe = DynoPipeline(cfg, ds.intrinsics())
    for k in range(n):
        pipe.process_frame(ds.frame(k))
    st0 = pipe.backend.state                 # pre-finish (initialized) state
    bcfg = pipe.backend._opt_cfg
    print(f"state: F={st0.F} J={st0.J} D={st0.D} num_frames={int(st0.num_frames)}")

    op = bcfg.optimizer
    from dynosam_tpu.backend.solver import lm_accept_reject  # noqa (parity)

    n6 = 6 * st0.F
    D = st0.D

    def chol_solve(S, g):
        L = jnp.linalg.cholesky(S)
        z = jax.scipy.linalg.solve_triangular(L, g, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, z, lower=False)

    from dynosam_tpu.backend.hybrid import (
        _apply_update, _clip_step, linearize, total_error,
    )

    def lin_cam(stt, cfg_, lam):
        return linearize(stt, cfg_, lam, dynamic_scale=0.0)

    def solve_cam(lin):
        dx_x = chol_solve(lin.S[:n6, :n6], lin.rhs[:n6])
        return jnp.concatenate(
            [_clip_step(dx_x, op.gn_max_step), jnp.zeros(D - n6, dx_x.dtype)]
        )

    def err_cam(stt, cfg_):
        return total_error(stt, cfg_, dynamic_scale=0.0)

    def solve_obj(lin):
        dh = chol_solve(lin.S[n6:, n6:], lin.rhs[n6:])
        return jnp.concatenate(
            [jnp.zeros(n6, dh.dtype), _clip_step(dh, op.gn_max_step)]
        )

    for iters in args.iters:
        tr1 = jax.jit(
            lambda s: err_trace(s, bcfg, lin_cam, _apply_update, solve_cam,
                                err_cam, iters)
        )
        st1, e0, errs, acc, dn = tr1(st0)
        print(f"\n== iters={iters} phase1 (camera) err0={float(e0):.6g}")
        print("  errs:", np.array2string(np.asarray(errs), precision=5))
        print("  accepts:", np.asarray(acc).astype(int))
        print("  done:", np.asarray(dn).astype(int))

        tr2 = jax.jit(
            lambda s: err_trace(s, bcfg, linearize, _apply_update, solve_obj,
                                total_error, iters)
        )
        st2, e0b, errs2, acc2, dn2 = tr2(st1)
        print(f"phase2 (objects) err0={float(e0b):.6g}")
        print("  errs:", np.array2string(np.asarray(errs2), precision=5))
        print("  accepts:", np.asarray(acc2).astype(int))
        print("  done:", np.asarray(dn2).astype(int))

        dX = np.linalg.norm(np.asarray(st2.X - st0.X))
        dH = np.linalg.norm(np.asarray(st2.H - st0.H))
        print(f"state moved: |dX|={dX:.6g} |dH|={dH:.6g}")
        # F2F motion displacement at mid-window
        f = st0.F // 2
        H0 = np.asarray(hybrid_mod.f2f_motion(st0, f))
        H2 = np.asarray(hybrid_mod.f2f_motion(st2, f))
        print(f"f2f@{f} max |delta|: {np.abs(H2 - H0).max():.6g}")

        # JOINT solve from the same init (the reference's updateBatch is a
        # joint LM over the full graph; decoupling is a streaming feature)
        def solve_joint(lin):
            return _clip_step(chol_solve(lin.S, lin.rhs), op.gn_max_step)

        tr3 = jax.jit(
            lambda s: err_trace(s, bcfg, linearize, _apply_update,
                                solve_joint, total_error, iters)
        )
        st3, e0c, errs3, acc3, dn3 = tr3(st0)
        print(f"JOINT err0={float(e0c):.6g}")
        print("  errs:", np.array2string(np.asarray(errs3), precision=5))
        print("  accepts:", np.asarray(acc3).astype(int))
        H3 = np.asarray(hybrid_mod.f2f_motion(st3, f))
        print(f"joint f2f@{f} max |delta| vs init: {np.abs(H3 - H0).max():.6g}")


if __name__ == "__main__":
    main()
