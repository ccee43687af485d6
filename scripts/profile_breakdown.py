"""Per-stage timing breakdown of the fused SLAM step at bench scale.

Jits each stage separately (frontend, graph ingest, window advance, optimize)
and times them steady-state, so optimization work can be aimed at the
dominant stage. Stage timings measured separately add dispatch/sync overhead
the fused program doesn't pay — use the ratios, not the absolutes.

Usage: python scripts/profile_breakdown.py [--updater 3] [--trace DIR]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, n=20, warmup=3):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updater", type=int, default=3)
    ap.add_argument("--trace", default=None, help="jax profiler trace dir")
    args = ap.parse_args()

    import jax

    import bench
    from dynosam_tpu.backend import graph as graph_mod
    from dynosam_tpu.backend import hybrid as hybrid_mod
    from dynosam_tpu.backend import solver as solver_mod
    from dynosam_tpu.backend import wcpe as wcpe_mod
    from dynosam_tpu.backend import window as window_mod
    from dynosam_tpu.frontend.frontend import frontend_step
    from dynosam_tpu.parallel.batched import init_pipeline_state, make_fused_step

    cfg, intr = bench.bench_config()
    cfg = dataclasses.replace(
        cfg, backend=dataclasses.replace(
            cfg.backend, backend_updater_enum=args.updater
        )
    ).normalized()

    _, _, frames = bench.build()
    step = jax.jit(make_fused_step(cfg, intr))  # NO donation: state is reused
    state = init_pipeline_state(cfg)

    if cfg.backend.backend_updater_enum == 3:
        update_fn, optimize_fn = (
            graph_mod.update_from_packet_hybrid, hybrid_mod.optimize,
        )
        advance_fn = window_mod.advance_hybrid
    elif cfg.backend.backend_updater_enum == 1:
        update_fn, optimize_fn = wcpe_mod.update_from_packet_wcpe, wcpe_mod.optimize
        advance_fn = window_mod.advance_wcpe
    else:
        update_fn, optimize_fn = graph_mod.update_from_packet, solver_mod.optimize
        advance_fn = window_mod.advance

    # incremental-mode optimizer tweak mirrors make_fused_step
    bcfg = cfg.backend
    if bcfg.optimization_mode == 2:
        bcfg = dataclasses.replace(
            bcfg,
            optimizer=dataclasses.replace(
                bcfg.optimizer, accept_reject=True,
                max_iterations=min(3, bcfg.optimizer.max_iterations),
            ),
        )

    # fill state to steady-state (window full)
    for i in range(cfg.backend.max_frames + 2):
        state, _ = step(state, frames[i % len(frames)])
    jax.block_until_ready(state)

    fe_j = jax.jit(lambda st, inp: frontend_step(st, inp, intr, cfg.frontend))
    up_j = jax.jit(lambda g, pkt: update_fn(g, pkt, intr, bcfg))
    adv_j = jax.jit(lambda g: advance_fn(g, bcfg))
    op_j = jax.jit(lambda g: optimize_fn(g, bcfg))

    fe_state, g = state.frontend, state.graph
    _, packet = fe_j(fe_state, frames[0])
    jax.block_until_ready(packet)

    print(f"== stage breakdown (updater={cfg.backend.backend_updater_enum}) ==")
    t_fused = timeit(step, (state, frames[0]), n=30)
    print(f"fused step total:   {t_fused:8.3f} ms   ({1e3 / t_fused:.1f} FPS)")
    t_fe = timeit(fe_j, (fe_state, frames[0]), n=30)
    print(f"frontend_step:      {t_fe:8.3f} ms")
    t_up = timeit(up_j, (g, packet), n=30)
    print(f"graph update:       {t_up:8.3f} ms")
    t_adv = timeit(adv_j, (g,), n=30)
    print(f"window advance:     {t_adv:8.3f} ms")
    t_op = timeit(op_j, (g,), n=30)
    print(f"optimize:           {t_op:8.3f} ms")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for i in range(5):
                state, out = step(state, frames[i % len(frames)])
            jax.block_until_ready(out)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
