"""Probe the window-advance hot path: is the eigh fallback being taken?
How much do marginal_point_uncertainty / the eigh branch / decoupled solve
cost individually?"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from dynosam_tpu.backend import graph as graph_mod
from dynosam_tpu.backend import hybrid as hybrid_mod
from dynosam_tpu.backend import window as window_mod
from dynosam_tpu.parallel.batched import init_pipeline_state, make_fused_step


def timeit(fn, args, n=30, warmup=5):
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
    cfg, intr = bench.bench_config()
    cfg = cfg.normalized()
    frames = bench.make_frames(intr)
    step = jax.jit(make_fused_step(cfg, intr))
    state = init_pipeline_state(cfg)
    for i in range(cfg.backend.max_frames + 4):
        state, _ = step(state, frames[i % len(frames)])
    jax.block_until_ready(state)
    g = state.graph
    bcfg = cfg.backend

    # 1. Does the fast-path Cholesky of the marginal prior succeed?
    #    (mirror the shipped path: permute -> floor -> equilibrated full chol)
    def chol_ok_probe(gr):
        M, gg = window_mod._departing_information_hybrid(gr, bcfg)
        import numpy as np
        F, J, D = gr.F, gr.J, gr.D
        dtype = gr.X.dtype
        M = 0.5 * (M + M.T)
        dep = np.asarray(window_mod._departing_indices(F, J))
        nd = dep.shape[0]
        keep = np.setdiff1d(np.arange(D), dep)
        perm = jnp.asarray(np.concatenate([dep, keep]))
        M_perm = M[perm][:, perm]
        diag0 = jnp.diagonal(M_perm)
        max_d = jnp.maximum(jnp.max(diag0), 1.0)
        dead = diag0 <= 1e-10 * max_d
        reg = jnp.where(dead, 1e-6 * max_d, 0.0) + jnp.where(
            jnp.arange(D) < nd, window_mod._EPS_REG, 0.0
        )
        M_perm = M_perm + jnp.diag(reg)
        s_eq = jnp.sqrt(jnp.diagonal(M_perm))
        Mn = M_perm / (s_eq[:, None] * s_eq[None, :])
        Mn = Mn + 1e-5 * jnp.eye(D, dtype=dtype)
        Ln = jnp.linalg.cholesky(Mn)
        return jnp.isfinite(Ln).all()

    probe = jax.jit(chol_ok_probe)
    # run the loop and tally
    st = init_pipeline_state(cfg)
    oks = []
    for i in range(30):
        st, _ = step(st, frames[i % len(frames)])
        if i >= cfg.backend.max_frames:
            oks.append(bool(probe(st.graph)))
    print(f"chol_ok rate over {len(oks)} advances: {sum(oks)}/{len(oks)}")

    # 2. advance timing: shipped vs no-marginal-uncertainty
    adv = jax.jit(lambda gr: window_mod.advance_hybrid(gr, bcfg))
    t = timeit(adv, (g,))
    print(f"advance_hybrid (shipped):           {t:8.3f} ms")

    bcfg_nmu = dataclasses.replace(bcfg, marginal_point_uncertainty=False)
    adv2 = jax.jit(lambda gr: window_mod.advance_hybrid(gr, bcfg_nmu))
    t = timeit(adv2, (g,))
    print(f"advance_hybrid (no marg-point-unc): {t:8.3f} ms")

    # 3. optimize timing: decoupled vs joint, as incremental-mode would run
    inc = dataclasses.replace(
        bcfg,
        optimizer=dataclasses.replace(
            bcfg.optimizer, accept_reject=True,
            max_iterations=min(3, bcfg.optimizer.max_iterations),
        ),
    )
    op1 = jax.jit(lambda gr: hybrid_mod.optimize(gr, inc))
    print(f"optimize decoupled (2 iters):       {timeit(op1, (g,)):8.3f} ms")
    joint = dataclasses.replace(inc, decoupled_object_solve=False)
    op2 = jax.jit(lambda gr: hybrid_mod.optimize(gr, joint))
    print(f"optimize joint     (2 iters):       {timeit(op2, (g,)):8.3f} ms")

    # 4. pieces of advance: departing info vs eliminate+roll
    dep_j = jax.jit(lambda gr: window_mod._departing_information_hybrid(gr, bcfg))
    print(f"  departing_information_hybrid:     {timeit(dep_j, (g,)):8.3f} ms")
    M, gg = dep_j(g)
    elim_j = jax.jit(lambda gr, M, gg: window_mod._eliminate_and_roll(gr, bcfg, M, gg))
    print(f"  eliminate_and_roll:               {timeit(elim_j, (g, M, gg)):8.3f} ms")


if __name__ == "__main__":
    main()
