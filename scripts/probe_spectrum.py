"""Probe H_keep's spectrum at steady state: why does the float32 Cholesky
fail, and which cheap repair (equilibration, diag-relative jitter) makes it
succeed without the O(D^3) eigh fallback?"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from dynosam_tpu.backend import window as window_mod
from dynosam_tpu.parallel.batched import init_pipeline_state, make_fused_step
from dynosam_tpu.utils import lie


def h_keep(gr, bcfg):
    M, gg = window_mod._departing_information_hybrid(gr, bcfg)
    F, J, D = gr.F, gr.J, gr.D
    dtype = gr.X.dtype
    M = 0.5 * (M + M.T)
    dep = np.asarray(window_mod._departing_indices(F, J))
    nd = dep.shape[0]
    keep = np.setdiff1d(np.arange(D), dep)
    P_d = jnp.zeros((nd, D), dtype).at[jnp.arange(nd), dep].set(1.0)
    P_r = jnp.zeros((D - nd, D), dtype).at[jnp.arange(D - nd), keep].set(1.0)
    M_d_rows = lie.mm(P_d, M)
    M_dd = lie.mm(M_d_rows, P_d.T) + window_mod._EPS_REG * jnp.eye(nd, dtype=dtype)
    M_dr = lie.mm(M_d_rows, P_r.T)
    M_rr = lie.mm(lie.mm(P_r, M), P_r.T)
    L_dd = jnp.linalg.cholesky(M_dd)
    sol = jax.scipy.linalg.cho_solve((L_dd, True), M_dr)
    Hk = M_rr - M_dr.T @ sol
    return 0.5 * (Hk + Hk.T)


def main():
    cfg, intr = bench.bench_config()
    cfg = cfg.normalized()
    frames = bench.make_frames(intr)
    step = jax.jit(make_fused_step(cfg, intr))
    state = init_pipeline_state(cfg)
    for i in range(cfg.backend.max_frames + 6):
        state, _ = step(state, frames[i % len(frames)])
    bcfg = cfg.backend
    hk = jax.jit(lambda gr: h_keep(gr, bcfg))

    stats = {k: 0 for k in ["plain", "equil", "equil_j1e-6", "equil_j1e-5", "equil_j1e-4"]}
    n_adv = 0
    for i in range(20):
        state, _ = step(state, frames[i % len(frames)])
        H = np.asarray(hk(state.graph), dtype=np.float64)
        n_adv += 1
        d = np.diagonal(H)
        if i == 0:
            print(f"D={H.shape[0]}  diag: min={d.min():.3e} max={d.max():.3e} "
                  f"n_zero={(d <= 0).sum()}  n_tiny={(d < 1e-6 * d.max()).sum()}")
            w = np.linalg.eigvalsh(H)
            print(f"eig: min={w.min():.3e} max={w.max():.3e} "
                  f"min/max={w.min() / w.max():.3e} n_neg={(w < 0).sum()}")
        H32 = H.astype(np.float32)

        def chol_ok(A):
            try:
                np.linalg.cholesky(A)
                return True
            except np.linalg.LinAlgError:
                return False

        stats["plain"] += chol_ok(H32)
        s = np.sqrt(np.maximum(np.diagonal(H32), 1e-12 * max(d.max(), 1.0))).astype(np.float32)
        Hn = H32 / np.outer(s, s)
        stats["equil"] += chol_ok(Hn)
        for eps, key in [(1e-6, "equil_j1e-6"), (1e-5, "equil_j1e-5"), (1e-4, "equil_j1e-4")]:
            stats[key] += chol_ok(Hn + eps * np.eye(Hn.shape[0], dtype=np.float32))
    for k, v in stats.items():
        print(f"chol_ok[{k}]: {v}/{n_adv}")


if __name__ == "__main__":
    main()
