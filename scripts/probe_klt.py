"""Microbench the KLT-mode frontend pieces at bench scale (384x1280,
~1824 keypoints): where does fused-synth-klt's frame time actually go —
CLAHE, pyramid, the LK solve, detection?

Timing on this box is subtle: independent same-input dispatches overlap on
the device (and a `* 0.0` data dependency constant-folds away), so every
probe here chains SEMANTICALLY — the next call consumes the previous call's
output — and a raw-matmul chain of known FLOPs calibrates the clock.

Usage: python scripts/probe_klt.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.ops import lk
from dynosam_tpu.frontend.tracker import (
    _clahe_padded,
    shi_tomasi_response,
    _cell_reduce,
)

H, W = 384, 1280
N = 1824


def time_chain(step, state, n=20, warmup=3):
    """step: state -> state (same structure). Chained: call i+1 consumes
    call i's output, so the device cannot overlap iterations."""
    for _ in range(warmup):
        state = step(state)
    jax.block_until_ready(state)
    t0 = time.time()
    for _ in range(n):
        state = step(state)
    jax.block_until_ready(state)
    return (time.time() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    g0 = jnp.asarray(rng.random((H, W), np.float32))
    g1 = jnp.asarray(rng.random((H, W), np.float32))
    uv = jnp.asarray(
        np.stack([rng.uniform(8, W - 8, N), rng.uniform(8, H - 8, N)], -1
                 ).astype(np.float32)
    )
    valid = jnp.ones((N,), bool)

    # clock calibration: chained big matmul with KNOWN flops
    a = jnp.asarray(rng.random((2048, 2048), np.float32))
    mm = jax.jit(lambda x: (x @ a) * 1e-3)
    ms = time_chain(mm, a)
    gflop = 2 * 2048**3 / 1e9
    print(f"matmul 2048^3 chain: {ms:8.3f} ms  "
          f"({gflop / ms:7.1f} GFLOP/ms f32)")

    # CLAHE: g -> equalized g (chainable as-is)
    clahe_s = jax.jit(lambda g: _clahe_padded(g, 8, 2.0))
    print(f"clahe 8x8:          {time_chain(clahe_s, g0):8.3f} ms")

    # pyramid: chain through level-0 (same shape)
    pyr_s = jax.jit(lambda g: lk.build_pyramid(g, 3)[0] * 0.999 + 1e-4)
    print(f"build_pyramid(3):   {time_chain(pyr_s, g0):8.3f} ms")

    # full track: chain uv -> uv1 (clip keeps it in frame). `ok` MUST feed
    # the chained output — discarding it dead-code-eliminates the entire
    # backward pass, which is how the r4 probe printed identical times for
    # fb=True and fb=False.
    def track_once(u):
        uv1, ok = lk.lk_track(g0, g1, u, valid, levels=3, half=3, iters=8)
        return jnp.clip(jnp.where(ok[:, None], uv1, u), 8.0, W - 8.0)

    track_s = jax.jit(track_once)
    print(f"lk_track fb=True:   {time_chain(track_s, uv):8.3f} ms")

    def track_nofb(u):
        uv1, ok = lk.lk_track(
            g0, g1, u, valid, levels=3, half=3, iters=8, fb_check=False
        )
        return jnp.clip(jnp.where(ok[:, None], uv1, u), 8.0, W - 8.0)

    print(f"lk_track fb=False:  {time_chain(jax.jit(track_nofb), uv):8.3f} ms")

    # strip extraction alone (the per-level HBM cost of the new path)
    def strips_once(u):
        s, r0, c0 = lk._extract_strips(
            g0,
            jnp.floor(u[:, 1] - 9).astype(jnp.int32),
            jnp.floor(u[:, 0] - 9).astype(jnp.int32),
            20,
        )
        return jnp.clip(u + jnp.mean(s, (1, 2))[:, None] * 1e-6, 8.0, W - 8.0)

    print(f"strips (N,20,256):  {time_chain(jax.jit(strips_once), uv):8.3f} ms")

    # one full-res level (8 iters)
    def level_once(u):
        d, ok = lk._lk_level(g0, g1, u, jnp.zeros_like(u), 3, 8, 1e-4)
        return jnp.clip(u + d * 1e-6, 8.0, W - 8.0)

    print(f"_lk_level(full,8it):{time_chain(jax.jit(level_once), uv):8.3f} ms")

    # one patch extraction at full res
    def extract_once(u):
        p = lk._extract_patches_mm(g0, u, 3)
        return jnp.clip(u + jnp.mean(p, (1, 2), keepdims=False)[:, None] * 1e-6,
                        8.0, W - 8.0)

    print(f"extract (N,7,7):    {time_chain(jax.jit(extract_once), uv):8.3f} ms")

    # detection path: shi-tomasi response + cell argmax, chained through gray
    def detect_once(g):
        r = shi_tomasi_response(g)
        best, cu, cv = _cell_reduce(r, 8)
        return g * 0.999 + jnp.mean(best) * 1e-6

    print(f"shi_tomasi+cells:   {time_chain(jax.jit(detect_once), g0):8.3f} ms")


if __name__ == "__main__":
    main()
