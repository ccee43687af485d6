"""Microbench the KLT-mode frontend pieces at bench scale (384x1280,
~1824 keypoints): where do fused-synth-klt's 226 ms/frame (4.42 FPS,
BENCH_TABLE r3) actually go — CLAHE, pyramid, the LK gathers, detection?

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
from dynosam_tpu.frontend.tracker import _clahe_padded

H, W = 384, 1280
N = 1824


def timeit(fn, *args, n=20, warmup=3):
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
    rng = np.random.default_rng(0)
    g0 = jnp.asarray(rng.random((H, W), np.float32))
    g1 = jnp.asarray(rng.random((H, W), np.float32))
    uv = jnp.asarray(
        np.stack([rng.uniform(8, W - 8, N), rng.uniform(8, H - 8, N)], -1
                 ).astype(np.float32)
    )
    valid = jnp.ones((N,), bool)

    clahe = jax.jit(lambda g: _clahe_padded(g, 8, 2.0))
    print(f"clahe 8x8:          {timeit(clahe, g0):8.3f} ms")

    pyr = jax.jit(lambda g: lk.build_pyramid(g, 3))
    print(f"build_pyramid(3):   {timeit(pyr, g0):8.3f} ms")

    track = jax.jit(
        lambda a, b, u, v: lk.lk_track(a, b, u, v, levels=3, half=3, iters=8)
    )
    print(f"lk_track fb=True:   {timeit(track, g0, g1, uv, valid):8.3f} ms")

    track_nofb = jax.jit(
        lambda a, b, u, v: lk.lk_track(
            a, b, u, v, levels=3, half=3, iters=8, fb_check=False
        )
    )
    print(f"lk_track fb=False:  {timeit(track_nofb, g0, g1, uv, valid):8.3f} ms")

    # one level's pieces at full res
    uv_l = uv
    d0 = jnp.zeros_like(uv_l)
    lvl = jax.jit(lambda a, b, u, d: lk._lk_level(a, b, u, d, 3, 8, 1e-4))
    print(f"_lk_level(full,8it):{timeit(lvl, g0, g1, uv_l, d0):8.3f} ms")

    pc = lk._patch_coords(uv, 3)
    gath = jax.jit(lambda img, p: lk._gather_bilinear(img, p))
    print(f"gather (N,49):      {timeit(gath, g0, pc):8.3f} ms")

    # detection path (Shi-Tomasi + cell argmax), as the tracker runs it
    from dynosam_tpu.frontend import tracker as tr
    import inspect
    names = [n for n, _ in inspect.getmembers(tr) if "detect" in n.lower()]
    print("tracker detect fns:", names)


if __name__ == "__main__":
    main()
