"""CLAHE — contrast-limited adaptive histogram equalization (jittable).

Reference parity: the KLT static tracker equalizes frames with cv::CLAHE
before tracking (/root/reference/dynosam/src/frontend/vision/
StaticFeatureTracker.cc:226-285). TPU formulation: per-tile histograms by
scatter-add, clip + uniform excess redistribution, CDF lookup tables, and
bilinear blending of the 4 neighboring tile LUTs per pixel — all fixed-shape
tensor ops in one jitted graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("grid", "bins", "clip_limit"))
def clahe(gray, grid: int = 8, bins: int = 256, clip_limit: float = 2.0):
    """gray (H, W) float in [0, 1] -> equalized (H, W) float in [0, 1].

    H and W must be divisible by `grid` (pad beforehand otherwise).
    clip_limit is the usual multiple-of-uniform-bin-height cap.
    """
    H, W = gray.shape
    th, tw = H // grid, W // grid
    n_tiles = grid * grid
    npx = th * tw

    x = jnp.clip(gray, 0.0, 1.0)
    b = jnp.clip((x * (bins - 1) + 0.5).astype(jnp.int32), 0, bins - 1)

    tiles = (
        b.reshape(grid, th, grid, tw).transpose(0, 2, 1, 3).reshape(n_tiles, npx)
    )
    hist = jnp.zeros((n_tiles, bins), jnp.float32)
    hist = jax.vmap(lambda h, idx: h.at[idx].add(1.0))(hist, tiles)

    # clip + redistribute the excess uniformly (standard CLAHE)
    cap = clip_limit * npx / bins
    excess = jnp.sum(jnp.clip(hist - cap, 0.0, None), axis=1, keepdims=True)
    hist = jnp.minimum(hist, cap) + excess / bins

    cdf = jnp.cumsum(hist, axis=1)
    cdf0 = cdf[:, :1]
    lut = (cdf - cdf0) / jnp.clip(npx - cdf0, 1.0, None)   # (n_tiles, bins)

    # bilinear blend of the 4 surrounding tile LUTs at each pixel
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) / th - 0.5
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, grid - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, grid - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, grid - 1)
    x1 = jnp.clip(x0 + 1, 0, grid - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[None, :]

    flat_lut = lut.reshape(-1)

    def look(ty, tx):
        tile_idx = ty[:, None] * grid + tx[None, :]
        return flat_lut[tile_idx * bins + b]

    v00 = look(y0, x0)
    v01 = look(y0, x1)
    v10 = look(y1, x0)
    v11 = look(y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
