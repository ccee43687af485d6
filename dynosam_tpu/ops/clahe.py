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
    # Scatter-free histogram: XLA lowers scatter-add on TPU to a serialized
    # per-update loop (~half a million sequential updates here); a one-hot
    # compare + sum is a fused VPU reduction instead.
    hist = jnp.sum(
        (
            tiles[:, :, None]
            == jnp.arange(bins, dtype=tiles.dtype)[None, None, :]
        ).astype(jnp.float32),
        axis=1,
    )

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

    if th % 2 == 0 and tw % 2 == 0:
        return _apply_luts_quadrant(
            b, lut, grid, th, tw, wy, wx, bins
        )

    # Fallback (odd half-tiles): per-pixel table gathers. TPU-slow — the
    # quadrant reduce above is the hot path; all even tile sizes take it.
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


def _apply_luts_quadrant(b, lut, grid: int, th: int, tw: int, wy, wx, bins):
    """Per-pixel 4-LUT bilinear application WITHOUT scattered gathers.

    Within each half-tile quadrant cell (th/2 x tw/2 pixels) the 4 blended
    tile indices are CONSTANT (the floor((pos+0.5)/tile - 0.5) corner pair
    flips exactly at half-tile boundaries), so the lookup becomes, per cell,
    a compare-multiply reduction over the 256 bins against 4 fixed LUT rows
    — XLA fuses the one-hot compare into the reduce (no materialized
    one-hot, no serialized gather). ~500M fused VPU ops at 384x1280 vs
    ~2M scattered gathers: measured 15.6 -> ~3 ms for the whole CLAHE
    (scripts/probe_klt.py).
    """
    H, W = b.shape
    g2y, g2x = 2 * grid, 2 * grid
    hq, wq = th // 2, tw // 2

    q = jnp.arange(g2y)
    m = (q - 1) // 2              # quadrant row -> lower tile row (floor)
    ty0 = jnp.clip(m, 0, grid - 1)
    ty1 = jnp.clip(m + 1, 0, grid - 1)
    tx0, tx1 = ty0, ty1           # square grid: same index map per axis

    # (g2y, g2x, 4) tile ids in corner order 00, 01, 10, 11
    tidx = jnp.stack(
        [
            ty0[:, None] * grid + tx0[None, :],
            ty0[:, None] * grid + tx1[None, :],
            ty1[:, None] * grid + tx0[None, :],
            ty1[:, None] * grid + tx1[None, :],
        ],
        axis=-1,
    )
    L4 = lut[tidx]                                   # (g2y, g2x, 4, bins)

    bc = (
        b.reshape(g2y, hq, g2x, wq).transpose(0, 2, 1, 3)
    )                                                # (g2y, g2x, hq, wq)
    k = jnp.arange(bins, dtype=bc.dtype)
    vals = jnp.sum(
        (bc[..., None, None] == k).astype(lut.dtype)
        * L4[:, :, None, None, :, :],
        axis=-1,
    )                                                # (g2y, g2x, hq, wq, 4)

    wyc = wy.reshape(g2y, hq)[:, None, :, None]      # (g2y, 1, hq, 1)
    wxc = wx.reshape(1, g2x * wq)[0].reshape(g2x, wq)[None, :, None, :]
    top = vals[..., 0] * (1 - wxc) + vals[..., 1] * wxc
    bot = vals[..., 2] * (1 - wxc) + vals[..., 3] * wxc
    out = top * (1 - wyc) + bot * wyc                # (g2y, g2x, hq, wq)
    return out.transpose(0, 2, 1, 3).reshape(H, W)
