"""Sparse pyramidal Lucas-Kanade optical flow (batched, jittable).

TPU-native replacement for the reference's cv::cuda::SparsePyrLKOpticalFlow
(/root/reference/dynosam/src/frontend/vision/StaticFeatureTracker.cc:238,
FeatureTracker.cc:500 `trackDynamicKLT`) — the no-provided-flow tracking
mode. Inverse-compositional formulation: per pyramid level the template
patch, its gradients, and the 2x2 normal matrix G are gathered/built ONCE;
each iteration only gathers the warped patch from the target image and
solves G d = b. All keypoints advance in lock-step (fixed levels x iters),
padded slots masked.

Forward-backward verification (`lk_track` with fb_check=True) mirrors the
reference's geometric-check stage: a point passes iff tracking it back from
the solution lands within fb_threshold of the start.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def _blur_121(img):
    """Separable [1,2,1]/4 binomial blur via shift-adds (VPU-friendly)."""
    v = 0.25 * (jnp.roll(img, 1, 0) + 2.0 * img + jnp.roll(img, -1, 0))
    return 0.25 * (jnp.roll(v, 1, 1) + 2.0 * v + jnp.roll(v, -1, 1))


def build_pyramid(gray, levels: int) -> List[jnp.ndarray]:
    """L levels, level 0 = full resolution; each next level blur + 2x decimate."""
    pyr = [gray]
    for _ in range(levels - 1):
        pyr.append(_blur_121(pyr[-1])[::2, ::2])
    return pyr


def _gradients(img):
    """Central-difference gradients (same convention as interp.image_gradients)."""
    gx = 0.5 * (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1))
    gy = 0.5 * (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0))
    return gx, gy


def _gather_bilinear(img, uv):
    """img (H, W); uv (..., 2) float -> (...,) bilinear samples (clamped)."""
    H, W = img.shape
    u = jnp.clip(uv[..., 0], 0.0, W - 1.001)
    v = jnp.clip(uv[..., 1], 0.0, H - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0
    dv = v - v0
    flat = img.reshape(-1)
    idx = v0 * W + u0

    def g(off):
        return flat[idx + off]

    top = g(0) * (1 - du) + g(1) * du
    bot = g(W) * (1 - du) + g(W + 1) * du
    return top * (1 - dv) + bot * dv


def _patch_coords(uv, half: int):
    """(N, 2) centers -> (N, P, 2) patch sample coordinates, P=(2h+1)^2."""
    r = jnp.arange(-half, half + 1, dtype=uv.dtype)
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    off = jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)  # (P, 2)
    return uv[:, None, :] + off[None, :, :]


def _lk_level(img0, img1, uv0, d, half: int, iters: int, min_eig: float):
    """One pyramid level of inverse-compositional LK.

    uv0: (N, 2) keypoints in THIS level's pixels; d: (N, 2) current flow.
    Returns (d, ok) — ok False where G is degenerate (min eigenvalue below
    min_eig per pixel, cv::goodFeaturesToTrack-style criterion).
    """
    gx, gy = _gradients(img0)
    pc = _patch_coords(uv0, half)                         # (N, P, 2)
    t = _gather_bilinear(img0, pc)                        # template (N, P)
    tx = _gather_bilinear(gx, pc)
    ty = _gather_bilinear(gy, pc)

    gxx = jnp.sum(tx * tx, axis=-1)
    gxy = jnp.sum(tx * ty, axis=-1)
    gyy = jnp.sum(ty * ty, axis=-1)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_ev = 0.5 * (tr - jnp.sqrt(jnp.clip(tr * tr - 4 * det, 0.0, None)))
    P = t.shape[-1]
    ok = min_ev / P >= min_eig
    inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)

    def body(_, d):
        w = _gather_bilinear(img1, pc + d[:, None, :])    # warped (N, P)
        e = w - t
        bx = jnp.sum(e * tx, axis=-1)
        by = jnp.sum(e * ty, axis=-1)
        # solve G [du dv]^T = -b  (inverse compositional: subtract)
        du = (gyy * bx - gxy * by) * inv_det
        dv = (gxx * by - gxy * bx) * inv_det
        return d - jnp.stack([du, dv], axis=-1)

    d = jax.lax.fori_loop(0, iters, body, d)
    return d, ok


def lk_flow(
    pyr0: Sequence[jnp.ndarray],
    pyr1: Sequence[jnp.ndarray],
    uv0,                       # (N, 2) level-0 pixels
    valid,                     # (N,) bool
    *,
    half: int = 3,
    iters: int = 8,
    min_eig: float = 1e-4,
):
    """Coarse-to-fine flow for sparse keypoints. Returns (flow (N,2), ok)."""
    L = len(pyr0)
    d = jnp.zeros_like(uv0)
    ok = valid
    for lvl in range(L - 1, -1, -1):
        s = 2.0**lvl
        d, ok_l = _lk_level(
            pyr0[lvl], pyr1[lvl], uv0 / s, d, half, iters, min_eig
        )
        ok = ok & (ok_l | (lvl > 0))      # eigen gate binds at full res only
        if lvl > 0:
            d = d * 2.0
    return d * 1.0, ok


def lk_track(
    gray0,
    gray1,
    uv0,
    valid,
    *,
    levels: int = 3,
    half: int = 3,
    iters: int = 8,
    min_eig: float = 1e-4,
    fb_check: bool = True,
    fb_threshold: float = 1.0,
):
    """Track keypoints gray0 -> gray1. Returns (uv1 (N,2), ok (N,)).

    fb_check: track the solution back to frame 0 and require
    |uv0 - backtracked| < fb_threshold (the reference's flow-back geometric
    verification).
    """
    pyr0 = build_pyramid(gray0, levels)
    pyr1 = build_pyramid(gray1, levels)
    flow, ok = lk_flow(
        pyr0, pyr1, uv0, valid, half=half, iters=iters, min_eig=min_eig
    )
    uv1 = uv0 + flow
    if fb_check:
        back, ok_b = lk_flow(
            pyr1, pyr0, uv1, valid, half=half, iters=iters, min_eig=min_eig
        )
        err = jnp.linalg.norm(uv1 + back - uv0, axis=-1)
        ok = ok & ok_b & (err < fb_threshold)
    H, W = gray0.shape
    inb = (
        (uv1[:, 0] >= 0)
        & (uv1[:, 0] <= W - 1)
        & (uv1[:, 1] >= 0)
        & (uv1[:, 1] <= H - 1)
    )
    return uv1, ok & inb & valid
