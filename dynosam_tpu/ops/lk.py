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

TPU formulation: patch sampling is the hot op and TPU has no fast scattered
gather. Two generations of fix live here:

  * _extract_patches_mm — bilinear sampling as two dense contractions with
    two-tap weight matrices (patch = Wrow @ img @ Wcol^T) on the MXU. Exact
    vs _gather_bilinear, but each call contracts against the FULL image
    (N*S*H*W MACs), so per-iteration use is expensive. Kept for parity
    tests and as the reference sampler.
  * strips (_extract_strips + _sample_strips) — the tracking path. Per
    level each keypoint fetches ONE integer-aligned strip: Sr consecutive
    rows x two aligned 128-lane blocks, via a single flat row gather on the
    (H*W/128, 128) view — the embedding-lookup pattern, which the TPU
    gathers at full HBM rate (contiguous 512-byte lanes). All bilinear
    sampling (template once, warped patch every LK iteration) then happens
    INSIDE the strip with tiny (N,S,Sr)x(N,Sr,256) einsums, so the
    per-iteration cost no longer touches the image at all. f32 throughout
    (the big contraction that motivated bf16 is gone).

The r3/r4 BENCH_TABLE klt row (4.42 FPS) was this module's scattered
per-pixel gather path; the strip path replaces it.
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


def _gather_bilinear(img, uv):
    """img (H, W); uv (..., 2) float -> (...,) bilinear samples (clamped).

    Scattered-gather reference implementation — kept for parity tests and
    microbenches (scripts/probe_klt.py); the tracking path uses
    _extract_patches_mm (MXU contraction) instead."""
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


def _axis_weights(c0, size: int, dim: int):
    """Bilinear sampling weights along one axis as a dense matrix.

    c0: (N,) continuous start coordinate; samples at c0 + 0..size-1.
    Returns (N, size, dim) where row (n, j) holds the two bilinear taps for
    sample position c0[n] + j over a dim-length axis (clamped like
    _gather_bilinear). Dense on purpose: multiplying by these is how the
    gather is fed to the MXU.
    """
    pos = c0[:, None] + jnp.arange(size, dtype=c0.dtype)[None, :]   # (N, S)
    pos = jnp.clip(pos, 0.0, dim - 1.001)
    p0 = jnp.floor(pos)
    fr = (pos - p0)[..., None]                                       # (N, S, 1)
    ax = jnp.arange(dim, dtype=c0.dtype)[None, None, :]              # (1, 1, D)
    return jnp.where(ax == p0[..., None], 1.0 - fr, 0.0) + jnp.where(
        ax == p0[..., None] + 1.0, fr, 0.0
    )


def _extract_patches_mm(img, uv, half: int, pad: int = 0, compute_dtype=None):
    """Bilinearly sampled (N, S, S) patches, S = 2*half+1+2*pad, centered at
    uv (x, y), top-left sample at uv - (half+pad).

    The gather->matmul trick: TPU has no fast scattered gather, but the MXU
    multiplies big matrices for free next to this pipeline's latency floor —
    so bilinear sampling is expressed as two dense contractions with
    two-tap weight matrices, patch = Wrow @ img @ Wcol^T. With
    compute_dtype=None, numerics are identical to _gather_bilinear at every
    in-bounds sample (same clamping). The tracking path passes bfloat16:
    image values and two-tap weights quantize to ~2^-8 relative (≈0.004 px
    of sub-pixel weight error), accumulation stays f32 — flow noise is
    ~0.01 px against a 1.0 px forward-backward gate, and the einsums run at
    the MXU's bf16 rate with half the HBM traffic.
    """
    S = 2 * (half + pad) + 1
    H, W = img.shape
    wr = _axis_weights(uv[:, 1] - (half + pad), S, H)      # (N, S, H)
    wc = _axis_weights(uv[:, 0] - (half + pad), S, W)      # (N, S, W)
    if compute_dtype is not None:
        img = img.astype(compute_dtype)
        wr = wr.astype(compute_dtype)
        wc = wc.astype(compute_dtype)
    rows = jnp.einsum(
        "njy,yx->njx", wr, img, preferred_element_type=jnp.float32
    )                                                      # (N, S, W)
    if compute_dtype is not None:
        rows = rows.astype(compute_dtype)
    return jnp.einsum(
        "njx,nix->nji", rows, wc, preferred_element_type=jnp.float32
    )                                                      # (N, S, S)


def _extract_strips(img, r0, c0, Sr: int):
    """Integer-aligned strips around keypoints: one flat row gather.

    img (H, W); r0, c0 (N,) int32 desired top-left. Returns
    (strips (N, Sr, 256) — Sr consecutive rows x two aligned 128-lane
    blocks, row0 (N,), col0 (N,)) where (row0, col0) is the global
    coordinate of strip element (0, 0). The gather runs on the
    (H * W/128, 128) view: each index pulls one contiguous 512-byte lane
    group, the layout TPU gathers at full HBM rate.
    """
    H, W = img.shape
    nb = max((W + 127) // 128, 2)
    if nb * 128 != W:
        img = jnp.pad(img, ((0, 0), (0, nb * 128 - W)), mode="edge")
    img2 = img.reshape(H * nb, 128)
    r0 = jnp.clip(r0, 0, max(H - Sr, 0))
    b0 = jnp.clip(c0 // 128, 0, nb - 2)
    ridx = jnp.clip(r0[:, None] + jnp.arange(Sr), 0, H - 1)   # (N, Sr)
    flat = ridx[:, :, None] * nb + (
        b0[:, None, None] + jnp.arange(2)[None, None, :]
    )                                                         # (N, Sr, 2)
    strips = jnp.take(img2, flat.reshape(-1), axis=0).reshape(
        r0.shape[0], Sr, 256
    )
    return strips, r0, b0 * 128


def _local_axis_weights(g0, start, size: int, dim_global: int, dim_local: int):
    """Two-tap bilinear weights for samples at global positions g0 + 0..size-1,
    expressed in a local window whose element 0 sits at global `start`.

    Positions are clamped to the GLOBAL valid range first (identical border
    semantics to _gather_bilinear), then to the local window — the latter
    only binds when a track escaped its search window, and those tracks are
    rejected by the forward-backward gate anyway.
    """
    pos = g0[:, None] + jnp.arange(size, dtype=g0.dtype)[None, :]
    pos = jnp.clip(pos, 0.0, dim_global - 1.001) - start[:, None]
    pos = jnp.clip(pos, 0.0, dim_local - 1.001)
    p0 = jnp.floor(pos)
    fr = (pos - p0)[..., None]
    ax = jnp.arange(dim_local, dtype=g0.dtype)[None, None, :]
    return jnp.where(ax == p0[..., None], 1.0 - fr, 0.0) + jnp.where(
        ax == p0[..., None] + 1.0, fr, 0.0
    )


def _sample_strips(strips, row0, col0, y0, x0, Sy: int, Sx: int, H: int, W: int):
    """Bilinear samples at global positions (y0+j, x0+i), j<Sy, i<Sx, from
    aligned strips. Two small einsums — never touches the image."""
    _, Sr, L = strips.shape
    rw = _local_axis_weights(y0, row0.astype(y0.dtype), Sy, H, Sr)
    cw = _local_axis_weights(x0, col0.astype(x0.dtype), Sx, W, L)
    tmp = jnp.einsum(
        "nrl,nxl->nrx", strips, cw, preferred_element_type=jnp.float32
    )                                                      # (N, Sr, Sx)
    return jnp.einsum(
        "nyr,nrx->nyx", rw, tmp, preferred_element_type=jnp.float32
    )                                                      # (N, Sy, Sx)


def _lk_level(
    img0, img1, uv0, d, half: int, iters: int, min_eig: float,
    margin: int = 6,
):
    """One pyramid level of inverse-compositional LK.

    uv0: (N, 2) keypoints in THIS level's pixels; d: (N, 2) current flow.
    Returns (d, ok) — ok False where G is degenerate (min eigenvalue below
    min_eig per pixel, cv::goodFeaturesToTrack-style criterion).

    All sampling is strip-based (see module docstring): the template strip
    and the search-window strip are fetched ONCE per level; every LK
    iteration then samples the warped patch inside the window strip with
    two tiny einsums. `margin` bounds how far d may move WITHIN this level
    before samples clamp to the window edge (such tracks fail the
    forward-backward gate) — the coarse-to-fine init means per-level
    refinement is a few pixels in practice.

    The template is extracted with a 1-px halo and its gradients taken by
    central difference INSIDE the patch — identical to bilinearly sampling
    the global central-difference gradient images at interior points (the
    two operations commute on a uniformly-shifted sample grid); only
    clamped border samples differ, and those keypoints are already
    discarded by the in-bounds/ok gates.
    """
    n = uv0.shape[0]
    S = 2 * half + 1
    P = S * S
    H, W = img0.shape

    # template strip (img0, fixed): S+2 samples incl. halo, +1 row/col for
    # the bilinear upper tap
    y0t = uv0[:, 1] - (half + 1)
    x0t = uv0[:, 0] - (half + 1)
    strips_t, row0t, col0t = _extract_strips(
        img0,
        jnp.floor(y0t).astype(jnp.int32),
        jnp.floor(x0t).astype(jnp.int32),
        S + 3,
    )
    big = _sample_strips(strips_t, row0t, col0t, y0t, x0t, S + 2, S + 2, H, W)
    t = big[:, 1:-1, 1:-1].reshape(n, P)                  # template (N, P)
    tx = (0.5 * (big[:, 1:-1, 2:] - big[:, 1:-1, :-2])).reshape(n, P)
    ty = (0.5 * (big[:, 2:, 1:-1] - big[:, :-2, 1:-1])).reshape(n, P)

    gxx = jnp.sum(tx * tx, axis=-1)
    gxy = jnp.sum(tx * ty, axis=-1)
    gyy = jnp.sum(ty * ty, axis=-1)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_ev = 0.5 * (tr - jnp.sqrt(jnp.clip(tr * tr - 4 * det, 0.0, None)))
    ok = min_ev / P >= min_eig
    inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)

    # search-window strip (img1): covers d drifting +-margin px from its
    # level-entry value
    yw = uv0[:, 1] + d[:, 1] - (half + margin)
    xw = uv0[:, 0] + d[:, 0] - (half + margin)
    strips_w, row0w, col0w = _extract_strips(
        img1,
        jnp.floor(yw).astype(jnp.int32),
        jnp.floor(xw).astype(jnp.int32),
        S + 2 * margin + 1,
    )

    def body(_, d):
        w = _sample_strips(
            strips_w, row0w, col0w,
            uv0[:, 1] + d[:, 1] - half,
            uv0[:, 0] + d[:, 0] - half,
            S, S, H, W,
        ).reshape(n, P)
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
    """Coarse-to-fine flow for sparse keypoints. Returns (flow (N,2), ok).

    The coarsest level starts from d=0 with the whole inter-frame motion
    ahead of it, so its search window is twice as wide as the refinement
    levels' (2*margin px at level L-1 covers 2*margin*2^(L-1) full-res px).
    """
    L = len(pyr0)
    d = jnp.zeros_like(uv0)
    ok = valid
    for lvl in range(L - 1, -1, -1):
        s = 2.0**lvl
        d, ok_l = _lk_level(
            pyr0[lvl], pyr1[lvl], uv0 / s, d, half, iters, min_eig,
            margin=(12 if lvl == L - 1 else 6),
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
