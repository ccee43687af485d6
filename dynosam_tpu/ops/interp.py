"""Image sampling primitives: bilinear / nearest gather at subpixel points.

These replace the reference's per-feature cv::Mat pixel lookups in the dense
optical-flow tracker (/root/reference/dynosam/src/frontend/vision/
FeatureTracker.cc:339-498 `trackDynamic`: functional::at<>(flow, ...) etc.)
with batched gathers that XLA fuses into the tracker program.

Images are (H, W) or (H, W, C) arrays; points are (..., 2) in (u, v) = (x, y)
pixel coordinates, matching OpenCV convention (u = column, v = row).
"""

from __future__ import annotations

import jax.numpy as jnp


def _clip_uv(uv, h, w):
    u = jnp.clip(uv[..., 0], 0.0, w - 1.0)
    v = jnp.clip(uv[..., 1], 0.0, h - 1.0)
    return u, v


def sample_nearest(img, uv):
    """Nearest-neighbour sample. img: (H, W[, C]), uv: (..., 2) -> (...[, C])."""
    h, w = img.shape[0], img.shape[1]
    u, v = _clip_uv(uv, h, w)
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    return img[vi, ui]


def sample_bilinear(img, uv):
    """Bilinear sample. img: (H, W[, C]) float, uv: (..., 2) -> (...[, C])."""
    h, w = img.shape[0], img.shape[1]
    u, v = _clip_uv(uv, h, w)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    u1i = jnp.minimum(u0i + 1, w - 1)
    v1i = jnp.minimum(v0i + 1, h - 1)

    if img.ndim == 3:
        du = du[..., None]
        dv = dv[..., None]

    i00 = img[v0i, u0i]
    i01 = img[v0i, u1i]
    i10 = img[v1i, u0i]
    i11 = img[v1i, u1i]
    top = i00 * (1.0 - du) + i01 * du
    bot = i10 * (1.0 - du) + i11 * du
    return top * (1.0 - dv) + bot * dv


def sample_flow(flow, uv):
    """Flow lookup at tracked keypoints — NEAREST-neighbour.

    Reference parity: FeatureTracker::trackDynamic reads the flow image at
    integer pixels (`functional::at`). The nearest pixel of a surviving
    track is the one its label-consistency check validated last frame, so
    the read is guaranteed to come from the track's own region. Bilinear
    interpolation instead smears flow across motion boundaries: a point
    1 px inside an object silhouette blends object flow with background
    flow, which at KITTI scale (1 px ~ 10 cm at 20 m) is a decimeter-level
    3D bias on small/far objects — measured as the dominant fixture-sequence
    object-motion error. Within a region the flow field is smooth, so the
    subpixel loss is negligible."""
    return sample_nearest(flow, uv)


def sample_label(mask, uv):
    """Sample an integer (H, W) label image with nearest-neighbour."""
    return sample_nearest(mask, uv)


def sample_depth(depth, uv):
    """Depth lookup at keypoints — nearest-neighbour, matching the reference's
    integer-pixel functional::at<double> depth reads (Frame.cc updateDepths).
    Bilinear would smear depth across object boundaries."""
    return sample_nearest(depth, uv)


def image_gradients(img):
    """Central-difference gradients of (H, W) image -> (gx, gy), each (H, W)."""
    gx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    gy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    # zero out wrap-around columns/rows
    gx = gx.at[:, 0].set(0.0).at[:, -1].set(0.0)
    gy = gy.at[0, :].set(0.0).at[-1, :].set(0.0)
    return gx, gy
