"""Pinhole camera model, fully batched.

Reference parity: /root/reference/dynosam_cv/include/dynosam_cv/Camera.hpp:43
(project / backProject / backProjectFromZ / isKeypointContained) and
CameraParams.hpp. Distortion is handled at the data-provider level by
undistorting images/keypoints once on load (the reference's UndistortRectifier),
so the on-device model is an ideal pinhole — this keeps every projection a
couple of FMAs and avoids iterative undistortion inside jitted solvers.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class CameraIntrinsics:
    """Pinhole intrinsics as a pytree (traceable through jit).

    fx, fy, cx, cy are scalars (or broadcastable arrays for multi-camera
    batches). width/height are static Python ints so masks have static shapes.
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = flax.struct.field(pytree_node=False, default=0)
    height: int = flax.struct.field(pytree_node=False, default=0)
    # Virtual stereo baseline (meters) used for "fake stereo" depth weighting,
    # mirroring CameraParams depth params (PipelineManager.cc:275-279).
    baseline: float = flax.struct.field(pytree_node=False, default=0.1)

    @classmethod
    def create(cls, fx, fy, cx, cy, width=0, height=0, baseline=0.1, dtype=jnp.float32):
        return cls(
            fx=jnp.asarray(fx, dtype),
            fy=jnp.asarray(fy, dtype),
            cy=jnp.asarray(cy, dtype),
            cx=jnp.asarray(cx, dtype),
            width=int(width),
            height=int(height),
            baseline=float(baseline),
        )

    def matrix(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], axis=-1),
                jnp.stack([z, self.fy, self.cy], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )


def project(pts_cam, intr: CameraIntrinsics, eps: float = 1e-6):
    """Project camera-frame 3D points to pixels. (..., 3) -> (..., 2).

    Points behind the camera produce garbage uv; callers must mask with
    ``pts_cam[..., 2] > 0`` (kept branch-free for vmap/jit).
    """
    z = pts_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) < eps, jnp.full_like(z, eps), z)
    u = intr.fx * pts_cam[..., 0] / safe_z + intr.cx
    v = intr.fy * pts_cam[..., 1] / safe_z + intr.cy
    return jnp.stack([u, v], axis=-1)


def backproject(uv, depth, intr: CameraIntrinsics):
    """Back-project pixels at metric depth (z) to camera-frame 3D points.

    uv: (..., 2), depth: (...,) -> (..., 3). Matches Camera::backProject with
    the depth interpreted as z (backProjectFromZ semantics, the RGB-D path).
    """
    x = (uv[..., 0] - intr.cx) / intr.fx * depth
    y = (uv[..., 1] - intr.cy) / intr.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def backproject_uvz(uvz, intr: CameraIntrinsics):
    return backproject(uvz[..., :2], uvz[..., 2], intr)


def bearing(uv, intr: CameraIntrinsics):
    """Unit bearing vectors from pixels. (..., 2) -> (..., 3)."""
    x = (uv[..., 0] - intr.cx) / intr.fx
    y = (uv[..., 1] - intr.cy) / intr.fy
    v = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def in_image(uv, intr: CameraIntrinsics, border: float = 0.0):
    """Containment mask, mirroring Camera::isKeypointContained."""
    return (
        (uv[..., 0] >= border)
        & (uv[..., 0] <= intr.width - 1 - border)
        & (uv[..., 1] >= border)
        & (uv[..., 1] <= intr.height - 1 - border)
    )


def depth_to_disparity(depth, intr: CameraIntrinsics):
    """Metric depth -> virtual disparity (RGBDCamera.hpp:54 semantics)."""
    return intr.fx * intr.baseline / jnp.clip(depth, 1e-6, None)


def disparity_to_depth(disparity, intr: CameraIntrinsics):
    return intr.fx * intr.baseline / jnp.clip(disparity, 1e-6, None)
