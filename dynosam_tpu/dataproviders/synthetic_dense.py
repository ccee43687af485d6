"""Dense synthetic RGB-D scene renderer for frontend tests & benchmarks.

Extends the kinematic simulator (simulator.py) to *dense* per-frame images
(rgb/depth/flow/mask — the reference's expected pre-processed inputs,
README.md:194-209) with analytically consistent geometry:

  * background: a ground plane (y = h) and a far wall -> exact per-pixel depth;
  * objects: billboard rectangles at the simulator's GT object poses, carrying
    the object's id in the instance mask;
  * flow: computed per pixel of frame k-1 by back-projecting its depth,
    applying the GT motion (camera for background, H_j for object pixels),
    and re-projecting into frame k — exactly the dense-flow contract the
    tracker consumes;
  * rgb: a procedural texture so corner detection has structure.

Because depth/flow/mask are generated from the same 3D model, a correct
frontend recovers the GT camera pose and object motions to solver precision.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from dynosam_tpu.cv import camera as cam
from dynosam_tpu.dataproviders.simulator import ObjectSpec, Scenario, ScenarioSpec
from dynosam_tpu.frontend.types import FrameInputs
from dynosam_tpu.utils import lie


class DenseScenario:
    """Wraps a Scenario and renders FrameInputs per frame."""

    def __init__(
        self,
        spec: ScenarioSpec,
        intr: cam.CameraIntrinsics,
        ground_y: float = 1.5,
        far_depth: float = 40.0,
        object_half_extent: float = 1.2,
    ):
        assert intr.width > 0 and intr.height > 0
        self.scn = Scenario(spec, intr)
        self.intr = intr
        self.ground_y = ground_y
        self.far_depth = far_depth
        self.obj_e = object_half_extent

    # ------------------------------------------------------------------
    def _background_depth(self, X):
        """Per-pixel depth of ground plane + far wall in camera frame."""
        intr = self.intr
        H, W = intr.height, intr.width
        u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
        v = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
        dx = (u - intr.cx) / intr.fx
        dy = (v - intr.cy) / intr.fy
        # ray in world: R @ (dx, dy, 1); ground plane y_world = ground_y
        R = lie.rotation(X)
        t = lie.translation(X)
        d_world = (
            R[:, 0][None, None, :] * dx[..., None]
            + R[:, 1][None, None, :] * dy[..., None]
            + R[:, 2][None, None, :]
        )  # (H, W, 3)
        denom = d_world[..., 1]
        lam = (self.ground_y - t[1]) / jnp.where(
            jnp.abs(denom) < 1e-6, 1e-6, denom
        )
        ground_ok = (lam > 0.1) & (lam < self.far_depth * 4)
        depth = jnp.where(ground_ok, lam, self.far_depth)
        return jnp.clip(depth, 0.1, self.far_depth)

    def _object_layers(self, k: int, X):
        """Rigid-plane depth+mask for each object at frame k.

        Each object is a rectangle rigidly attached to its body frame (plane
        through the body origin, normal = body z-axis). Ray-plane
        intersection per pixel makes depth/flow/mask *exactly* consistent
        with the GT rigid motion H (a billboard approximation would break
        consistency for rotating objects).
        """
        intr = self.intr
        H, W = intr.height, intr.width
        u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
        v = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
        dx = (u - intr.cx) / intr.fx
        dy = (v - intr.cy) / intr.fy
        R = lie.rotation(X)
        t = lie.translation(X)
        d_world = (
            R[:, 0][None, None, :] * dx[..., None]
            + R[:, 1][None, None, :] * dy[..., None]
            + R[:, 2][None, None, :]
        )  # (H, W, 3) ray directions (z-normalised in camera frame)
        layers = []
        for j, oid in enumerate(self.scn.object_ids):
            L = self.scn.L_gt[j][k]
            RL = lie.rotation(L)
            p0 = lie.translation(L)
            n = RL[:, 2]                      # body z-axis
            denom = jnp.einsum("hwc,c->hw", d_world, n)
            safe = jnp.where(jnp.abs(denom) < 1e-4, 1e-4, denom)
            lam = jnp.einsum("c,c->", n, p0 - t) / safe
            hit_w = t[None, None, :] + d_world * lam[..., None]
            hit_body = jnp.einsum(
                "ci,hwc->hwi", RL, hit_w - p0[None, None, :]
            )
            inside = (
                (lam > 0.5)
                & (jnp.abs(denom) > 1e-3)
                & (jnp.abs(hit_body[..., 0]) < self.obj_e)
                & (jnp.abs(hit_body[..., 1]) < self.obj_e)
            )
            layers.append((inside, lam, oid))
        return layers

    # ------------------------------------------------------------------
    def depth_mask(self, k: int):
        X = self.scn.X_gt[k]
        depth = self._background_depth(X)
        mask = jnp.zeros(depth.shape, jnp.int32)
        for inside, z, oid in self._object_layers(k, X):
            occludes = inside & (z < depth)
            depth = jnp.where(occludes, z, depth)
            mask = jnp.where(occludes, oid, mask)
        return depth, mask

    def rgb(self, k: int):
        """Procedural texture with corners everywhere (for detection)."""
        intr = self.intr
        H, W = intr.height, intr.width
        u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
        v = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
        g = (
            jnp.sin(u * 0.7) * jnp.sin(v * 0.9)
            + 0.5 * jnp.sin(u * 0.23 + v * 0.31)
        )
        g = (g - g.min()) / (g.max() - g.min())
        return jnp.stack([g, g, g], axis=-1)

    def flow(self, k: int):
        """Dense flow k-1 -> k on frame k-1 pixels (zeros for k = 0)."""
        intr = self.intr
        if k == 0:
            return jnp.zeros((intr.height, intr.width, 2), jnp.float32)
        X_prev = self.scn.X_gt[k - 1]
        X_k = self.scn.X_gt[k]
        depth_prev, mask_prev = self.depth_mask(k - 1)
        H, W = depth_prev.shape
        u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
        v = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
        uv = jnp.stack([u, v], axis=-1)
        pts_cam = cam.backproject(uv, depth_prev, intr)
        pts_w = lie.transform_points(X_prev, pts_cam)
        # move object pixels by their GT world motion H_{j,k}
        pts_w_moved = pts_w
        for j, oid in enumerate(self.scn.object_ids):
            Hm = self.scn.H_gt[j][k]
            moved = lie.transform_points(Hm, pts_w)
            pts_w_moved = jnp.where(
                (mask_prev == oid)[..., None], moved, pts_w_moved
            )
        pts_cam_k = lie.transform_points(lie.inverse(X_k), pts_w_moved)
        uv_k = cam.project(pts_cam_k, intr)
        return uv_k - uv

    def frame(self, k: int) -> FrameInputs:
        depth, mask = self.depth_mask(k)
        return FrameInputs(
            frame_id=jnp.array(k, jnp.int32),
            rgb=self.rgb(k),
            depth=depth,
            flow=self.flow(k),
            mask=mask,
        )

    def frames(self) -> List[FrameInputs]:
        return [self.frame(k) for k in range(self.scn.spec.num_frames)]


def default_dense_scenario(
    num_frames=10, width=160, height=120, fov_scale=0.5
) -> DenseScenario:
    """A small dense scene for tests: camera driving forward, two objects."""
    import numpy as np

    intr = cam.CameraIntrinsics.create(
        fx=width * fov_scale,
        fy=width * fov_scale,
        cx=width / 2,
        cy=height / 2,
        width=width,
        height=height,
    )
    spec = ScenarioSpec(
        num_frames=num_frames,
        num_static=0,  # dense renderer supplies the background
        camera_motion_xi=np.array([0.0, 0.004, 0.0, 0.0, 0.0, 0.25]),
        objects=[
            # keep objects inside the (low-res) frustum, moving mostly forward
            ObjectSpec(
                object_id=1,
                initial_pose_xi=np.array([0.0, 0.0, 0.0, -2.5, 0.2, 10.0]),
                motion_xi=np.array([0.0, 0.01, 0.0, 0.3, 0.0, 0.05]),
                num_points=0,
            ),
            ObjectSpec(
                object_id=2,
                initial_pose_xi=np.array([0.0, 0.0, 0.0, 3.0, 0.0, 14.0]),
                motion_xi=np.array([0.0, -0.008, 0.0, -0.25, 0.0, 0.1]),
                num_points=0,
            ),
        ],
    )
    return DenseScenario(spec, intr)
