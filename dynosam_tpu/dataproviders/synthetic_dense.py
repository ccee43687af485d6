"""Dense synthetic RGB-D scene renderer for frontend tests & benchmarks.

Extends the kinematic simulator (simulator.py) to *dense* per-frame images
(rgb/depth/flow/mask — the reference's expected pre-processed inputs,
README.md:194-209) with analytically consistent geometry:

  * background: a ground plane (y = h) and a far wall -> exact per-pixel depth;
  * objects: rectangles rigidly attached to the GT object body frames
    (ray-plane intersection), carrying the object id in the instance mask;
  * flow: computed per pixel of frame k-1 by back-projecting its depth,
    applying the GT motion (camera for background, H_j for object pixels),
    and re-projecting into frame k — exactly the dense-flow contract the
    tracker consumes;
  * rgb: a procedural texture so corner detection has structure.

Because depth/flow/mask come from the same rigid 3D model, a correct frontend
recovers the GT camera pose and object motions to solver precision.

The whole per-frame render is ONE jitted function of the frame index —
op-by-op eager rendering is prohibitively slow on remote-compiled TPU paths.
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
        world_texture: bool = False,
        object_texture: bool = False,
        object_half_extents=None,   # optional per-object (ex, ey) overrides
        object_classes=None,        # optional per-object class ids (detector
                                    # training labels + appearance signature)
    ):
        assert intr.width > 0 and intr.height > 0
        self.scn = Scenario(spec, intr)
        self.intr = intr
        self.world_texture = world_texture
        self.object_texture = object_texture
        self.ground_y = ground_y
        self.far_depth = far_depth
        self.obj_e = object_half_extent
        J = len(self.scn.object_ids)
        self.obj_extents = (
            [(float(ex), float(ey)) for ex, ey in object_half_extents]
            if object_half_extents is not None
            else [(object_half_extent, object_half_extent)] * J
        )
        self.object_classes = (
            [int(c) for c in object_classes]
            if object_classes is not None
            else [0] * J
        )
        K = spec.num_frames
        if self.scn.object_ids:
            self._L_all = jnp.stack(self.scn.L_gt)     # (J, K, 4, 4)
            self._H_all = jnp.stack(self.scn.H_gt)     # (J, K, 4, 4)
        else:
            self._L_all = jnp.zeros((0, K, 4, 4))
            self._H_all = jnp.zeros((0, K, 4, 4))
        self._rgb_const = self._make_rgb()
        self._frame_jit = jax.jit(self._render_frame)

    # ------------------------------------------------------------------
    def _pixel_rays(self, X):
        """World-frame ray directions (z-normalised in camera), (H, W, 3)."""
        intr = self.intr
        H, W = intr.height, intr.width
        u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
        v = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
        dx = (u - intr.cx) / intr.fx
        dy = (v - intr.cy) / intr.fy
        R = lie.rotation(X)
        return (
            R[:, 0][None, None, :] * dx[..., None]
            + R[:, 1][None, None, :] * dy[..., None]
            + R[:, 2][None, None, :]
        )

    def _background_depth(self, X, d_world):
        """Ground plane (y_world = ground_y) + world-fixed far wall
        (z_world = far_depth). Both are true world surfaces, so tracked
        background pixels have depth measurements consistent with their flow
        (a constant-camera-depth backdrop would inject scale-collapsing
        contradictions into the backend)."""
        t = lie.translation(X)
        dy = d_world[..., 1]
        lam_ground = (self.ground_y - t[1]) / jnp.where(
            jnp.abs(dy) < 1e-6, 1e-6, dy
        )
        dz = d_world[..., 2]
        lam_wall = (self.far_depth - t[2]) / jnp.where(
            jnp.abs(dz) < 1e-6, 1e-6, dz
        )
        big = 4.0 * self.far_depth
        lam_ground = jnp.where(lam_ground > 0.1, lam_ground, big)
        lam_wall = jnp.where(lam_wall > 0.1, lam_wall, big)
        depth = jnp.minimum(lam_ground, lam_wall)
        return jnp.clip(depth, 0.1, big)

    def _depth_mask(self, X, L_stack):
        """Depth + instance mask at a camera pose with objects at L_stack.

        Objects are rectangles through the body origin with normal = body
        z-axis; ray-plane intersection keeps depth/flow/mask exactly
        consistent with rigid motion (a billboard approximation would not be
        for rotating objects).
        """
        d_world = self._pixel_rays(X)
        t = lie.translation(X)
        depth = self._background_depth(X, d_world)
        mask = jnp.zeros(depth.shape, jnp.int32)
        for j, oid in enumerate(self.scn.object_ids):
            L = L_stack[j]
            RL = lie.rotation(L)
            p0 = lie.translation(L)
            n = RL[:, 2]
            denom = jnp.einsum("hwc,c->hw", d_world, n)
            safe = jnp.where(jnp.abs(denom) < 1e-4, 1e-4, denom)
            lam = jnp.einsum("c,c->", n, p0 - t) / safe
            hit_w = t[None, None, :] + d_world * lam[..., None]
            hit_body = jnp.einsum("ci,hwc->hwi", RL, hit_w - p0[None, None, :])
            ex, ey = self.obj_extents[j]
            inside = (
                (lam > 0.5)
                & (jnp.abs(denom) > 1e-3)
                & (jnp.abs(hit_body[..., 0]) < ex)
                & (jnp.abs(hit_body[..., 1]) < ey)
            )
            occludes = inside & (lam < depth)
            depth = jnp.where(occludes, lam, depth)
            mask = jnp.where(occludes, oid, mask)
        return depth, mask

    def _flow(self, X_prev, X_k, depth_prev, mask_prev, H_stack):
        intr = self.intr
        H, W = depth_prev.shape
        u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
        v = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
        uv = jnp.stack([u, v], axis=-1)
        pts_cam = cam.backproject(uv, depth_prev, intr)
        pts_w = lie.transform_points(X_prev, pts_cam)
        pts_w_moved = pts_w
        for j, oid in enumerate(self.scn.object_ids):
            moved = lie.transform_points(H_stack[j], pts_w)
            pts_w_moved = jnp.where(
                (mask_prev == oid)[..., None], moved, pts_w_moved
            )
        pts_cam_k = lie.transform_points(lie.inverse(X_k), pts_w_moved)
        uv_k = cam.project(pts_cam_k, intr)
        return uv_k - uv

    def _make_rgb(self):
        intr = self.intr
        H, W = intr.height, intr.width
        u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
        v = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
        g = jnp.sin(u * 0.7) * jnp.sin(v * 0.9) + 0.5 * jnp.sin(
            u * 0.23 + v * 0.31
        )
        g = (g - g.min()) / (g.max() - g.min())
        return jnp.stack([g, g, g], axis=-1)

    def _world_rgb(self, X_k, L_stack, depth, mask):
        """Photo-consistent texture: intensity is a fixed procedural function
        of the 3D surface point in its anchor frame (world for background,
        object body frame L for object pixels), so the image actually moves
        with the geometry — required for image-space tracking (KLT) tests.
        The default screen-space texture (`_make_rgb`) cannot exercise
        trackers: it is constant across frames."""
        intr = self.intr
        H, W = depth.shape
        u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
        v = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
        uv = jnp.stack([u, v], axis=-1)
        pts_cam = cam.backproject(uv, depth, intr)
        pts_w = lie.transform_points(X_k, pts_cam)
        anchor = pts_w
        for j, oid in enumerate(self.scn.object_ids):
            p_L = lie.transform_points(lie.inverse(L_stack[j]), pts_w)
            anchor = jnp.where((mask == oid)[..., None], p_L, anchor)
        x, y, z = anchor[..., 0], anchor[..., 1], anchor[..., 2]
        # Band-limited octaves (analytic mip-mapping): each octave's amplitude
        # is attenuated by a Gaussian in (spatial frequency x pixel footprint)
        # so the texture never aliases — an aliased octave decorrelates any
        # pair of views whose sample grids differ by a sub-footprint shift
        # (e.g. a stereo pair at the far wall), which breaks image-space
        # matching in a way no real camera exhibits.
        foot = depth / intr.fx                              # meters per pixel
        def att(freq):
            return jnp.exp(-0.5 * (freq * foot) ** 2)
        g = (
            att(5.5) * jnp.sin(4.1 * x) * jnp.sin(3.7 * y + 0.9 * z)
            + 0.6 * att(12.1) * jnp.sin(9.3 * x + 7.7 * y) * jnp.sin(8.1 * z)
            + 0.5 * att(1.9) * jnp.sin(1.1 * x + 1.3 * y + 0.7 * z)
            + 0.45 * att(0.8) * jnp.sin(0.55 * x + 0.62 * y) * jnp.sin(0.48 * z + 1.1)
        )
        g = jnp.clip(0.5 + 0.24 * g, 0.0, 1.0)
        if self.object_texture:
            # Opt-in appearance cue for the detector-training pipeline
            # (scripts/train_detector.py): objects get a distinct texture
            # signature — a per-object intensity bias + a higher-frequency
            # body-frame check pattern — so "object vs background" is
            # learnable from appearance, as it is on real imagery. Off by
            # default: accuracy/KLT tests rely on the statistically uniform
            # texture (no appearance-driven detection shortcuts).
            for j, oid in enumerate(self.scn.object_ids):
                on = mask == oid
                p_L = lie.transform_points(lie.inverse(L_stack[j]), pts_w)
                cls = self.object_classes[j]
                if cls == 0:
                    # class-0 signature: fine body-frame check pattern
                    chk = 0.20 * jnp.sin(
                        17.0 * p_L[..., 0] + 2.1 * j
                    ) * jnp.sin(15.0 * p_L[..., 1] + 1.3 * j)
                    bias = 0.14
                else:
                    # class-1 signature: coarse horizontal stripes, darker
                    chk = 0.22 * jnp.sin(6.0 * p_L[..., 1] + 0.7 * j)
                    bias = -0.14
                g = jnp.where(on, jnp.clip(g + bias + chk, 0.0, 1.0), g)
        return jnp.stack([g, g, g], axis=-1)

    # ------------------------------------------------------------------
    def _render_frame(self, k):
        """Jitted: frame index (traced int) -> FrameInputs."""
        J = len(self.scn.object_ids)
        k_prev = jnp.maximum(k - 1, 0)
        X_k = self.scn.X_gt[k]
        X_prev = self.scn.X_gt[k_prev]
        if J:
            L_k = self._L_all[:, k]
            L_prev = self._L_all[:, k_prev]
            H_k = self._H_all[:, k]
        else:
            L_k = L_prev = H_k = self._L_all[:, 0]
        depth, mask = self._depth_mask(X_k, L_k)
        depth_prev, mask_prev = self._depth_mask(X_prev, L_prev)
        flow = self._flow(X_prev, X_k, depth_prev, mask_prev, H_k)
        flow = jnp.where(k > 0, flow, jnp.zeros_like(flow))
        rgb = (
            self._world_rgb(X_k, L_k, depth, mask)
            if self.world_texture
            else self._rgb_const
        )
        return FrameInputs(
            frame_id=k.astype(jnp.int32),
            rgb=rgb,
            depth=depth,
            flow=flow,
            mask=mask,
        )

    # public API -----------------------------------------------------------
    def depth_mask(self, k: int):
        L_k = self._L_all[:, k] if len(self.scn.object_ids) else self._L_all[:, 0]
        return self._depth_mask(self.scn.X_gt[k], L_k)

    def frame(self, k: int) -> FrameInputs:
        return self._frame_jit(jnp.asarray(k, jnp.int32))

    def frames(self) -> List[FrameInputs]:
        return [self.frame(k) for k in range(self.scn.spec.num_frames)]


def default_dense_scenario(
    num_frames=10, width=160, height=120, fov_scale=0.5, world_texture=False
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
        baseline=0.54,   # realistic virtual-stereo baseline for noise models
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
    return DenseScenario(spec, intr, world_texture=world_texture)
