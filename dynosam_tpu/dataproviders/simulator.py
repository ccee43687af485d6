"""Kinematic scenario simulator — the framework's primary zero-data test asset.

Reimplements the role of the reference's test simulator
(/root/reference/dynosam/test/internal/simulator.hpp:49-296: ScenarioBody,
ConstantMotionBodyVisitor, point generators) TPU-style: ground-truth camera
trajectory + rigid constant-motion objects + landmark clouds are generated as
batched arrays, and per-frame measurements are synthesized by projection with
optional pixel/depth noise. Feeds `VisionPacket`s directly into backend
modules (bypassing the frontend) or renders dense depth/flow/mask images to
exercise the frontend tracker.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.cv import camera as cam
from dynosam_tpu.frontend.types import GroundTruthFrame, TrackTable, VisionPacket
from dynosam_tpu.utils import lie


@dataclass
class ObjectSpec:
    object_id: int
    # initial pose of the object body frame in world
    initial_pose_xi: np.ndarray          # (6,) se(3)
    # constant body-frame motion per frame: L_{k} = L_{k-1} * exp(motion_xi)
    motion_xi: np.ndarray                # (6,)
    num_points: int = 64
    extent: float = 1.5                  # half-size of the point cloud box


@dataclass
class ScenarioSpec:
    num_frames: int = 20
    num_static: int = 256
    # camera trajectory: per-frame twist. Either a (6,) constant twist or a
    # (num_frames-1, 6) array of per-interval twists (varying motion — needed
    # to exercise IMU value: constant twists are exactly predicted by the
    # constant-velocity fallback, so IMU adds nothing there)
    camera_motion_xi: np.ndarray = field(
        default_factory=lambda: np.array([0.0, 0.01, 0.0, 0.0, 0.0, 0.4])
    )
    frame_dt: float = 0.1                # seconds between frames (IMU timing)
    static_extent: float = 25.0
    static_depth_range: tuple = (4.0, 40.0)
    objects: List[ObjectSpec] = field(default_factory=list)
    pixel_noise_sigma: float = 0.0
    depth_noise_sigma: float = 0.0
    seed: int = 0

    @staticmethod
    def default_two_objects(num_frames=20, pixel_noise=0.0, depth_noise=0.0, seed=0):
        return ScenarioSpec(
            num_frames=num_frames,
            pixel_noise_sigma=pixel_noise,
            depth_noise_sigma=depth_noise,
            seed=seed,
            objects=[
                ObjectSpec(
                    object_id=1,
                    initial_pose_xi=np.array([0.0, 0.0, 0.3, -4.0, 0.5, 12.0]),
                    motion_xi=np.array([0.0, 0.03, 0.0, 0.45, 0.0, 0.02]),
                    num_points=48,
                ),
                ObjectSpec(
                    object_id=2,
                    initial_pose_xi=np.array([0.0, 0.0, -0.2, 5.0, -0.5, 18.0]),
                    motion_xi=np.array([0.0, -0.02, 0.01, -0.35, 0.0, -0.1]),
                    num_points=48,
                ),
            ],
        )


class Scenario:
    """Generates GT trajectories and per-frame `VisionPacket` measurements."""

    def __init__(self, spec: ScenarioSpec, intr: Optional[cam.CameraIntrinsics] = None):
        self.spec = spec
        self.intr = intr or cam.CameraIntrinsics.create(
            500.0, 500.0, 320.0, 240.0, width=640, height=480
        )
        key = jax.random.PRNGKey(spec.seed)
        k_static, k_obj, self._noise_key = jax.random.split(key, 3)

        # --- ground-truth camera trajectory ---------------------------------
        xi = np.asarray(spec.camera_motion_xi, np.float32)
        if xi.ndim == 1:
            xi = np.tile(xi[None, :], (max(spec.num_frames - 1, 1), 1))
        self.camera_twists = jnp.asarray(xi)              # (K-1, 6)
        poses = [lie.identity()]
        for k in range(spec.num_frames - 1):
            poses.append(lie.compose(poses[-1], lie.se3_exp(self.camera_twists[k])))
        self.X_gt = jnp.stack(poses)                      # (K, 4, 4)

        # --- static landmarks -----------------------------------------------
        u = jax.random.uniform(k_static, (spec.num_static, 3))
        zmin, zmax = spec.static_depth_range
        self.static_points = jnp.stack(
            [
                (u[:, 0] - 0.5) * 2 * spec.static_extent,
                (u[:, 1] - 0.5) * 2 * spec.static_extent * 0.3,
                zmin + u[:, 2] * (zmax - zmin),
            ],
            axis=-1,
        )  # world frame, roughly in front of the initial camera

        # --- objects ----------------------------------------------------------
        self.object_ids = [o.object_id for o in spec.objects]
        self.object_points_body = []     # list of (P, 3) in body frame
        self.L_gt = []                   # list of (K, 4, 4) body pose in world
        self.H_gt = []                   # list of (K, 4, 4) world-frame motion, id at k=0
        for i, o in enumerate(spec.objects):
            ko = jax.random.fold_in(k_obj, i)
            pts = (jax.random.uniform(ko, (o.num_points, 3)) - 0.5) * 2 * o.extent
            self.object_points_body.append(pts)
            L0 = lie.se3_exp(jnp.asarray(o.initial_pose_xi, jnp.float32))
            dL = lie.se3_exp(jnp.asarray(o.motion_xi, jnp.float32))
            Ls = [L0]
            for _ in range(spec.num_frames - 1):
                Ls.append(lie.compose(Ls[-1], dL))
            Ls = jnp.stack(Ls)
            self.L_gt.append(Ls)
            # world-frame motion H_k s.t. m_k^w = H_k m_{k-1}^w:
            #   m_k^w = L_k p_body, m_{k-1}^w = L_{k-1} p_body
            #   => H_k = L_k L_{k-1}^{-1}
            H = jnp.concatenate(
                [lie.identity((1,)), lie.compose(Ls[1:], lie.inverse(Ls[:-1]))], axis=0
            )
            self.H_gt.append(H)

        # world-frame point trajectories per object: (K, P, 3)
        self.object_points_world = [
            lie.transform_points(Ls[:, None, :, :], pts[None, :, :])
            for Ls, pts in zip(self.L_gt, self.object_points_body)
        ]

    # ------------------------------------------------------------------
    def num_dynamic_points(self) -> int:
        return sum(o.num_points for o in self.spec.objects)

    # --- synthetic IMU ----------------------------------------------------
    def camera_velocity(self, k: int):
        """World-frame linear velocity during interval (k, k+1] at its start
        (piecewise-constant-twist trajectories have constant BODY velocity
        within an interval: v_w(t) = R(t) v_b)."""
        kk = min(k, self.camera_twists.shape[0] - 1)
        v_b = self.camera_twists[kk, 3:] / self.spec.frame_dt
        return lie.rotate_points(lie.rotation(self.X_gt[k]), v_b)

    def imu_window(self, k: int, n_samples: int = 32, gravity=(0.0, 9.81, 0.0)):
        """Exact IMU measurements over the interval (k-1, k].

        Within an interval the trajectory is a constant body twist, so
        gyro = w_b (constant) and the specific force at local time t is
        f(t) = w_b x v_b - R(t)^T g with R(t) = R_{k-1} exp(hat(w_b) t).
        Returns ((S, 7) rows [dt ax ay az gx gy gz], (S,) mask) — the
        contract of FrameInputs.imu_samples. k=0 returns an all-invalid
        window (no preceding interval).
        """
        S = n_samples
        if k <= 0:
            return (
                jnp.zeros((S, 7), jnp.float32),
                jnp.zeros((S,), bool),
            )
        dt_f = self.spec.frame_dt
        xi = self.camera_twists[k - 1]
        w_b = xi[:3] / dt_f
        v_b = xi[3:] / dt_f
        g = jnp.asarray(gravity, jnp.float32)
        R_prev = lie.rotation(self.X_gt[k - 1])
        dt_s = dt_f / S
        t_mid = (jnp.arange(S, dtype=jnp.float32) + 0.5) * dt_s
        R_t = jax.vmap(lambda t: lie.mm(R_prev, lie.so3_exp(w_b * t)))(t_mid)
        a_centripetal = jnp.cross(w_b, v_b)               # body frame, constant
        f = a_centripetal[None, :] - lie.einsum("sba,b->sa", R_t, g)
        rows = jnp.concatenate(
            [
                jnp.full((S, 1), dt_s, jnp.float32),
                f,
                jnp.broadcast_to(w_b, (S, 3)),
            ],
            axis=-1,
        )
        return rows, jnp.ones((S,), bool)

    def ground_truth(self, k: int, max_objects: int = 16) -> GroundTruthFrame:
        J = len(self.object_ids)
        ids = jnp.full((max_objects,), -1, jnp.int32)
        poses = jnp.broadcast_to(jnp.eye(4), (max_objects, 4, 4))
        motions = jnp.broadcast_to(jnp.eye(4), (max_objects, 4, 4))
        if J:
            ids = ids.at[:J].set(jnp.asarray(self.object_ids, jnp.int32))
            poses = poses.at[:J].set(jnp.stack([L[k] for L in self.L_gt]))
            motions = motions.at[:J].set(jnp.stack([H[k] for H in self.H_gt]))
        return GroundTruthFrame(
            X_world_cam=self.X_gt[k],
            object_ids=ids,
            object_poses=poses,
            object_motions=motions,
            object_valid=jnp.arange(max_objects) < J,
        )

    # ------------------------------------------------------------------
    def measurements(self, k: int, max_objects: int = 16) -> VisionPacket:
        """Noisy projected measurements for frame k, as a VisionPacket.

        Camera pose / odometry / object motions in the packet are the GT
        values perturbed by measurement noise only through the tracks —
        i.e. this emulates a perfect frontend (used for backend unit tests,
        mirroring the reference's backend_runners.hpp harness).
        """
        spec = self.spec
        X = self.X_gt[k]
        X_inv = lie.inverse(X)
        key = jax.random.fold_in(self._noise_key, k)
        k_px, k_d = jax.random.split(key)

        def observe(points_w, base_noise_key):
            pc = lie.transform_points(X_inv, points_w)   # camera frame
            uv = cam.project(pc, self.intr)
            if spec.pixel_noise_sigma > 0:
                uv = uv + spec.pixel_noise_sigma * jax.random.normal(
                    jax.random.fold_in(k_px, base_noise_key), uv.shape
                )
            depth = pc[..., 2]
            if spec.depth_noise_sigma > 0:
                depth = depth + spec.depth_noise_sigma * jax.random.normal(
                    jax.random.fold_in(k_d, base_noise_key), depth.shape
                )
            visible = (pc[..., 2] > 0.3) & cam.in_image(uv, self.intr)
            return uv, depth, visible

        # static
        uv_s, d_s, vis_s = observe(self.static_points, 0)
        n_s = spec.num_static
        static = TrackTable(
            uv=uv_s,
            depth=d_s,
            tracklet_id=jnp.arange(n_s, dtype=jnp.int32),
            object_id=jnp.zeros((n_s,), jnp.int32),
            age=jnp.full((n_s,), k, jnp.int32),
            valid=vis_s,
        )

        # dynamic: concatenate objects, tracklet ids offset by 10_000 + block
        uv_list, d_list, vis_list, tid_list, oid_list = [], [], [], [], []
        offset = 10_000
        for j, (oid, pts_w) in enumerate(zip(self.object_ids, self.object_points_world)):
            uv_o, d_o, vis_o = observe(pts_w[k], j + 1)
            p = pts_w.shape[1]
            uv_list.append(uv_o)
            d_list.append(d_o)
            vis_list.append(vis_o)
            tid_list.append(jnp.arange(p, dtype=jnp.int32) + offset)
            oid_list.append(jnp.full((p,), oid, jnp.int32))
            offset += p
        if uv_list:
            dynamic = TrackTable(
                uv=jnp.concatenate(uv_list),
                depth=jnp.concatenate(d_list),
                tracklet_id=jnp.concatenate(tid_list),
                object_id=jnp.concatenate(oid_list),
                age=jnp.full((self.num_dynamic_points(),), k, jnp.int32),
                valid=jnp.concatenate(vis_list),
            )
        else:
            dynamic = TrackTable.empty(1)

        J = len(self.object_ids)
        obj_ids = jnp.full((max_objects,), -1, jnp.int32)
        motions = jnp.broadcast_to(jnp.eye(4), (max_objects, 4, 4))
        if J:
            obj_ids = obj_ids.at[:J].set(jnp.asarray(self.object_ids, jnp.int32))
            motions = motions.at[:J].set(jnp.stack([H[k] for H in self.H_gt]))

        odom = (
            lie.compose(lie.inverse(self.X_gt[k - 1]), X) if k > 0 else lie.identity()
        )
        return VisionPacket(
            frame_id=jnp.array(k, jnp.int32),
            X_world_cam=X,
            odom_prev_curr=odom,
            static_tracks=static,
            dynamic_tracks=dynamic,
            object_ids=obj_ids,
            object_motions=motions,
            object_valid=(jnp.arange(max_objects) < J) & (k > 0),
            object_resampled=jnp.zeros((max_objects,), bool),
            pose_valid=jnp.array(True),
        )

    def packets(self, max_objects: int = 16) -> List[VisionPacket]:
        return [self.measurements(k, max_objects) for k in range(self.spec.num_frames)]
