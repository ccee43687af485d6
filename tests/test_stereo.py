"""Stereo rig: rectification geometry, undistort-rectify maps (validated
against OpenCV), and sparse stereo KLT depth."""

import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.cv import stereo
from dynosam_tpu.cv.stereo import MonoCalibration, StereoCamera


def _rig(rot=(0.004, -0.01, 0.002), t=(0.12, 0.003, -0.001), dist=True):
    d = np.array([-0.28, 0.07, 1e-4, -2e-4]) if dist else None
    left = MonoCalibration.create(458.0, 457.0, 367.0, 248.0, 752, 480, dist=d)
    right = MonoCalibration.create(
        455.0, 456.0, 379.0, 255.0, 752, 480,
        dist=np.array([-0.28, 0.07, -1e-4, 2e-4]) if dist else None,
    )
    T = np.eye(4)
    T[:3, :3] = stereo._rodrigues(np.asarray(rot))
    T[:3, 3] = t
    return left, right, T


class TestRectifyGeometry:
    def test_rectified_frames_aligned(self):
        left, right, T = _rig()
        p = stereo.stereo_rectify(left, right, T)
        R_lr = T[:3, :3]
        # identical rectified orientations: R2 R_lr^T R1^T = I
        M = p["R2"] @ R_lr.T @ p["R1"].T
        assert np.allclose(M, np.eye(3), atol=1e-10)

    def test_baseline_along_x(self):
        left, right, T = _rig()
        p = stereo.stereo_rectify(left, right, T)
        t_rl = -T[:3, :3].T @ T[:3, 3]
        t_rect = p["R2"] @ t_rl                 # left origin in rectified-right
        b = np.linalg.norm(T[:3, 3])
        assert np.allclose(t_rect, [-b, 0, 0], atol=1e-12)
        assert p["baseline"] == pytest.approx(b)

    def test_epipolar_rows_align(self):
        """Projecting any 3D point into both rectified cameras gives the
        same v coordinate and disparity = fx*b/z."""
        left, right, T = _rig()
        p = stereo.stereo_rectify(left, right, T)
        rng = np.random.default_rng(0)
        pts_left = rng.uniform([-3, -2, 4], [3, 2, 30], (50, 3))
        R_rl, t_rl = T[:3, :3].T, -T[:3, :3].T @ T[:3, 3]
        pts_right = pts_left @ R_rl.T + t_rl
        q1 = pts_left @ p["R1"].T
        q2 = pts_right @ p["R2"].T
        v1 = p["fy"] * q1[:, 1] / q1[:, 2] + p["cy"]
        v2 = p["fy"] * q2[:, 1] / q2[:, 2] + p["cy"]
        assert np.max(np.abs(v1 - v2)) < 1e-9
        u1 = p["fx"] * q1[:, 0] / q1[:, 2] + p["cx"]
        u2 = p["fx"] * q2[:, 0] / q2[:, 2] + p["cx"]
        disp = u1 - u2
        z = q1[:, 2]
        assert np.allclose(disp, p["fx"] * p["baseline"] / z, rtol=1e-9)


class TestUndistortMapVsOpenCV:
    def test_matches_initUndistortRectifyMap(self):
        import cv2

        left, right, T = _rig()
        p = stereo.stereo_rectify(left, right, T)
        newK = np.array(
            [[p["fx"], 0, p["cx"]], [0, p["fy"], p["cy"]], [0, 0, 1]]
        )
        ours = stereo.undistort_rectify_map(
            left, p["R1"], p["fx"], p["fy"], p["cx"], p["cy"]
        )
        mu, mv = cv2.initUndistortRectifyMap(
            left.K, left.dist, p["R1"], newK,
            (left.width, left.height), cv2.CV_32FC1,
        )
        assert np.max(np.abs(ours[..., 0] - mu)) < 1e-2
        assert np.max(np.abs(ours[..., 1] - mv)) < 1e-2


class TestStereoTrack:
    def test_constant_disparity_depth(self):
        rng = np.random.default_rng(1)
        H, W = 96, 160
        # ~8 px texture scale: a 7 px disparity stays inside the coarse
        # pyramid level's convergence basin (4 px-periodic texture aliases)
        base = rng.random((H // 8, W // 8)).astype(np.float32)
        import jax

        left = jax.image.resize(jnp.asarray(base), (H, W), "bicubic")
        disp_gt = 7.0
        right = jnp.roll(left, -int(disp_gt), axis=1)   # shift left by 7 px
        uv = jnp.asarray(
            np.stack(
                np.meshgrid(np.linspace(20, W - 20, 8), np.linspace(10, H - 10, 6)),
                axis=-1,
            ).reshape(-1, 2),
            jnp.float32,
        )
        valid = jnp.ones((uv.shape[0],), bool)
        fx, b = 400.0, 0.5
        depth, uv_r, ok = stereo.stereo_track(
            left, right, uv, valid, fx, b, levels=3, iters=12, min_eig=1e-6
        )
        ok = np.asarray(ok)
        assert ok.sum() >= 0.8 * ok.size
        z_gt = fx * b / disp_gt
        assert np.allclose(np.asarray(depth)[ok], z_gt, rtol=0.02)

    def test_epipolar_gate(self):
        """A vertical shift violates the rectified-epipolar assumption and
        must be rejected."""
        rng = np.random.default_rng(2)
        H, W = 96, 160
        import jax

        base = rng.random((H // 4, W // 4)).astype(np.float32)
        left = jax.image.resize(jnp.asarray(base), (H, W), "bicubic")
        right = jnp.roll(jnp.roll(left, -6, axis=1), 4, axis=0)  # dv = 4 px
        uv = jnp.asarray([[50.0, 40.0], [80.0, 50.0], [110.0, 60.0]], jnp.float32)
        valid = jnp.ones((3,), bool)
        _, _, ok = stereo.stereo_track(
            left, right, uv, valid, 400.0, 0.5, levels=2, iters=12, min_eig=1e-6,
            epipolar_tolerance=1.0,
        )
        assert not np.any(np.asarray(ok))


class TestStereoCameraEndToEnd:
    def test_rectified_pair_aligns_rows(self):
        """Render a textured plane into both distorted cameras, rectify, and
        check the images row-align: for sample points, the rectified left and
        right intensities match at the predicted disparity."""
        import jax

        left, right, T = _rig()
        rig = StereoCamera(left, right, T)
        intr = rig.intrinsics()

        # world texture on the plane z = 8 (left-camera frame)
        z0 = 8.0

        def tex(x, y):
            return (
                0.5
                + 0.25 * np.sin(2.2 * x) * np.sin(1.9 * y)
                + 0.2 * np.sin(5.1 * x + 3.3 * y)
            )

        def render(calib, T_cam_left):
            H, W = calib.height, calib.width
            u, v = np.meshgrid(np.arange(W, dtype=float), np.arange(H, dtype=float))
            x = (u - calib.K[0, 2]) / calib.K[0, 0]
            y = (v - calib.K[1, 2]) / calib.K[1, 1]
            # invert the distortion numerically (few fixed-point iterations)
            xu, yu = x.copy(), y.copy()
            for _ in range(20):
                xd, yd = stereo._distort_normalized(xu, yu, calib.dist, calib.model)
                xu += x - xd
                yu += y - yd
            ray = np.stack([xu, yu, np.ones_like(xu)], -1)
            R, t = T_cam_left[:3, :3], T_cam_left[:3, 3]
            d_l = ray @ R.T                      # ray in left frame
            o_l = t
            lam = (z0 - o_l[2]) / d_l[..., 2]
            px = o_l[0] + lam * d_l[..., 0]
            py = o_l[1] + lam * d_l[..., 1]
            return jnp.asarray(tex(px, py), jnp.float32)

        img_l = render(left, np.eye(4))
        img_r = render(right, T)                # T = pose of right in left
        rl, rr = rig.rectify(img_l, img_r)

        # expected disparity at depth z0 (rectified frame ~ left frame depth)
        rng = np.random.default_rng(3)
        us = rng.uniform(150, 550, 40)
        vs = rng.uniform(120, 360, 40)
        rln, rrn = np.asarray(rl), np.asarray(rr)
        errs = []
        for u, v in zip(us, vs):
            # rectified-left pixel -> 3D -> disparity
            q = np.array([(u - rig.cx) / rig.fx, (v - rig.cy) / rig.fy, 1.0])
            p_l = np.linalg.solve(np.asarray(rig.R1), q)  # left-frame ray
            lam = z0 / p_l[2]
            z_rect = (rig.R1 @ (lam * p_l))[2]
            disp = rig.fx * rig.baseline / z_rect
            iv, iu = int(round(v)), int(round(u))
            iur = int(round(u - disp))
            errs.append(abs(float(rln[iv, iu]) - float(rrn[iv, iur])))
        # intensity agreement at integer-rounded disparity: sub-1% of range
        # for most samples (rounding gives a few larger ones)
        assert np.median(errs) < 0.02
