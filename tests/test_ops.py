"""Tests for geometry ops: sampling, Kabsch, RANSAC, GN refinement."""

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.cv import camera
from dynosam_tpu.ops import gauss_newton, interp, kabsch, ransac
from dynosam_tpu.utils import lie

KEY = jax.random.PRNGKey(42)


def make_scene(key, n=100):
    kp, kt = jax.random.split(key)
    p = jax.random.normal(kp, (n, 3)) * 2.0
    T = lie.se3_exp(jnp.array([0.1, -0.2, 0.3, 0.5, -1.0, 0.25]))
    q = lie.transform_points(T, p)
    return p, q, T


class TestInterp:
    def test_bilinear_matches_grid(self):
        img = jnp.arange(20.0).reshape(4, 5)
        uv = jnp.array([[1.0, 2.0], [2.5, 1.5]])
        out = interp.sample_bilinear(img, uv)
        # at integer coords -> exact pixel
        np.testing.assert_allclose(out[0], img[2, 1], atol=1e-6)
        # halfway between 4 pixels -> mean
        expected = (img[1, 2] + img[1, 3] + img[2, 2] + img[2, 3]) / 4.0
        np.testing.assert_allclose(out[1], expected, atol=1e-6)

    def test_multichannel_and_nearest(self):
        img = jax.random.normal(KEY, (8, 8, 2))
        uv = jnp.array([[3.0, 4.0]])
        np.testing.assert_allclose(interp.sample_bilinear(img, uv)[0], img[4, 3], atol=1e-6)
        np.testing.assert_allclose(interp.sample_nearest(img, uv)[0], img[4, 3], atol=1e-6)

    def test_clipping(self):
        img = jnp.ones((4, 4))
        out = interp.sample_bilinear(img, jnp.array([[-5.0, 10.0]]))
        assert np.isfinite(np.array(out)).all()


class TestKabsch:
    def test_exact_recovery(self):
        p, q, T = make_scene(KEY)
        T_est = kabsch.solve_rigid(p, q)
        np.testing.assert_allclose(T_est, T, atol=1e-5)

    def test_weighted_ignores_outliers(self):
        p, q, T = make_scene(KEY)
        q_bad = q.at[:10].add(5.0)
        w = jnp.ones(100).at[:10].set(0.0)
        T_est = kabsch.solve_rigid(p, q_bad, w)
        np.testing.assert_allclose(T_est, T, atol=1e-5)

    def test_batched(self):
        p, q, T = make_scene(KEY)
        pb = jnp.stack([p, p])
        qb = jnp.stack([q, lie.transform_points(lie.inverse(T), p)])
        Tb = kabsch.solve_rigid(pb, qb)
        np.testing.assert_allclose(Tb[0], T, atol=1e-5)
        np.testing.assert_allclose(Tb[1], lie.inverse(T), atol=1e-5)

    def test_degenerate_no_nan(self):
        p = jnp.zeros((5, 3))
        T_est = kabsch.solve_rigid(p, p, jnp.zeros(5))
        assert np.isfinite(np.array(T_est)).all()


class TestRansac:
    def test_rigid_with_outliers(self):
        p, q, T = make_scene(KEY, n=128)
        # corrupt 30% correspondences
        noise_key, sample_key = jax.random.split(jax.random.PRNGKey(7))
        q = q.at[:38].add(jax.random.normal(noise_key, (38, 3)) * 3.0 + 1.0)
        valid = jnp.ones(128, dtype=bool)
        data = {"p": p, "q": q}

        res = ransac.ransac(
            sample_key,
            solve_fn=lambda s: kabsch.solve_rigid(s["p"], s["q"]),
            residual_fn=lambda m, d: kabsch.alignment_error(m, d["p"], d["q"]),
            data=data,
            valid=valid,
            num_hypotheses=128,
            sample_size=3,
            threshold=0.05,
            min_inliers=10,
            refit_fn=lambda d, w, m: kabsch.solve_rigid(d["p"], d["q"], w),
        )
        assert bool(res.valid)
        assert int(res.num_inliers) >= 85
        np.testing.assert_allclose(res.model, T, atol=1e-3)
        # corrupted entries must be outliers
        assert not bool(jnp.any(res.inliers[:38]))

    def test_respects_valid_mask(self):
        p, q, T = make_scene(KEY, n=64)
        # only first 32 valid; rest are garbage
        q = q.at[32:].set(999.0)
        valid = jnp.arange(64) < 32
        res = ransac.ransac(
            jax.random.PRNGKey(3),
            solve_fn=lambda s: kabsch.solve_rigid(s["p"], s["q"]),
            residual_fn=lambda m, d: kabsch.alignment_error(m, d["p"], d["q"]),
            data={"p": p, "q": q},
            valid=valid,
            num_hypotheses=64,
            sample_size=3,
            threshold=0.05,
            min_inliers=5,
        )
        assert bool(res.valid)
        assert int(res.num_inliers) == 32


class TestGaussNewton:
    def test_pose_refinement_reprojection(self):
        intr = camera.CameraIntrinsics.create(500.0, 500.0, 320.0, 240.0, 640, 480)
        key_p, key_n = jax.random.split(KEY)
        pts_w = jax.random.normal(key_p, (60, 3)) * jnp.array([2.0, 1.0, 1.0]) + jnp.array([0.0, 0.0, 8.0])
        T_wc = lie.se3_exp(jnp.array([0.05, -0.02, 0.1, 0.3, -0.1, 0.2]))  # camera pose in world
        uv_obs = camera.project(lie.transform_points(lie.inverse(T_wc), pts_w), intr)

        T0 = lie.retract(T_wc, jnp.array([0.02, 0.01, -0.03, 0.1, -0.05, 0.08]))

        def residual_fn(T):
            pc = lie.transform_points(lie.inverse(T), pts_w)
            return camera.project(pc, intr) - uv_obs

        T_ref, _ = gauss_newton.refine_pose(
            residual_fn, T0, jnp.ones(60), iterations=10
        )
        np.testing.assert_allclose(T_ref, T_wc, atol=1e-4)

    def test_huber_downweights_outliers(self):
        intr = camera.CameraIntrinsics.create(500.0, 500.0, 320.0, 240.0, 640, 480)
        pts_w = jax.random.normal(KEY, (80, 3)) + jnp.array([0.0, 0.0, 6.0])
        T_wc = lie.se3_exp(jnp.array([0.0, 0.1, 0.0, 0.2, 0.0, -0.1]))
        uv_obs = camera.project(lie.transform_points(lie.inverse(T_wc), pts_w), intr)
        uv_obs = uv_obs.at[:8].add(50.0)  # gross outliers

        def residual_fn(T):
            pc = lie.transform_points(lie.inverse(T), pts_w)
            return camera.project(pc, intr) - uv_obs

        T0 = lie.retract(T_wc, jnp.full(6, 0.02))
        T_ref, w = gauss_newton.refine_pose(
            residual_fn, T0, jnp.ones(80), iterations=15, k_huber=1.0
        )
        err = jnp.linalg.norm(lie.local_coordinates(T_ref, T_wc))
        assert float(err) < 5e-3
        assert float(jnp.max(w[:8])) < 0.2


class TestKabschFastPaths:
    """Triad 3-point solver and Horn quaternion refit vs SVD Kabsch."""

    def test_triad_matches_kabsch_on_congruent_sets(self):
        import numpy as np
        from dynosam_tpu.utils import lie as lie_mod

        rng = np.random.default_rng(3)
        for _ in range(10):
            xi = jnp.asarray(rng.normal(size=6) * 0.5, jnp.float32)
            T_gt = lie_mod.se3_exp(xi)
            p = jnp.asarray(rng.normal(size=(3, 3)) * 2, jnp.float32)
            q = lie_mod.transform_points(T_gt, p)
            T = kabsch.solve_rigid_3pt(p, q)
            np.testing.assert_allclose(np.asarray(T), np.asarray(T_gt), atol=2e-5)

    def test_triad_batched(self):
        import numpy as np
        from dynosam_tpu.utils import lie as lie_mod

        rng = np.random.default_rng(4)
        xi = jnp.asarray(rng.normal(size=(16, 6)) * 0.4, jnp.float32)
        T_gt = lie_mod.se3_exp(xi)
        p = jnp.asarray(rng.normal(size=(16, 3, 3)) * 2, jnp.float32)
        q = lie_mod.transform_points(T_gt[:, None], p)
        T = jax.vmap(kabsch.solve_rigid_3pt)(p, q)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T_gt), atol=5e-5)

    def test_triad_collinear_is_finite(self):
        p = jnp.stack([jnp.zeros(3), jnp.ones(3), 2.0 * jnp.ones(3)])
        T = kabsch.solve_rigid_3pt(p, p + 1.0)
        assert bool(jnp.all(jnp.isfinite(T)))

    def test_quat_matches_svd_kabsch_weighted(self):
        import numpy as np
        from dynosam_tpu.utils import lie as lie_mod

        rng = np.random.default_rng(5)
        xi = jnp.asarray(rng.normal(size=6) * 0.5, jnp.float32)
        T_gt = lie_mod.se3_exp(xi)
        p = jnp.asarray(rng.normal(size=(60, 3)) * 3, jnp.float32)
        noise = jnp.asarray(rng.normal(size=(60, 3)) * 0.01, jnp.float32)
        q = lie_mod.transform_points(T_gt, p) + noise
        w = jnp.asarray(rng.uniform(0.2, 1.0, size=(60,)), jnp.float32)
        T_svd = kabsch.solve_rigid(p, q, w)
        T_horn = kabsch.solve_rigid_quat(p, q, w, iters=30)
        np.testing.assert_allclose(
            np.asarray(T_horn), np.asarray(T_svd), atol=1e-4
        )

    def test_quat_warm_start_few_iters(self):
        import numpy as np
        from dynosam_tpu.utils import lie as lie_mod

        rng = np.random.default_rng(6)
        xi = jnp.asarray(rng.normal(size=6) * 0.5, jnp.float32)
        T_gt = lie_mod.se3_exp(xi)
        p = jnp.asarray(rng.normal(size=(60, 3)) * 3, jnp.float32)
        q = lie_mod.transform_points(T_gt, p)
        # warm start at a slightly-perturbed rotation; few iterations suffice
        R0 = lie_mod.so3_exp(jnp.asarray([0.05, -0.03, 0.02])) @ T_gt[:3, :3]
        T = kabsch.solve_rigid_quat(p, q, R0=R0, iters=12)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T_gt), atol=1e-4)

    def test_rot_quat_roundtrip(self):
        import numpy as np
        from dynosam_tpu.utils import lie as lie_mod
        from dynosam_tpu.ops.kabsch import _quat_to_rot, _rot_to_quat

        rng = np.random.default_rng(7)
        # include near-pi rotations (stress the Shepperd branches)
        for scale in (0.1, 1.0, 3.1):
            w = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
            w = w / jnp.linalg.norm(w, axis=-1, keepdims=True) * scale
            R = lie_mod.so3_exp(w)
            R2 = _quat_to_rot(_rot_to_quat(R))
            np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


class TestLkPatchExtraction:
    """The MXU gather->matmul patch sampler must match the scattered-gather
    reference bilinear sampler exactly (interior samples; same clamping)."""

    def test_mm_patches_match_gather(self):
        from dynosam_tpu.ops import lk

        rng = np.random.default_rng(7)
        img = jnp.asarray(rng.random((48, 64), np.float32))
        uv = jnp.asarray(
            np.stack(
                [rng.uniform(6, 58, 33), rng.uniform(6, 42, 33)], axis=-1
            ).astype(np.float32)
        )
        half = 3
        got = np.asarray(lk._extract_patches_mm(img, uv, half))
        P = 2 * half + 1
        want = np.asarray(
            lk._gather_bilinear(img, lk._patch_coords(uv, half))
        ).reshape(-1, P, P)
        np.testing.assert_allclose(got, want, rtol=0, atol=3e-6)

    def test_mm_patches_clamped_at_border(self):
        from dynosam_tpu.ops import lk

        img = jnp.asarray(np.arange(20 * 24, dtype=np.float32).reshape(20, 24))
        uv = jnp.asarray([[0.5, 0.5], [23.0, 19.0], [-2.0, -2.0]], jnp.float32)
        got = np.asarray(lk._extract_patches_mm(img, uv, 2))
        want = np.asarray(
            lk._gather_bilinear(img, lk._patch_coords(uv, 2))
        ).reshape(-1, 5, 5)
        np.testing.assert_allclose(got, want, rtol=0, atol=3e-6)

    def test_strip_sampler_matches_gather(self):
        """The strip path (aligned row/block gather + local einsums) must
        reproduce _gather_bilinear exactly wherever the window covers the
        (globally clamped) sample positions — interior AND image border."""
        from dynosam_tpu.ops import lk

        rng = np.random.default_rng(13)
        H, W = 48, 160                       # W not a multiple of 128
        img = jnp.asarray(rng.random((H, W), np.float32))
        uv = jnp.asarray(
            np.concatenate(
                [
                    np.stack(
                        [rng.uniform(0, W - 1, 40), rng.uniform(0, H - 1, 40)],
                        axis=-1,
                    ),
                    [[0.2, 0.3], [W - 1.2, H - 1.4], [-3.0, -3.0]],
                ]
            ).astype(np.float32)
        )
        half = 3
        S = 2 * half + 1
        y0 = uv[:, 1] - half
        x0 = uv[:, 0] - half
        strips, r0, c0 = lk._extract_strips(
            img,
            jnp.floor(y0).astype(jnp.int32),
            jnp.floor(x0).astype(jnp.int32),
            S + 1,
        )
        got = np.asarray(lk._sample_strips(strips, r0, c0, y0, x0, S, S, H, W))
        want = np.asarray(
            lk._gather_bilinear(img, lk._patch_coords(uv, half))
        ).reshape(-1, S, S)
        np.testing.assert_allclose(got, want, rtol=0, atol=3e-6)

    def test_strip_window_covers_iteration_drift(self):
        """Sampling at positions displaced from the strip anchor (as LK
        iterations do) stays exact while |drift| <= margin."""
        from dynosam_tpu.ops import lk

        rng = np.random.default_rng(17)
        H, W = 64, 256
        img = jnp.asarray(rng.random((H, W), np.float32))
        uv = jnp.asarray(
            np.stack(
                [rng.uniform(14, W - 14, 25), rng.uniform(14, H - 14, 25)],
                axis=-1,
            ).astype(np.float32)
        )
        half, margin = 3, 6
        S = 2 * half + 1
        strips, r0, c0 = lk._extract_strips(
            img,
            jnp.floor(uv[:, 1] - (half + margin)).astype(jnp.int32),
            jnp.floor(uv[:, 0] - (half + margin)).astype(jnp.int32),
            S + 2 * margin + 1,
        )
        drift = jnp.asarray(
            rng.uniform(-margin, margin, size=(25, 2)).astype(np.float32)
        )
        uvd = uv + drift
        got = np.asarray(
            lk._sample_strips(
                strips, r0, c0, uvd[:, 1] - half, uvd[:, 0] - half, S, S, H, W
            )
        )
        want = np.asarray(
            lk._gather_bilinear(img, lk._patch_coords(uvd, half))
        ).reshape(-1, S, S)
        np.testing.assert_allclose(got, want, rtol=0, atol=3e-6)

    def test_gradient_halo_matches_global_gradients(self):
        """Central diff inside the extracted (pad=1) patch == bilinear
        sampling of the global central-difference gradients (interior)."""
        from dynosam_tpu.ops import lk

        rng = np.random.default_rng(11)
        img = jnp.asarray(rng.random((40, 56), np.float32))
        gx = 0.5 * (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1))
        gy = 0.5 * (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0))
        uv = jnp.asarray(
            np.stack(
                [rng.uniform(8, 48, 17), rng.uniform(8, 32, 17)], axis=-1
            ).astype(np.float32)
        )
        half = 3
        big = lk._extract_patches_mm(img, uv, half, pad=1)
        tx = np.asarray(0.5 * (big[:, 1:-1, 2:] - big[:, 1:-1, :-2]))
        ty = np.asarray(0.5 * (big[:, 2:, 1:-1] - big[:, :-2, 1:-1]))
        pc = lk._patch_coords(uv, half)
        P = 2 * half + 1
        np.testing.assert_allclose(
            tx, np.asarray(lk._gather_bilinear(gx, pc)).reshape(-1, P, P),
            rtol=0, atol=3e-6,
        )
        np.testing.assert_allclose(
            ty, np.asarray(lk._gather_bilinear(gy, pc)).reshape(-1, P, P),
            rtol=0, atol=3e-6,
        )
