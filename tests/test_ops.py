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
            refit_fn=lambda d, w: kabsch.solve_rigid(d["p"], d["q"], w),
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
