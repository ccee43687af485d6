"""SE(3)/SO(3) library tests.

Mirrors the reference's factor-Jacobian-vs-numerical-derivative test pattern
(/root/reference/dynosam/test/test_factors.cc) using jax autodiff and
round-trip identities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.utils import lie

KEY = jax.random.PRNGKey(0)


def random_twists(key, n, scale=1.0):
    xi = jax.random.normal(key, (n, 6)) * scale
    # Keep the rotation part below pi so log o exp is the identity.
    wn = jnp.linalg.norm(xi[:, :3], axis=-1, keepdims=True)
    w = xi[:, :3] * jnp.minimum(wn, 3.0) / jnp.maximum(wn, 1e-9)
    return jnp.concatenate([w, xi[:, 3:]], axis=-1)


class TestSO3:
    def test_exp_is_rotation(self):
        w = jax.random.normal(KEY, (32, 3)) * 2.0
        R = lie.so3_exp(w)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)

    def test_exp_log_roundtrip(self):
        w = jax.random.normal(KEY, (64, 3))
        # log returns the principal value: only valid for |w| < pi.
        norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
        w = w * jnp.minimum(norm, 3.0) / norm
        w_back = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(w_back, w, atol=1e-4)

    def test_log_exp_roundtrip_any_rotation(self):
        w = jax.random.normal(KEY, (64, 3)) * 3.0  # |w| may exceed pi
        R = lie.so3_exp(w)
        R2 = lie.so3_exp(lie.so3_log(R))
        np.testing.assert_allclose(R2, R, atol=1e-4)

    def test_small_angle(self):
        w = jnp.array([[1e-9, -1e-9, 1e-8], [0.0, 0.0, 0.0]])
        R = lie.so3_exp(w)
        np.testing.assert_allclose(R, jnp.broadcast_to(jnp.eye(3), R.shape), atol=1e-6)
        assert not np.any(np.isnan(lie.so3_log(R)))

    def test_near_pi(self):
        axis = jnp.array([0.0, 0.0, 1.0])
        w = axis * (np.pi - 1e-4)
        R = lie.so3_exp(w)
        w_back = lie.so3_log(R)
        np.testing.assert_allclose(w_back, w, atol=1e-3)

    def test_grad_no_nan_at_zero(self):
        g = jax.grad(lambda w: jnp.sum(lie.so3_exp(w)))(jnp.zeros(3))
        assert not np.any(np.isnan(g))

    def test_left_jacobian_identity(self):
        # d/dt exp((w + t*dw)) ~= J_l(w) dw composed on the left
        w = jnp.array([0.3, -0.2, 0.5])
        dw = jnp.array([1e-4, 2e-4, -1e-4])
        lhs = lie.so3_exp(w + dw)
        rhs = lie.so3_exp(lie.so3_left_jacobian(w) @ dw) @ lie.so3_exp(w)
        np.testing.assert_allclose(lhs, rhs, atol=1e-6)

    def test_left_jacobian_inverse(self):
        w = jax.random.normal(KEY, (16, 3))
        J = lie.so3_left_jacobian(w)
        Jinv = lie.so3_left_jacobian_inv(w)
        eye = jnp.broadcast_to(jnp.eye(3), J.shape)
        np.testing.assert_allclose(J @ Jinv, eye, atol=1e-4)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = random_twists(KEY, 64)
        xi_back = lie.se3_log(lie.se3_exp(xi))
        np.testing.assert_allclose(xi_back, xi, atol=1e-4)

    def test_inverse(self):
        T = lie.se3_exp(random_twists(KEY, 16))
        eye = jnp.broadcast_to(jnp.eye(4), T.shape)
        np.testing.assert_allclose(T @ lie.inverse(T), eye, atol=1e-5)

    def test_transform_points(self):
        T = lie.se3_exp(random_twists(KEY, 8))
        pts = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
        out = lie.transform_points(T, pts)
        hom = jnp.concatenate([pts, jnp.ones((8, 1))], axis=-1)
        expected = jnp.einsum("bij,bj->bi", T, hom)[:, :3]
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_retract_local_roundtrip(self):
        T = lie.se3_exp(random_twists(KEY, 8))
        xi = random_twists(jax.random.PRNGKey(2), 8, scale=0.1)
        T2 = lie.retract(T, xi)
        np.testing.assert_allclose(lie.local_coordinates(T, T2), xi, atol=1e-4)

    def test_adjoint(self):
        # Ad(T) xi == log(T exp(xi) T^-1)
        T = lie.se3_exp(random_twists(KEY, 4))
        xi = random_twists(jax.random.PRNGKey(3), 4, scale=0.05)
        lhs = jnp.einsum("bij,bj->bi", lie.adjoint(T), xi)
        rhs = lie.se3_log(T @ lie.se3_exp(xi) @ lie.inverse(T))
        np.testing.assert_allclose(lhs, rhs, atol=1e-4)

    def test_jit_and_vmap(self):
        f = jax.jit(jax.vmap(lie.se3_exp))
        xi = random_twists(KEY, 8)
        np.testing.assert_allclose(f(xi), lie.se3_exp(xi), atol=1e-6)


class TestQuat:
    def test_roundtrip(self):
        R = lie.so3_exp(jax.random.normal(KEY, (32, 3)) * 2.0)
        R2 = lie.quat_to_rot(lie.rot_to_quat(R))
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_identity(self):
        q = lie.rot_to_quat(jnp.eye(3))
        np.testing.assert_allclose(q, jnp.array([0.0, 0.0, 0.0, 1.0]), atol=1e-6)


class TestSE3Jacobians:
    def test_se3_left_jacobian_inv(self):
        # d/dxi log(exp(xi) M) at 0 == Jl^{-1}(log M), at LARGE angles
        for i in range(4):
            m = jax.random.normal(jax.random.fold_in(KEY, i), (6,)) * 0.6
            M = lie.se3_exp(m)
            J_ad = jax.jacfwd(
                lambda xi: lie.se3_log(lie.mm(lie.se3_exp(xi), M))
            )(jnp.zeros(6))
            J_cf = lie.se3_left_jacobian_inv(lie.se3_log(M))
            np.testing.assert_allclose(J_cf, J_ad, atol=2e-4)

    def test_se3_right_jacobian_inv(self):
        m = jax.random.normal(KEY, (6,)) * 0.5
        M = lie.se3_exp(m)
        J_ad = jax.jacfwd(
            lambda xi: lie.se3_log(lie.mm(M, lie.se3_exp(xi)))
        )(jnp.zeros(6))
        J_cf = lie.se3_right_jacobian_inv(lie.se3_log(M))
        np.testing.assert_allclose(J_cf, J_ad, atol=2e-4)

    def test_jacobian_inv_at_identity(self):
        J = lie.se3_left_jacobian_inv(jnp.zeros(6))
        np.testing.assert_allclose(J, jnp.eye(6), atol=1e-6)
