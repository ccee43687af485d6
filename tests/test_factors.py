"""Factor Jacobians vs autodiff — the reference's numerical-derivative test
pattern (/root/reference/dynosam/test/test_factors.cc) via jax.jacfwd."""

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.backend import factors
from dynosam_tpu.utils import lie

KEY = jax.random.PRNGKey(11)


def rand_pose(key, scale=1.0):
    xi = jax.random.normal(key, (6,)) * scale
    wn = jnp.linalg.norm(xi[:3])
    xi = xi.at[:3].mul(jnp.minimum(wn, 2.5) / jnp.maximum(wn, 1e-9))
    return lie.se3_exp(xi)


def test_pose_to_point_jacobians():
    k1, k2, k3 = jax.random.split(KEY, 3)
    X = rand_pose(k1)
    m = jax.random.normal(k2, (3,)) * 3.0
    z = jax.random.normal(k3, (3,))

    J_pose, J_point = factors.pose_to_point_jacobians(X, m)

    J_pose_ad = jax.jacfwd(
        lambda xi: factors.pose_to_point_residual(lie.retract(X, xi), m, z)
    )(jnp.zeros(6))
    J_point_ad = jax.jacfwd(
        lambda dm: factors.pose_to_point_residual(X, m + dm, z)
    )(jnp.zeros(3))

    np.testing.assert_allclose(J_pose, J_pose_ad, atol=1e-4)
    np.testing.assert_allclose(J_point, J_point_ad, atol=1e-5)


def test_motion_ternary_jacobians():
    k1, k2, k3 = jax.random.split(KEY, 3)
    H = rand_pose(k1, 0.5)
    m_prev = jax.random.normal(k2, (3,)) * 2.0
    m_curr = jax.random.normal(k3, (3,)) * 2.0

    J_prev, J_curr, J_H = factors.motion_ternary_jacobians(m_prev, H)

    f = factors.motion_ternary_residual
    np.testing.assert_allclose(
        J_prev, jax.jacfwd(lambda d: f(m_prev + d, m_curr, H))(jnp.zeros(3)), atol=1e-5
    )
    np.testing.assert_allclose(
        J_curr, jax.jacfwd(lambda d: f(m_prev, m_curr + d, H))(jnp.zeros(3)), atol=1e-5
    )
    np.testing.assert_allclose(
        J_H,
        jax.jacfwd(lambda xi: f(m_prev, m_curr, lie.retract(H, xi)))(jnp.zeros(6)),
        atol=1e-4,
    )


def test_between_jacobians_small_residual():
    # Between-factor Jacobians are used inside the optimizer where residuals
    # are small; validate in that regime.
    k1, k2 = jax.random.split(KEY)
    A = rand_pose(k1)
    dZ = lie.se3_exp(jax.random.normal(k2, (6,)) * 0.05)
    B = lie.compose(A, dZ)
    Z = lie.compose(dZ, lie.se3_exp(jnp.full(6, 0.01)))  # small residual

    J_A, J_B = factors.between_jacobians(A, B, Z)

    f = factors.between_residual
    J_A_ad = jax.jacfwd(lambda xi: f(lie.retract(A, xi), B, Z))(jnp.zeros(6))
    J_B_ad = jax.jacfwd(lambda xi: f(A, lie.retract(B, xi), Z))(jnp.zeros(6))

    np.testing.assert_allclose(J_A, J_A_ad, atol=1e-3)
    np.testing.assert_allclose(J_B, J_B_ad, atol=1e-3)


def test_prior_jacobian():
    X = rand_pose(KEY)
    Z = lie.compose(X, lie.se3_exp(jnp.full(6, 0.02)))
    J = factors.prior_jacobian(X, Z)
    J_ad = jax.jacfwd(lambda xi: factors.prior_residual(lie.retract(X, xi), Z))(
        jnp.zeros(6)
    )
    np.testing.assert_allclose(J, J_ad, atol=1e-3)


def test_batched_shapes():
    X = lie.se3_exp(jax.random.normal(KEY, (5, 6)) * 0.3)
    m = jax.random.normal(KEY, (5, 3))
    J_pose, J_point = factors.pose_to_point_jacobians(X, m)
    assert J_pose.shape == (5, 3, 6)
    assert J_point.shape == (5, 3, 3)
