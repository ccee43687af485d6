"""Factor residuals and closed-form Jacobians for the dynamic-SLAM graph.

Reference parity (reimplemented, not translated):
  * PoseToPointFactor            — camera->point observation (gtsam's
    PoseToPointFactor used in WorldMotionEstimator.cc:151-259)
  * LandmarkMotionTernaryFactor  — /root/reference/dynosam/src/factors/
    LandmarkMotionTernaryFactor.cc (residual of the rigid-motion constraint)
  * BetweenFactor<Pose3>         — odometry (use_vo_factor)
  * LandmarkPoseSmoothingFactor / constant-motion smoothing —
    backend.flags constant_object_motion_*_sigma
  * PriorFactor<Pose3>           — gauge fixing

Conventions (consistent with dynosam_tpu.frontend.types):
  * Poses X are world-from-camera; right-perturbation X <- X exp(xi),
    tangent order [omega, v] (GTSAM order).
  * Motion ternary residual: r = m_k - H * m_{k-1} (world frame). The
    reference evaluates r' = m_{k-1} - H^{-1} m_k, which is -R_H^{-1} r —
    identical weighted least-squares geometry for isotropic noise.
  * All Jacobians are w.r.t. the right-retraction tangent for poses and the
    raw 3-vector for points; verified against jax.jacfwd in
    tests/test_factors.py (the reference's numerical-derivative pattern).

Every function is batched: leading dimensions broadcast.
"""

from __future__ import annotations

import jax.numpy as jnp

from dynosam_tpu.utils import lie


# ---------------------------------------------------------------------------
# Pose-to-point: r = X^{-1} m - z            (dim 3)
# ---------------------------------------------------------------------------

def pose_to_point_residual(X, m, z):
    return lie.transform_points(lie.inverse(X), m) - z


def pose_to_point_jacobians(X, m):
    """Returns (J_pose (...,3,6), J_point (...,3,3)).

    With y = X^{-1} m:  r(xi) = exp(-xi) y - z  =>  dr/domega = hat(y),
    dr/dv = -I;  dr/dm = R^T.
    """
    R = lie.rotation(X)
    Rt = jnp.swapaxes(R, -1, -2)
    y = lie.transform_points(lie.inverse(X), m)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), y.shape + (3,))
    J_pose = jnp.concatenate([lie.hat(y), -eye], axis=-1)
    return J_pose, Rt


# ---------------------------------------------------------------------------
# Landmark motion ternary: r = m_k - H m_{k-1}    (dim 3)
# ---------------------------------------------------------------------------

def motion_ternary_residual(m_prev, m_curr, H):
    return m_curr - lie.transform_points(H, m_prev)


def motion_ternary_jacobians(m_prev, H):
    """Returns (J_prev (...,3,3), J_curr (...,3,3), J_H (...,3,6)).

    r(xi) = m_k - H exp(xi) m_{k-1}:
      d(exp(xi) p)/dxi = [-hat(p) | I]  =>  J_H = -R_H [-hat(p) | I]
                                             = [R_H hat(p) | -R_H].
    """
    R = lie.rotation(H)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=H.dtype), R.shape)
    J_prev = -R
    J_curr = eye
    J_H = jnp.concatenate([lie.mm(R, lie.hat(m_prev)), -R], axis=-1)
    return J_prev, J_curr, J_H


# ---------------------------------------------------------------------------
# SE(3) between: r = log(Z^{-1} A^{-1} B)          (dim 6)
# (odometry between consecutive poses; also motion smoothing between H's)
# ---------------------------------------------------------------------------

def between_residual(A, B, Z):
    return lie.se3_log(lie.mm(lie.inverse(Z), lie.mm(lie.inverse(A), B)))


def between_jacobians(A, B, Z):
    """Returns (J_A (...,6,6), J_B (...,6,6)) for right perturbations.

    Computed with forward-mode autodiff through the retraction. These 6x6
    Jacobians are needed for only O(frames + frames*objects) factors per
    solve (vs thousands of point factors), so exactness beats the closed-form
    Jr^{-1}/adjoint expressions here.
    """
    import jax

    zeros = jnp.zeros(A.shape[:-2] + (6,), dtype=A.dtype)

    def res_A(xi):
        return between_residual(lie.retract(A, xi), B, Z)

    def res_B(xi):
        return between_residual(A, lie.retract(B, xi), Z)

    if A.ndim == 2:
        return jax.jacfwd(res_A)(zeros), jax.jacfwd(res_B)(zeros)
    # batched: vmap the single-instance jacobian
    def one(a, b, z):
        ja = jax.jacfwd(lambda xi: between_residual(lie.retract(a, xi), b, z))(
            jnp.zeros(6, dtype=A.dtype)
        )
        jb = jax.jacfwd(lambda xi: between_residual(a, lie.retract(b, xi), z))(
            jnp.zeros(6, dtype=A.dtype)
        )
        return ja, jb

    import functools

    flat_shape = (-1, 4, 4)
    Af, Bf, Zf = (x.reshape(flat_shape) for x in (A, B, Z))
    ja, jb = jax.vmap(one)(Af, Bf, Zf)
    return (
        ja.reshape(A.shape[:-2] + (6, 6)),
        jb.reshape(A.shape[:-2] + (6, 6)),
    )


# ---------------------------------------------------------------------------
# SE(3) prior: r = log(Z^{-1} X)                   (dim 6)
# ---------------------------------------------------------------------------

def prior_residual(X, Z):
    return lie.se3_log(lie.mm(lie.inverse(Z), X))


def prior_jacobian(X, Z):
    import jax

    if X.ndim == 2:
        return jax.jacfwd(lambda xi: prior_residual(lie.retract(X, xi), Z))(
            jnp.zeros(6, dtype=X.dtype)
        )
    Xf, Zf = X.reshape(-1, 4, 4), Z.reshape(-1, 4, 4)
    J = jax.vmap(
        lambda x, z: jax.jacfwd(
            lambda xi: prior_residual(lie.retract(x, xi), z)
        )(jnp.zeros(6, dtype=X.dtype))
    )(Xf, Zf)
    return J.reshape(X.shape[:-2] + (6, 6))


# ---------------------------------------------------------------------------
# Robust weights
# ---------------------------------------------------------------------------

def huber_weight(r_norm, k):
    safe = jnp.clip(r_norm, 1e-12, None)
    return jnp.where(r_norm <= k, jnp.ones_like(safe), k / safe)
