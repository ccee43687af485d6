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


def between_jacobians(A, B, Z, r=None):
    """Returns (J_A (...,6,6), J_B (...,6,6)) for right perturbations.

    Closed form: with r = log(Z^{-1} A^{-1} B),
      J_B = Jr^{-1}(r),   J_A = -Jr^{-1}(r) Ad(B^{-1} A)
    using the exact SE(3) inverse right Jacobian (lie.se3_right_jacobian_inv,
    Barfoot eq. 7.86). Verified against jacfwd in tests/test_factors.py.
    Pass `r` if already computed to avoid recomputation.
    """
    if r is None:
        r = between_residual(A, B, Z)
    Jr_inv = lie.se3_right_jacobian_inv(r)
    Ad = lie.adjoint(lie.mm(lie.inverse(B), A))
    return -lie.mm(Jr_inv, Ad), Jr_inv


# ---------------------------------------------------------------------------
# SE(3) prior: r = log(Z^{-1} X)                   (dim 6)
# ---------------------------------------------------------------------------

def prior_residual(X, Z):
    return lie.se3_log(lie.mm(lie.inverse(Z), X))


def prior_jacobian(X, Z, r=None):
    """Closed form: J = Jr^{-1}(r) with r = log(Z^{-1} X)."""
    if r is None:
        r = prior_residual(X, Z)
    return lie.se3_right_jacobian_inv(r)


# ---------------------------------------------------------------------------
# Robust weights
# ---------------------------------------------------------------------------

def huber_weight(r_norm, k):
    safe = jnp.clip(r_norm, 1e-12, None)
    return jnp.where(r_norm <= k, jnp.ones_like(safe), k / safe)
