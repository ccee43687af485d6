"""Batched SE(3)/SO(3) Lie-group library for TPU (JAX).

This replaces the reference's use of gtsam::Pose3 / gtsam::Rot3
(/root/reference/dynosam_common/include/dynosam_common/Types.hpp) with a fully
batched, dtype-agnostic implementation. Poses are canonical ``(..., 4, 4)``
homogeneous matrices so composition is a plain matmul (MXU-friendly); tangent
vectors are ``(..., 6)`` with GTSAM ordering ``[omega, v]`` (rotation first).

All functions are `vmap`/`jit` safe: small-angle branches use Taylor series via
`jnp.where` with operand sanitisation so gradients never see NaN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6

# TPU matmuls default to bfloat16 inputs on the MXU; pose math is tiny (3x3 /
# 4x4) so always request full f32 precision. All geometry modules should use
# these wrappers instead of bare `@` / `jnp.einsum`.
PRECISION = jax.lax.Precision.HIGHEST


def mm(a, b):
    return jnp.matmul(a, b, precision=PRECISION)


def einsum(subscripts, *operands):
    return jnp.einsum(subscripts, *operands, precision=PRECISION)


def _taylor_safe(theta2):
    """Returns (is_small, safe_theta2) for branch-free small-angle handling."""
    is_small = theta2 < _EPS
    safe = jnp.where(is_small, jnp.ones_like(theta2), theta2)
    return is_small, safe


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def hat(w):
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w):
    """Exponential map so(3) -> SO(3) via Rodrigues. (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    is_small, safe_theta2 = _taylor_safe(theta2)
    theta = jnp.sqrt(safe_theta2)

    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks.
    a = jnp.where(is_small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(is_small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_theta2)

    W = hat(w)
    W2 = mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R):
    """Log map SO(3) -> so(3). (..., 3, 3) -> (..., 3).

    Differentiable at the identity (needed: the optimizer autodiffs
    between-factor residuals whose value is ~0). All branches are sanitised
    so the non-selected branch never produces NaN tangents: theta comes from
    atan2 (not arccos, whose derivative blows up at cos=1), and the near-pi
    diagonal branch divides by inputs replaced with 1 outside its mask.
    """
    Rt = jnp.swapaxes(R, -1, -2)
    s = vee(R - Rt) * 0.5                       # sin(theta) * axis
    s2 = jnp.sum(s * s, axis=-1)                # sin^2(theta)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)

    small_sin = s2 < _EPS                       # theta near 0 or pi
    near_pi = small_sin & (cos_theta < 0.0)
    near_zero = small_sin & (cos_theta >= 0.0)

    safe_s2 = jnp.where(small_sin, jnp.ones_like(s2), s2)
    sin_theta = jnp.sqrt(safe_s2)
    theta = jnp.arctan2(sin_theta, cos_theta)

    # Generic + near-zero: w = k * s with k = theta/sin(theta) (Taylor near 0).
    k = jnp.where(near_zero, 1.0 + s2 / 6.0, theta / sin_theta)
    w_generic = s * k[..., None]

    # Near-pi: axis from the diagonal, signs from the skew part.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    denom = jnp.where(near_pi, 1.0 - cos_theta, jnp.ones_like(cos_theta))
    axis_sq = jnp.clip((diag - cos_theta[..., None]) / denom[..., None], 0.0, None)
    axis_sq = jnp.where(near_pi[..., None], axis_sq, jnp.ones_like(axis_sq))
    axis = jnp.sqrt(axis_sq)
    signs = jnp.sign(jnp.where(jnp.abs(s) < 1e-12, jnp.ones_like(s), s))
    axis = axis * signs
    norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis = axis / jnp.clip(norm, 1e-12, None)
    # In the near-pi branch sin_theta above was sanitised to 1, so recover the
    # angle from the true (small) sine: theta = pi - asin(sin).
    sin_small = jnp.sqrt(s2 + 1e-24)
    theta_pi = jnp.pi - jnp.arcsin(jnp.clip(sin_small, 0.0, 1.0))
    w_pi = axis * theta_pi[..., None]

    return jnp.where(near_pi[..., None], w_pi, w_generic)


def so3_left_jacobian(w):
    """Left Jacobian of SO(3): J_l(w). (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    is_small, safe_theta2 = _taylor_safe(theta2)
    theta = jnp.sqrt(safe_theta2)
    W = hat(w)
    W2 = mm(W, W)
    # (1 - cos t)/t^2  and  (t - sin t)/t^3
    b = jnp.where(is_small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_theta2)
    c = jnp.where(
        is_small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (safe_theta2 * theta),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def so3_left_jacobian_inv(w):
    """Inverse left Jacobian of SO(3). (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    is_small, safe_theta2 = _taylor_safe(theta2)
    theta = jnp.sqrt(safe_theta2)
    W = hat(w)
    W2 = mm(W, W)
    half_theta = 0.5 * theta
    sin_half = jnp.sin(half_theta)
    safe_sin_half = jnp.where(is_small, jnp.ones_like(sin_half), sin_half)
    # coefficient of W2: (1/t^2)(1 - (t/2) cot(t/2))
    cot = jnp.where(
        is_small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / safe_sin_half) / safe_theta2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot[..., None, None] * W2


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def make_pose(R, t):
    """Assemble (..., 4, 4) homogeneous pose from (..., 3, 3) R and (..., 3) t."""
    R, t = jnp.asarray(R), jnp.asarray(t)
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def identity(batch_shape=(), dtype=jnp.float32):
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(batch_shape) + (4, 4))


def rotation(T):
    return T[..., :3, :3]


def translation(T):
    return T[..., :3, 3]


def inverse(T):
    """SE(3) inverse via transpose trick (no linear solve)."""
    Rt = jnp.swapaxes(T[..., :3, :3], -1, -2)
    t = T[..., :3, 3]
    return make_pose(Rt, -einsum("...ij,...j->...i", Rt, t))


def compose(A, B):
    return mm(A, B)


def transform_points(T, pts):
    """Apply pose(s) to points. T: (..., 4, 4), pts: (..., 3) -> (..., 3).

    Written as explicit component arithmetic (not einsum): a 3-wide
    contraction lowers to dot_general, which XLA will not fuse into the
    surrounding elementwise chain — in vmapped RANSAC scoring that
    materializes (hyps, N, 3) intermediates in HBM and turns a fusable loop
    into a bandwidth-bound pipeline. Elementwise form fuses end-to-end.
    """
    px, py, pz = pts[..., 0], pts[..., 1], pts[..., 2]
    qx = T[..., 0, 0] * px + T[..., 0, 1] * py + T[..., 0, 2] * pz + T[..., 0, 3]
    qy = T[..., 1, 0] * px + T[..., 1, 1] * py + T[..., 1, 2] * pz + T[..., 1, 3]
    qz = T[..., 2, 0] * px + T[..., 2, 1] * py + T[..., 2, 2] * pz + T[..., 2, 3]
    return jnp.stack([qx, qy, qz], axis=-1)


def rotate_points(R, pts):
    """R: (..., 3, 3), pts: (..., 3) -> (..., 3); elementwise for fusion."""
    px, py, pz = pts[..., 0], pts[..., 1], pts[..., 2]
    qx = R[..., 0, 0] * px + R[..., 0, 1] * py + R[..., 0, 2] * pz
    qy = R[..., 1, 0] * px + R[..., 1, 1] * py + R[..., 1, 2] * pz
    qz = R[..., 2, 0] * px + R[..., 2, 1] * py + R[..., 2, 2] * pz
    return jnp.stack([qx, qy, qz], axis=-1)


def se3_exp(xi):
    """Exponential map se(3) -> SE(3). xi = [omega, v] (..., 6) -> (..., 4, 4)."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    Jl = so3_left_jacobian(w)
    t = einsum("...ij,...j->...i", Jl, v)
    return make_pose(R, t)


def se3_log(T):
    """Log map SE(3) -> se(3). (..., 4, 4) -> (..., 6) as [omega, v]."""
    w = so3_log(T[..., :3, :3])
    Jl_inv = so3_left_jacobian_inv(w)
    v = einsum("...ij,...j->...i", Jl_inv, T[..., :3, 3])
    return jnp.concatenate([w, v], axis=-1)


def _se3_Q(xi):
    """Barfoot's Q(xi) block of the SE(3) left Jacobian (State Estimation for
    Robotics, eq. 7.86). xi = [w, v] (..., 6) -> (..., 3, 3)."""
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    is_small, safe_theta2 = _taylor_safe(theta2)
    theta = jnp.sqrt(safe_theta2)
    s, c = jnp.sin(theta), jnp.cos(theta)
    t3 = safe_theta2 * theta
    t4 = safe_theta2 * safe_theta2
    t5 = t4 * theta

    c1 = jnp.where(is_small, 1.0 / 6.0 - theta2 / 120.0, (theta - s) / t3)
    c2 = jnp.where(
        is_small, 1.0 / 24.0 - theta2 / 720.0, -(1.0 - theta2 / 2.0 - c) / t4
    )
    # coefficient of (WVW^2 + W^2VW): 0.5*(c2 + 3*(theta - sin - theta^3/6)/theta^5)
    # (sign verified empirically against autodiff — some textbook printings
    # differ; see tests/test_lie.py::test_se3_left_jacobian_inv)
    c3 = 0.5 * (
        c2
        + 3.0
        * jnp.where(
            is_small,
            -1.0 / 120.0 + theta2 / 5040.0,
            (theta - s - t3 / 6.0) / t5,
        )
    )

    W = hat(w)
    V = hat(v)
    WV, VW = mm(W, V), mm(V, W)
    WVW = mm(WV, W)
    W2 = mm(W, W)
    c1t = c1[..., None, None]
    c2t = c2[..., None, None]
    c3t = c3[..., None, None]
    return (
        0.5 * V
        + c1t * (WV + VW + WVW)
        + c2t * (mm(W2, V) + mm(V, W2) - 3.0 * WVW)
        + c3t * (mm(WVW, W) + mm(W, WVW))
    )


def se3_left_jacobian_inv(xi):
    """Exact inverse left Jacobian of SE(3). (..., 6) -> (..., 6, 6),
    tangent order [w, v]."""
    w = xi[..., :3]
    Jw_inv = so3_left_jacobian_inv(w)
    Q = _se3_Q(xi)
    bl = -mm(mm(Jw_inv, Q), Jw_inv)
    zeros = jnp.zeros_like(Jw_inv)
    top = jnp.concatenate([Jw_inv, zeros], axis=-1)
    bottom = jnp.concatenate([bl, Jw_inv], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_right_jacobian_inv(xi):
    """Exact inverse right Jacobian of SE(3): Jr^{-1}(xi) = Jl^{-1}(-xi)."""
    return se3_left_jacobian_inv(-xi)


def adjoint(T):
    """Adjoint of SE(3): (..., 4, 4) -> (..., 6, 6), tangent order [omega, v]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = mm(hat(t), R)
    zeros = jnp.zeros_like(R)
    top = jnp.concatenate([R, zeros], axis=-1)
    bottom = jnp.concatenate([tR, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def retract(T, xi):
    """Right-retraction: T * exp(xi). Matches GTSAM Pose3::retract convention."""
    return mm(T, se3_exp(xi))


def local_coordinates(T_a, T_b):
    """xi such that T_b = T_a * exp(xi)."""
    return se3_log(mm(inverse(T_a), T_b))


def normalize_rotation(T):
    """Re-orthonormalise the rotation block via SVD (drift control for f32)."""
    R = T[..., :3, :3]
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(mm(u, vt))
    d = jnp.ones(u.shape[:-2] + (3,), dtype=T.dtype).at[..., 2].set(det)
    R_fixed = mm(u * d[..., None, :], vt)
    return make_pose(R_fixed, T[..., :3, 3])


# ---------------------------------------------------------------------------
# Quaternions (xyzw) — used for logging / evaluation interop with `evo`.
# ---------------------------------------------------------------------------

def rot_to_quat(R):
    """(..., 3, 3) -> (..., 4) quaternion xyzw, branch-free (Shepperd)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.clip(x, 1e-12, None))

    # Four candidate constructions; pick by largest pivot.
    qw0 = safe_sqrt(1.0 + tr) * 0.5
    k0 = 0.25 / qw0
    c0 = jnp.stack([(m21 - m12) * k0, (m02 - m20) * k0, (m10 - m01) * k0, qw0], axis=-1)

    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) * 0.5
    k1 = 0.25 / qx1
    c1 = jnp.stack([qx1, (m01 + m10) * k1, (m02 + m20) * k1, (m21 - m12) * k1], axis=-1)

    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) * 0.5
    k2 = 0.25 / qy2
    c2 = jnp.stack([(m01 + m10) * k2, qy2, (m12 + m21) * k2, (m02 - m20) * k2], axis=-1)

    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) * 0.5
    k3 = 0.25 / qz3
    c3 = jnp.stack([(m02 + m20) * k3, (m12 + m21) * k3, qz3, (m10 - m01) * k3], axis=-1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 > m11) & (m00 > m22))[..., None]
    cond2 = (m11 > m22)[..., None]
    q = jnp.where(cond0, c0, jnp.where(cond1, c1, jnp.where(cond2, c2, c3)))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rot(q):
    """(..., 4) xyzw -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1)
    row1 = jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1)
    row2 = jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
