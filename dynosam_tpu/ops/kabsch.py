"""Weighted Kabsch/Umeyama rigid alignment (batched, closed form).

TPU-native replacement for the reference's OpenGV 3d-3d (Arun) minimal solver
(/root/reference/dynosam/include/dynosam/frontend/vision/MotionSolver.hpp,
EgoMotionSolver::geometricOutlierRejection3d3d). Solves

    argmin_{R, t} sum_i w_i || (R p_i + t) - q_i ||^2

for batches of correspondence sets via 3x3 SVD — ideal for vmapped RANSAC
hypothesis solving (3-point minimal sets) and weighted all-inlier refits.
"""

from __future__ import annotations

import jax.numpy as jnp

from dynosam_tpu.utils import lie


def solve_rigid(p, q, w=None):
    """Rigid transform T (4x4) such that q ~= T * p, in batch.

    p, q: (..., N, 3) point sets; w: optional (..., N) nonnegative weights.
    Degenerate inputs (all-zero weights, rank-deficient covariance) return a
    valid SE(3) (identity-ish) rather than NaN; callers gate on their own
    validity masks.
    """
    p = jnp.asarray(p)
    q = jnp.asarray(q)
    if w is None:
        w = jnp.ones(p.shape[:-1], dtype=p.dtype)
    w = w[..., None]
    wsum = jnp.clip(jnp.sum(w, axis=-2), 1e-9, None)

    mu_p = jnp.sum(p * w, axis=-2) / wsum
    mu_q = jnp.sum(q * w, axis=-2) / wsum
    pc = p - mu_p[..., None, :]
    qc = q - mu_q[..., None, :]

    # Cross-covariance: sum_i w_i q_i p_i^T  (3x3)
    H = lie.einsum("...ni,...nj->...ij", qc * w, pc)
    # Guard rank deficiency for SVD stability.
    H = H + 1e-12 * jnp.eye(3, dtype=p.dtype)

    u, _, vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(lie.mm(u, vt))
    d = jnp.ones(u.shape[:-2] + (3,), dtype=p.dtype).at[..., 2].set(det)
    R = lie.mm(u * d[..., None, :], vt)
    t = mu_q - lie.einsum("...ij,...j->...i", R, mu_p)
    return lie.make_pose(R, t)


def alignment_error(T, p, q):
    """Per-point residual norms || T p - q ||, (..., N)."""
    return jnp.linalg.norm(lie.transform_points(T[..., None, :, :], p) - q, axis=-1)


# ---------------------------------------------------------------------------
# TPU fast paths: no SVD / eigh custom-calls.
#
# Profiling the vmapped RANSAC (8 slots x 128 hypotheses of 3x3 SVD) showed
# the XLA small-batched SVD machinery (QR custom-calls + Jacobi while-loops)
# dominating the whole frontend (~7 of 14 ms per frame). Minimal 3-point sets
# admit an exact closed-form triad solution, and weighted refits admit Horn's
# quaternion method whose dominant eigenvector we get with a warm-started
# power iteration — both pure elementwise/fusable code.
# ---------------------------------------------------------------------------


def _normalize(v, eps=1e-12):
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)


def _triad(p):
    """Orthonormal basis (..., 3, 3) from 3 points (..., 3, 3): rows e1,e2,e3."""
    d1 = p[..., 1, :] - p[..., 0, :]
    d2 = p[..., 2, :] - p[..., 0, :]
    e1 = _normalize(d1)
    e2 = _normalize(d2 - jnp.sum(d2 * e1, axis=-1, keepdims=True) * e1)
    e3 = jnp.cross(e1, e2)
    return jnp.stack([e1, e2, e3], axis=-2)


def solve_rigid_3pt(p, q):
    """Exact rigid transform from 3 correspondences (..., 3, 3) -> (..., 4, 4).

    For congruent (outlier-free) samples this equals the Kabsch solution; for
    non-congruent samples it returns *a* rigid transform that RANSAC scoring
    will reject. Collinear samples yield a garbage-but-finite rotation (the
    eps in normalization), likewise rejected by scoring. No SVD: ~30 fusable
    flops per hypothesis.
    """
    Bp = _triad(p)  # rows are the basis vectors => Bp maps world->triad
    Bq = _triad(q)
    # R = Bq^T Bp : p-frame -> q-frame
    R = lie.mm(jnp.swapaxes(Bq, -1, -2), Bp)
    mu_p = jnp.mean(p, axis=-2)
    mu_q = jnp.mean(q, axis=-2)
    t = mu_q - lie.rotate_points(R, mu_p)
    return lie.make_pose(R, t)


def _quat_to_rot(q):
    """Unit quaternion (..., 4) [w,x,y,z] -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def _rot_to_quat(R):
    """Rotation matrix -> unit quaternion [w,x,y,z]; branch-free (Shepperd)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # four candidate quaternions (un-normalized), one per dominant component
    qw = jnp.stack([1 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)
    traces = jnp.stack(
        [1 + m00 + m11 + m22, 1 + m00 - m11 - m22,
         1 - m00 + m11 - m22, 1 - m00 - m11 + m22], -1,
    )
    best = jnp.argmax(traces, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), -2)[
        ..., 0, :
    ]
    return _normalize(q)


def solve_rigid_quat(p, q, w=None, R0=None, iters=24):
    """Weighted rigid alignment via Horn's quaternion method (q ~= T p).

    The optimal rotation is the dominant eigenvector of Horn's 4x4 symmetric
    matrix N; we extract it with a power iteration on (N + shift*I), warm
    started from R0 (e.g. RANSAC's best hypothesis) when given. All
    elementwise — no eigh/SVD custom-call. Quaternions parameterize only
    proper rotations, so the reflection case needs no det() fix-up.
    """
    p = jnp.asarray(p)
    q = jnp.asarray(q)
    if w is None:
        w = jnp.ones(p.shape[:-1], dtype=p.dtype)
    ww = w[..., None]
    wsum = jnp.clip(jnp.sum(ww, axis=-2), 1e-9, None)
    mu_p = jnp.sum(p * ww, axis=-2) / wsum
    mu_q = jnp.sum(q * ww, axis=-2) / wsum
    pc = p - mu_p[..., None, :]
    qc = q - mu_q[..., None, :]

    # S = sum_i w_i pc_i qc_i^T  (3x3)
    S = lie.einsum("...ni,...nj->...ij", pc * ww, qc)
    Sxx, Sxy, Sxz = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    Syx, Syy, Syz = S[..., 1, 0], S[..., 1, 1], S[..., 1, 2]
    Szx, Szy, Szz = S[..., 2, 0], S[..., 2, 1], S[..., 2, 2]
    row0 = jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1)
    row1 = jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1)
    row2 = jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1)
    row3 = jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1)
    N = jnp.stack([row0, row1, row2, row3], axis=-2)  # (..., 4, 4)

    # Shift so the target (max) eigenvalue is also largest in magnitude.
    # Gershgorin row-sum bound: the smallest shift guaranteeing positivity —
    # an oversized shift (e.g. sum of all |N|) drives the power-iteration
    # convergence ratio (l2+s)/(l1+s) toward 1 and stalls it.
    shift = jnp.max(jnp.sum(jnp.abs(N), axis=-1), axis=-1)[..., None, None]
    Ns = N + shift * jnp.eye(4, dtype=p.dtype)

    if R0 is not None:
        v = _rot_to_quat(R0)
    else:
        v = jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0, 0.0], dtype=p.dtype), N.shape[:-1]
        )
    for _ in range(iters):
        v = lie.einsum("...ij,...j->...i", Ns, v)
        v = _normalize(v)
    R = _quat_to_rot(v)
    t = mu_q - lie.rotate_points(R, mu_p)
    return lie.make_pose(R, t)
