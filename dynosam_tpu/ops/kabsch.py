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
