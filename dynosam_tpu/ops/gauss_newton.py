"""Small fixed-iteration Gauss-Newton / IRLS pose refinement.

Replaces the reference's GTSAM mini-optimisations in the frontend
(/root/reference/dynosam/include/dynosam/frontend/vision/MotionSolver.hpp:
OpticalFlowAndPoseOptimizer:119-213, MotionOnlyRefinementOptimizer:219-246)
with a branch-free GN loop over a single SE(3) variable: the Jacobian w.r.t.
the retraction tangent is obtained by jacfwd at xi = 0 (6 forward passes),
the 6x6 normal system is solved in closed form, and robustness comes from
Huber IRLS reweighting. Fixed iteration count keeps the program static.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from dynosam_tpu.utils import lie


def huber_weights(residual_norms, k):
    """IRLS weights for the Huber kernel: 1 inside, k/|r| outside."""
    safe = jnp.clip(residual_norms, 1e-12, None)
    return jnp.where(residual_norms <= k, jnp.ones_like(safe), k / safe)


def refine_pose(
    residual_fn: Callable,   # (T (4,4)) -> (N, D) residual block per measurement
    T0: jnp.ndarray,
    weights: jnp.ndarray,    # (N,) nonnegative (0 = padded/invalid)
    *,
    iterations: int = 8,
    k_huber: float | None = None,
    damping: float = 1e-6,
):
    """Minimise sum_i w_i * rho(||r_i(T)||) over T in SE(3).

    Returns (T_refined, final_weights) where final_weights fold in the last
    IRLS reweighting (callers use them as a soft inlier mask).
    """

    def step(T, _):
        def tangent_residual(xi):
            return residual_fn(lie.retract(T, xi))

        r = tangent_residual(jnp.zeros(6, dtype=T.dtype))       # (N, D)
        J = jax.jacfwd(tangent_residual)(jnp.zeros(6, dtype=T.dtype))  # (N, D, 6)

        w = weights
        if k_huber is not None:
            norms = jnp.linalg.norm(r, axis=-1)
            w = w * huber_weights(norms, k_huber)

        Jw = J * w[:, None, None]
        H = lie.einsum("ndi,ndj->ij", Jw, J)                     # (6, 6)
        g = lie.einsum("ndi,nd->i", Jw, r)                       # (6,)
        H = H + damping * jnp.eye(6, dtype=T.dtype)
        xi = -jnp.linalg.solve(H, g)
        return lie.retract(T, xi), None

    T, _ = jax.lax.scan(step, T0, None, length=iterations)
    if k_huber is not None:
        norms = jnp.linalg.norm(residual_fn(T), axis=-1)
        final_w = weights * huber_weights(norms, k_huber)
    else:
        final_w = weights
    return T, final_w
