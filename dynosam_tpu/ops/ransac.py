"""Fixed-shape, fully vectorised RANSAC.

Replaces the reference's OpenGV sequential RANSAC loop
(/root/reference/dynosam/include/dynosam/frontend/vision/MotionSolver.hpp:85
`runRansac`) with a TPU-friendly design: a *static* number of hypotheses are
sampled, solved, and scored in parallel with `vmap`; no data-dependent
early-exit. With >= the reference's 500 iterations as the hypothesis count,
success probability strictly dominates the adaptive sequential version.

Data is padded: `valid` masks dead correspondence slots. Samples are drawn
uniformly among valid entries via the Gumbel top-k trick (random keys + top_k),
so invalid slots are never selected (as long as >= sample_size are valid).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    model: jnp.ndarray        # best model, shape = model shape (e.g. (4, 4))
    inliers: jnp.ndarray      # (N,) bool
    num_inliers: jnp.ndarray  # () int32
    valid: jnp.ndarray        # () bool — solution meets min_inliers


def _sample_indices(key, valid, num_hypotheses, sample_size):
    """(num_hypotheses, sample_size) indices drawn among valid slots.

    Top-k of the Gumbel scores via `sample_size` successive argmax+mask
    passes rather than `lax.top_k`: sample_size is tiny (3-4), so k argmax
    reductions are cheaper than a 2N-lane sort on the VPU — and, decisively,
    XLA's SPMD partitioner cannot keep TopK sharded along a leading mesh
    axis (it ALL-GATHERS the batch: measured on the 8-device mesh program,
    scripts/bench_mesh_scaling.py, where this op was the only collective in
    the whole fused step), while argmax/iota/where partition trivially."""
    n = valid.shape[0]
    g = jax.random.uniform(key, (num_hypotheses, n))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    lane = jnp.arange(n)
    cols = []
    for _ in range(sample_size):
        i = jnp.argmax(g, axis=-1)                    # (M,)
        cols.append(i)
        g = jnp.where(lane[None, :] == i[:, None], -jnp.inf, g)
    return jnp.stack(cols, axis=-1)


def ransac(
    key: jax.Array,
    solve_fn: Callable,       # (sampled pytree with leading dim sample_size) -> model
    residual_fn: Callable,    # (model, data pytree) -> (N,) residuals
    data,
    valid: jnp.ndarray,
    *,
    num_hypotheses: int,
    sample_size: int,
    threshold: float,
    min_inliers: int,
    refit_fn: Callable | None = None,  # (data, inlier_weights (N,), model) -> model
    refit_rounds: int = 2,
) -> RansacResult:
    idx = _sample_indices(key, valid, num_hypotheses, sample_size)

    def solve_one(sample_idx):
        sampled = jax.tree.map(lambda x: x[sample_idx], data)
        return solve_fn(sampled)

    models = jax.vmap(solve_one)(idx)                       # (M, ...)
    residuals = jax.vmap(lambda m: residual_fn(m, data))(models)  # (M, N)
    inlier_masks = (residuals < threshold) & valid[None, :]
    counts = jnp.sum(inlier_masks, axis=-1)
    best = jnp.argmax(counts)

    model = jax.tree.map(lambda x: x[best], models)
    inliers = inlier_masks[best]

    if refit_fn is not None:
        def body(_, carry):
            model, inliers = carry
            model = refit_fn(data, inliers.astype(residuals.dtype), model)
            res = residual_fn(model, data)
            inliers = (res < threshold) & valid
            return model, inliers

        model, inliers = jax.lax.fori_loop(0, refit_rounds, body, (model, inliers))

    num_inliers = jnp.sum(inliers)
    return RansacResult(
        model=model,
        inliers=inliers,
        num_inliers=num_inliers,
        valid=num_inliers >= min_inliers,
    )
