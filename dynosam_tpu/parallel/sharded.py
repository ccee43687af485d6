"""Landmark-sharded backend assembly: model parallelism over the point axis.

The batched pipeline (`parallel/batched.py`) scales data-parallel over
SEQUENCES; this module scales a SINGLE sequence's backend over chips by
sharding the landmark tables. The dominant backend cost is the Hessian
assembly — big einsum chains summing per-landmark (6F x 6F) contributions —
which is an exact sum over landmarks:

    S = sum_l S_l(theta)  ->  shard l over the mesh, psum the (D, D) partials

Each shard runs `hybrid.linearize` on its local slice of the landmark tables
with the replicated (non-landmark) terms scaled by 1/P, then one `psum`
produces the exact global normal equations — the collective moves only the
(D, D) reduced system (D = 6F + 6JF, a few hundred), not the landmark data,
so it rides ICI at negligible cost. The dense solve is replicated (it is
tiny); the landmark back-substitution in `_apply_update` is embarrassingly
shard-local.

Reference counterpart: none — the reference is single-node (TBB threads).
This is the TPU-native scaling path for large maps (Ld in the tens of
thousands).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynosam_tpu.backend import hybrid
from dynosam_tpu.backend.graph import GraphState
from dynosam_tpu.backend.solver import _EPS_REG
from dynosam_tpu.config import BackendParams

# landmark-indexed GraphState leaves -> the axis that runs over landmarks
LD_FIELDS = {"md": 0, "d_tid": 0, "d_obj": 0, "d_z": 0, "d_valid": 0,
             "d_sig": 0, "m_hyb": 0}
LS_FIELDS = {"ms": 0, "s_tid": 0, "s_z": 1, "s_valid": 1, "s_sig": 1}


def state_partition_specs(axis: str) -> GraphState:
    """GraphState pytree of PartitionSpecs: landmark tables sharded on
    `axis`, everything else replicated."""
    specs = {}
    for f in dataclasses.fields(GraphState):
        name = f.name
        if name in LD_FIELDS:
            d = LD_FIELDS[name]
        elif name in LS_FIELDS:
            d = LS_FIELDS[name]
        else:
            specs[name] = P()
            continue
        specs[name] = P(*([None] * d + [axis]))
    return GraphState(**specs)


def shard_state(state: GraphState, mesh: Mesh, axis: str = "points"):
    """Place a (replicated/host) GraphState onto the mesh with landmark
    tables sharded. Capacities must divide the axis size."""
    specs = state_partition_specs(axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )


def sharded_linearize(
    state: GraphState,
    cfg: BackendParams,
    lam,
    mesh: Mesh,
    axis: str = "points",
):
    """Exact global (S, rhs) with landmark-sharded assembly + one psum."""
    Pn = mesh.shape[axis]
    specs = state_partition_specs(axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(specs,),
        out_specs=(P(), P()),
    )
    def assemble(st):
        lin = hybrid.linearize(
            st, cfg, lam, fixed_scale=1.0 / Pn, final_reg=False
        )
        return (
            jax.lax.psum(lin.S, axis),
            jax.lax.psum(lin.rhs, axis),
        )

    S, rhs = assemble(state)
    diag = jnp.diag(S)
    S = S + jnp.diag((_EPS_REG + lam) + (1e-5 + lam) * jnp.abs(diag))
    return S, rhs


def sharded_gn_step(
    state: GraphState,
    cfg: BackendParams,
    lam,
    mesh: Mesh,
    axis: str = "points",
    max_step: float = 0.2,
):
    """One Gauss-Newton step with landmark-sharded assembly AND back-
    substitution. The (D, D) solve is replicated on every shard (it is tiny
    and cheaper than broadcasting the factorisation); the per-landmark point
    updates in `_apply_update` run shard-local with zero communication.

    Input and output states carry the same landmark sharding, so steps
    chain without resharding.
    """
    Pn = mesh.shape[axis]
    specs = state_partition_specs(axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(specs,),
        out_specs=specs,
    )
    def step(st):
        lin = hybrid.linearize(
            st, cfg, lam, fixed_scale=1.0 / Pn, final_reg=False
        )
        S = jax.lax.psum(lin.S, axis)
        rhs = jax.lax.psum(lin.rhs, axis)
        diag = jnp.diag(S)
        S = S + jnp.diag((_EPS_REG + lam) + (1e-5 + lam) * jnp.abs(diag))
        L = jnp.linalg.cholesky(S)
        z = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        dx = jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
        blocks = dx.reshape(-1, 6)
        norms = jnp.linalg.norm(blocks, axis=-1, keepdims=True)
        dx = (
            blocks * jnp.minimum(1.0, max_step / jnp.clip(norms, 1e-12, None))
        ).reshape(-1)
        return hybrid._apply_update(st, lin, dx)

    return step(state)


def sharded_optimize(
    state: GraphState,
    cfg: BackendParams,
    mesh: Mesh,
    axis: str = "points",
    iterations: int = None,
):
    """Fixed-iteration damped GN over the mesh (the large-map optimize path;
    accept/reject needs a replicated cost evaluation and is intentionally
    omitted — this mirrors incremental mode's plain warm-started GN)."""
    op = cfg.optimizer
    lam = jnp.asarray(op.lm_initial_lambda, jnp.float32)
    for _ in range(iterations or op.max_iterations):
        state = sharded_gn_step(
            state, cfg, lam, mesh, axis=axis, max_step=op.gn_max_step
        )
    return state
