"""Multi-sequence / multi-chip execution via jax.sharding.

The reference is a single-process, multi-threaded system (SURVEY.md §2.10) —
its only parallelism beyond threads is TBB's per-object loop. The TPU-native
scaling story replaces that with SPMD over a device Mesh:

  * sequences form a leading batch axis, sharded over the mesh's "data" axis
    (multi-sequence batched streaming — driver config #5);
  * objects and landmark tables inside each sequence are already padded batch
    axes consumed by batched einsums (the ParallelHybrid TBB loop analogue);
  * the fused per-frame step (frontend track+solve -> backend ingest ->
    windowed LM) is ONE jitted program, so XLA overlaps everything and
    inserts any needed collectives.

`make_fused_step` builds the single-sequence program; `make_batched_pipeline`
vmaps + shards it over a mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynosam_tpu.backend import graph as graph_mod
from dynosam_tpu.backend import hybrid as hybrid_mod
from dynosam_tpu.backend import solver
from dynosam_tpu.backend.graph import GraphState
from dynosam_tpu.backend import window as window_mod
from dynosam_tpu.config import DynoConfig
from dynosam_tpu.cv import camera as cam
from dynosam_tpu.frontend.frontend import (
    FrontendState,
    empty_frontend_state,
    frontend_step,
)
from dynosam_tpu.frontend.types import FrameInputs


@flax.struct.dataclass
class PipelineState:
    frontend: FrontendState
    graph: GraphState


def init_pipeline_state(cfg: DynoConfig, key=None, image_shape=None) -> PipelineState:
    """image_shape=(height, width) is required only in KLT mode
    (prefer_provided_optical_flow=False), where the frontend state carries
    the previous grayscale frame."""
    cfg = cfg.normalized()
    return PipelineState(
        frontend=empty_frontend_state(cfg.frontend, key=key, image_shape=image_shape),
        graph=graph_mod.empty_graph(cfg.backend),
    )


def make_fused_step(
    cfg: DynoConfig, intr: cam.CameraIntrinsics, pipelined: bool = False
):
    """One full SLAM step: images in -> optimized state out. Pure, jittable.

    pipelined=True software-pipelines the backend one frame behind the
    frontend inside one XLA program (the window optimization of the previous
    frame has no data dependency on the current frame's images). This mirrors
    the reference's asynchronous frontend/backend threads + queue
    (PipelineManager.cc:221) and lets a multi-core scheduler overlap the two;
    on a single sequential TPU core it only delays outputs by a frame, so the
    default is the sequential order (optimize the current frame's window
    before returning).
    """
    import dataclasses

    cfg = cfg.normalized()
    bcfg = cfg.backend
    if bcfg.optimization_mode == 2:
        # incremental mode: warm-started LM, few iterations, with
        # accept/reject (plain GN diverges on weakly-conditioned windows)
        bcfg = dataclasses.replace(
            bcfg,
            optimizer=dataclasses.replace(
                bcfg.optimizer,
                accept_reject=True,
                max_iterations=min(3, bcfg.optimizer.max_iterations),
            ),
        )
    cfg = dataclasses.replace(cfg, backend=bcfg)

    # formulation dispatch (backend_updater_enum parity)
    if bcfg.backend_updater_enum in (2, 3):
        advance_fn = window_mod.advance_hybrid
        update_fn = graph_mod.update_from_packet_hybrid
        optimize_fn = hybrid_mod.optimize
    elif bcfg.backend_updater_enum == 1:
        from dynosam_tpu.backend import wcpe as wcpe_mod

        advance_fn = window_mod.advance_wcpe
        update_fn = wcpe_mod.update_from_packet_wcpe
        optimize_fn = wcpe_mod.optimize
    else:
        advance_fn = window_mod.advance
        update_fn = graph_mod.update_from_packet
        optimize_fn = solver.optimize

    def _advance_if_full(g):
        full = g.num_frames >= cfg.backend.max_frames
        return jax.lax.cond(
            full, lambda s: advance_fn(s, cfg.backend), lambda s: s, g
        )

    def _outputs(g, packet):
        latest = jnp.clip(g.num_frames - 1, 0, cfg.backend.max_frames - 1)
        prev = jnp.maximum(latest - 1, 0)
        # F2F world motion + its validity (both reference slots must exist;
        # see RegularBackend._device_outputs for the per-formulation rules)
        if bcfg.backend_updater_enum in (2, 3):
            H_out = hybrid_mod.f2f_motion(g, latest)
            H_ok = (
                g.H_valid[:, latest]
                & (g.H_valid[:, prev] | (g.kf_slot == prev))
                & (latest > 0)
            )
        elif bcfg.backend_updater_enum == 1:
            from dynosam_tpu.backend import wcpe as wcpe_mod

            H_out = wcpe_mod.f2f_motion(g, latest)
            H_ok = g.H_valid[:, latest] & g.H_valid[:, prev] & (latest > 0)
        else:
            H_out = g.H[:, latest]
            H_ok = g.H_valid[:, latest]
        return {
            "X_world_cam": g.X[latest],
            "object_ids": g.obj_ids,
            "object_motions": H_out,
            "object_motion_valid": H_ok,
            "frontend_pose": packet.X_world_cam,
        }

    if pipelined:

        def step(state: PipelineState, inputs: FrameInputs):
            # frontend(k) and optimize(window through k-1) are independent —
            # XLA runs them concurrently.
            fe_state, packet = frontend_step(
                state.frontend, inputs, intr, cfg.frontend
            )
            g = optimize_fn(state.graph, cfg.backend)
            g = _advance_if_full(g)
            g = update_fn(g, packet, intr, cfg.backend)
            new_state = PipelineState(frontend=fe_state, graph=g)
            return new_state, _outputs(g, packet)

    else:

        def step(state: PipelineState, inputs: FrameInputs):
            fe_state, packet = frontend_step(
                state.frontend, inputs, intr, cfg.frontend
            )
            g = _advance_if_full(state.graph)
            g = update_fn(g, packet, intr, cfg.backend)
            g = optimize_fn(g, cfg.backend)
            new_state = PipelineState(frontend=fe_state, graph=g)
            return new_state, _outputs(g, packet)

    return step


def make_batched_pipeline(
    cfg: DynoConfig,
    intr: cam.CameraIntrinsics,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
):
    """vmapped fused step, optionally sharded over `mesh[axis]` (1 sequence
    per shard slot). Returns (jitted_step, init_fn)."""
    # The corner-response Pallas kernel carries a custom_vmap rule
    # (ops/pallas/shi_tomasi.py) that dispatches to an explicitly batched
    # grid, so the vmapped pipeline keeps the kernel (round-4 disabled it
    # here, costing ~30% at B=1 vs the unbatched program).
    step = make_fused_step(cfg, intr)
    batched = jax.vmap(step)

    if mesh is None:
        return jax.jit(batched), lambda n: _init_batch(cfg, n)

    shard = NamedSharding(mesh, P(axis))

    def spec_like(tree):
        return jax.tree.map(lambda _: shard, tree)

    def init_fn(n: int) -> PipelineState:
        states = _init_batch(cfg, n)
        return jax.device_put(states, shard)

    jitted = jax.jit(batched, in_shardings=(shard, shard), out_shardings=(shard, shard))
    return jitted, init_fn


def _init_batch(cfg: DynoConfig, n: int) -> PipelineState:
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    return jax.vmap(lambda k: init_pipeline_state(cfg, key=k))(keys)
