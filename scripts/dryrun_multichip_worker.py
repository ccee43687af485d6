"""Worker process for the multi-chip dry-run.

Must run in a FRESH interpreter: it forces the virtual-CPU platform before
jax is imported anywhere, builds an n-device Mesh, jits the full fused SLAM
step (frontend + backend, real data-parallel shardings) over it, executes
two steps on tiny shapes, and asserts shard-equivalence: the mesh-sharded
run must match a plain single-device vmap of the same program on the same
inputs (the data-parallel axis has no cross-device communication, so the
results must agree to float tolerance).

Invoked by `__graft_entry__.dryrun_multichip` via subprocess so that a parent
process whose jax is already initialized against real TPU hardware (the
driver) cannot poison the platform selection.
"""

from __future__ import annotations

import os
import sys

N_DEVICES = int(sys.argv[1]) if len(sys.argv) > 1 else 8

# Force the virtual CPU mesh BEFORE any jax import (mirrors tests/conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEVICES}"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec  # noqa: E402


def main() -> None:
    assert len(jax.devices()) >= N_DEVICES, (
        f"expected {N_DEVICES} virtual devices, got {len(jax.devices())}"
    )

    import __graft_entry__ as ge
    from dynosam_tpu.parallel.batched import make_batched_pipeline

    cfg = ge._small_config()
    intr = ge._intr(width=64, height=48)
    inputs_np = ge._frame_inputs(width=64, height=48, batch=N_DEVICES)

    # --- sharded run over the mesh -------------------------------------
    devices = np.array(jax.devices()[:N_DEVICES])
    mesh = Mesh(devices, ("data",))
    step, init_fn = make_batched_pipeline(cfg, intr, mesh=mesh)
    states = init_fn(N_DEVICES)
    inputs = jax.device_put(
        inputs_np, NamedSharding(mesh, PartitionSpec("data"))
    )
    states, out1 = step(states, inputs)
    jax.block_until_ready(out1)
    # second step exercises the steady-state path (window not empty)
    states, out2 = step(states, inputs)
    jax.block_until_ready(out2)

    # --- reference run: same program, single device, no sharding -------
    ref_step, ref_init = make_batched_pipeline(cfg, intr, mesh=None)
    ref_states = ref_init(N_DEVICES)
    ref_states, ref1 = ref_step(ref_states, inputs_np)
    ref_states, ref2 = ref_step(ref_states, inputs_np)
    jax.block_until_ready(ref2)

    # --- shard-equivalence: per-sequence outputs must match ------------
    for name in out2:
        a = np.asarray(out2[name])
        b = np.asarray(ref2[name])
        assert a.shape == b.shape, f"{name}: shape {a.shape} vs {b.shape}"
        assert np.all(np.isfinite(a) == np.isfinite(b)), f"{name}: finite mask"
        fin = np.isfinite(b)
        if not np.allclose(a[fin], b[fin], rtol=2e-4, atol=2e-4):
            err = np.max(np.abs(a[fin] - b[fin]))
            raise AssertionError(
                f"shard-equivalence failed for output '{name}': max |diff|={err}"
            )

    # --- model parallelism: landmark-sharded Hessian assembly ----------
    # (parallel/sharded.py — the single-sequence scaling axis). The psum'd
    # normal equations must match the unsharded linearize bit-for-tolerance.
    import jax.numpy as jnp

    from dynosam_tpu.backend import graph, hybrid
    from dynosam_tpu.config import BackendParams, NoiseParams
    from dynosam_tpu.dataproviders.simulator import Scenario, ScenarioSpec
    from dynosam_tpu.parallel import sharded

    # noisy measurements give the rhs a real scale — on a noiseless scene it
    # is pure cancellation and any reassociated f32 psum trips an
    # absolute-tolerance check
    scn = Scenario(
        ScenarioSpec.default_two_objects(
            num_frames=4, pixel_noise=0.4, depth_noise=0.02, seed=5
        )
    )
    bcfg = BackendParams(
        max_frames=4, max_objects=4, max_static_landmarks=256,
        max_dynamic_landmarks=96, backend_updater_enum=3,
        noise=NoiseParams(use_range_dependent_noise=False),
    )
    st = graph.empty_graph(bcfg)
    for k in range(4):
        st = graph.update_from_packet_hybrid(
            st, scn.measurements(k, 4), scn.intr, bcfg
        )
    lam = jnp.float32(1e-4)
    ref_lin = hybrid.linearize(st, bcfg, lam)
    pmesh = Mesh(devices, ("points",))
    S_sh, rhs_sh = sharded.sharded_linearize(
        sharded.shard_state(st, pmesh), bcfg, lam, pmesh
    )
    scale = float(jnp.abs(ref_lin.S).max())
    assert np.allclose(
        np.asarray(S_sh), np.asarray(ref_lin.S), atol=1e-4 * max(scale, 1.0)
    ), "landmark-sharded Hessian assembly != unsharded"
    assert np.allclose(
        np.asarray(rhs_sh), np.asarray(ref_lin.rhs),
        atol=1e-4 * max(float(jnp.abs(ref_lin.rhs).max()), 1.0),
    ), "landmark-sharded rhs != unsharded"

    print(
        f"dryrun_multichip OK: {N_DEVICES} devices, 2 steps, "
        f"shard-equivalence verified on {len(out2)} outputs; "
        f"landmark-sharded assembly (points axis) matches unsharded"
    )


if __name__ == "__main__":
    main()
