"""Landmark-sharded backend assembly: psum'd normal equations must match the
unsharded linearize exactly (model parallelism over the point axis)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from dynosam_tpu.backend import graph, hybrid
from dynosam_tpu.config import BackendParams, NoiseParams
from dynosam_tpu.dataproviders.simulator import Scenario, ScenarioSpec
from dynosam_tpu.parallel import sharded

pytestmark = pytest.mark.slow  # heavy jit-compile e2e tier


def test_sharded_linearize_matches_unsharded():
    scn = Scenario(
        ScenarioSpec.default_two_objects(
            num_frames=6, pixel_noise=0.4, depth_noise=0.02, seed=5
        )
    )
    cfg = BackendParams(
        max_frames=6, max_objects=4, max_static_landmarks=256,
        max_dynamic_landmarks=96, backend_updater_enum=3,
        noise=NoiseParams(use_range_dependent_noise=False),
    )
    st = graph.empty_graph(cfg)
    for k in range(6):
        st = graph.update_from_packet_hybrid(
            st, scn.measurements(k, 4), scn.intr, cfg
        )
    lam = jnp.float32(1e-4)
    ref = hybrid.linearize(st, cfg, lam)

    mesh = Mesh(np.array(jax.devices()[:8]), ("points",))
    S, rhs = sharded.sharded_linearize(
        sharded.shard_state(st, mesh), cfg, lam, mesh
    )
    # psum reassociation leaves ~1e-6 relative f32 drift on the largest
    # (gauge-prior-scale) entries
    scale = float(jnp.abs(ref.S).max())
    np.testing.assert_allclose(
        np.asarray(S), np.asarray(ref.S), atol=1e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(rhs), np.asarray(ref.rhs),
        atol=1e-5 * float(jnp.abs(ref.rhs).max()),
    )


def test_sharded_optimize_converges_like_unsharded():
    import dataclasses

    scn = Scenario(
        ScenarioSpec.default_two_objects(
            num_frames=6, pixel_noise=0.4, depth_noise=0.02, seed=5
        )
    )
    cfg = BackendParams(
        max_frames=6, max_objects=4, max_static_landmarks=256,
        max_dynamic_landmarks=96, backend_updater_enum=3,
        noise=NoiseParams(use_range_dependent_noise=False),
    )
    st = graph.empty_graph(cfg)
    for k in range(6):
        st = graph.update_from_packet_hybrid(
            st, scn.measurements(k, 4), scn.intr, cfg
        )

    # unsharded reference: plain damped GN (accept_reject off), 5 iterations
    cfg_gn = dataclasses.replace(
        cfg,
        optimizer=dataclasses.replace(
            cfg.optimizer, accept_reject=False, max_iterations=5
        ),
    )
    ref = hybrid.optimize(st, cfg_gn)

    mesh = Mesh(np.array(jax.devices()[:8]), ("points",))
    out = sharded.sharded_optimize(
        sharded.shard_state(st, mesh), cfg_gn, mesh, iterations=5
    )
    # same optimum within f32 psum-reassociation drift
    np.testing.assert_allclose(
        np.asarray(out.X), np.asarray(ref.X), atol=2e-4
    )
    err = np.abs(np.asarray(out.H) - np.asarray(ref.H))
    assert err.max() < 2e-3
