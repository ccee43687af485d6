"""World-centric pose formulation (WCPE) tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.backend import graph, wcpe
from dynosam_tpu.backend.backend import RegularBackend
from dynosam_tpu.config import BackendParams, NoiseParams
from dynosam_tpu.dataproviders.simulator import Scenario, ScenarioSpec
from dynosam_tpu.utils import lie

pytestmark = pytest.mark.slow  # heavy jit-compile e2e tier

MAX_OBJ = 4


def wcpe_cfg(**kw):
    base = dict(
        max_frames=8,
        max_objects=MAX_OBJ,
        max_static_landmarks=256,
        max_dynamic_landmarks=96,
        backend_updater_enum=1,
    )
    base.update(kw)
    # simulator noise is range-independent; test the pure solver math
    base.setdefault("noise", NoiseParams(use_range_dependent_noise=False))
    return BackendParams(**base)


@pytest.fixture(scope="module")
def clean_scn():
    return Scenario(ScenarioSpec.default_two_objects(num_frames=8))


@pytest.fixture(scope="module")
def noisy_scn():
    return Scenario(
        ScenarioSpec.default_two_objects(
            num_frames=12, pixel_noise=0.4, depth_noise=0.02, seed=5
        )
    )


def ingest_all(scn, cfg, n=None):
    st = graph.empty_graph(cfg)
    for k in range(n or scn.spec.num_frames):
        st = wcpe.update_from_packet_wcpe(
            st, scn.measurements(k, MAX_OBJ), scn.intr, cfg
        )
    return st


class TestWcpeBatch:
    def test_exact_recovery(self, clean_scn):
        cfg = wcpe_cfg(use_smoothing_factor=False)
        st = ingest_all(clean_scn, cfg)
        st = wcpe.optimize(st, cfg)
        for k in range(8):
            err = lie.local_coordinates(st.X[k], clean_scn.X_gt[k])
            assert float(jnp.linalg.norm(err)) < 2e-3, k
        # F2F motions from pose pairs must match GT where both poses exist
        for f in range(3, 8):
            Hf = wcpe.f2f_motion(st, f)
            for j in range(2):
                if bool(st.H_valid[j, f]) and bool(st.H_valid[j, f - 1]):
                    e = lie.local_coordinates(Hf[j], clean_scn.H_gt[j][f])
                    assert float(jnp.linalg.norm(e)) < 5e-3, (f, j)

    def test_error_decreases(self, noisy_scn):
        cfg = wcpe_cfg()
        st = ingest_all(noisy_scn, cfg, n=8)
        e0 = float(wcpe.total_error(st, cfg))
        st = wcpe.optimize(st, cfg)
        e1 = float(wcpe.total_error(st, cfg))
        assert e1 < 0.3 * e0

    def test_object_pose_variables_track_gt_relative(self, clean_scn):
        """WCPE pose variables: relative pose L_f L_g^{-1} equals the GT
        motion composition (absolute L has a per-object gauge)."""
        cfg = wcpe_cfg(use_smoothing_factor=False)
        st = ingest_all(clean_scn, cfg)
        st = wcpe.optimize(st, cfg)
        for j in range(2):
            rel = lie.mm(st.H[j, 6], lie.inverse(st.H[j, 2]))
            H_prod = lie.identity()
            for k in range(3, 7):
                H_prod = lie.compose(clean_scn.H_gt[j][k], H_prod)
            err = lie.local_coordinates(rel, H_prod)
            assert float(jnp.linalg.norm(err)) < 2e-2, j


class TestWcpeStreaming:
    def test_streaming(self, noisy_scn):
        cfg = wcpe_cfg(max_frames=8, optimization_mode=1)
        be = RegularBackend(cfg, noisy_scn.intr)
        for k in range(12):
            out = be.step(noisy_scn.measurements(k, MAX_OBJ))
        assert np.isfinite(out.X_world_cam).all()
        err = lie.local_coordinates(
            jnp.asarray(out.X_world_cam), noisy_scn.X_gt[11]
        )
        assert float(jnp.linalg.norm(err)) < 0.1
        for j, oid in enumerate(noisy_scn.object_ids):
            slot = list(out.object_ids).index(oid)
            if out.object_motion_valid[slot]:
                e = lie.local_coordinates(
                    jnp.asarray(out.object_motions[slot]), noisy_scn.H_gt[j][11]
                )
                assert float(jnp.linalg.norm(e)) < 0.3
