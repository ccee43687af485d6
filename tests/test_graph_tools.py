"""FactorGraphTools-analogue tests: error breakdown, sparsity stats, export."""

import os

import numpy as np
import pytest

from dynosam_tpu.backend import graph, graph_tools, hybrid
from dynosam_tpu.config import BackendParams, NoiseParams
from dynosam_tpu.dataproviders.simulator import Scenario, ScenarioSpec

pytestmark = pytest.mark.slow  # heavy jit-compile e2e tier


@pytest.fixture(scope="module")
def hybrid_state():
    scn = Scenario(ScenarioSpec.default_two_objects(num_frames=6))
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
    return st, cfg


def test_error_breakdown_counts(hybrid_state):
    st, cfg = hybrid_state
    bd = graph_tools.error_breakdown(st, cfg, hybrid=True)
    assert set(bd) == {
        "static_point", "dynamic_point", "smoothing", "odometry",
        "gauge_prior", "marginal_prior",
    }
    assert bd["static_point"]["count"] > 0
    assert bd["dynamic_point"]["count"] > 0
    assert bd["odometry"]["count"] == 5           # 6 frames -> 5 odom factors
    assert bd["gauge_prior"]["count"] == 1        # no marginal prior yet
    assert bd["marginal_prior"]["count"] == 0
    assert all(np.isfinite(v["chi2"]) for v in bd.values())


def test_sparsity_and_export(hybrid_state, tmp_path):
    st, cfg = hybrid_state
    lin = hybrid.linearize(st, cfg, 0.0)
    stats = graph_tools.sparsity_stats(np.asarray(lin.S), tol=1e-12)
    assert stats["rows"] == st.D and stats["cols"] == st.D
    assert 0 < stats["nnz"] < st.D * st.D         # sparse but nonempty
    png = str(tmp_path / "sparsity.png")
    graph_tools.save_sparsity_png(np.asarray(lin.S), png, tol=1e-12)
    assert os.path.getsize(png) > 0

    doc = graph_tools.export_graph_json(
        st, cfg, str(tmp_path / "g.json"), hybrid=True
    )
    assert doc["frames"] == 6
    assert set(doc["objects"]) == {1, 2}
    assert doc["objects"][1]["observations"] > 0
