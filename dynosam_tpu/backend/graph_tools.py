"""Factor-graph analysis/export utilities.

The FactorGraphTools role (/root/reference/dynosam_opt/include/dynosam_opt/
FactorGraphTools.hpp:55-534 — SparsityStats, sparsity-pattern images,
drawBlockJacobians, graph export). The Bayes-tree visitors have no analogue
(this backend solves dense batched normal equations, not a Bayes tree); their
diagnostic roles map to the reduced-system sparsity/error reports below.
"""

from __future__ import annotations

import json
from typing import Dict

import jax.numpy as jnp
import numpy as np

from dynosam_tpu.backend import factors
from dynosam_tpu.backend.graph import GraphState
from dynosam_tpu.config import BackendParams


def error_breakdown(
    state: GraphState, cfg: BackendParams, hybrid: bool = False
) -> Dict[str, Dict[str, float]]:
    """Per-factor-type robust chi2 + active-factor counts.

    The graph-analysis role of FactorGraphTools: where the reference walks
    gtsam factor lists, the batched state makes this a handful of masked
    reductions. Keys follow the factor vocabulary: static_point /
    dynamic_point (PTP or hybrid observation) / ternary / smoothing /
    odometry / gauge_prior / marginal_prior.
    """
    if hybrid:
        from dynosam_tpu.backend import hybrid as H

        out: Dict[str, Dict[str, float]] = {}
        dtype = state.X.dtype
        sig = H._sigmas(cfg, dtype)
        onehot = H._object_onehot(state, dtype)

        r_s, _ = H._static_residuals(state)
        gate = H._static_gate(state, cfg)
        m_s = state.s_valid & gate[None, :]
        e_s = jnp.linalg.norm(r_s, axis=-1) / sig["static_pt"]
        out["static_point"] = _entry(e_s, m_s)

        r_h, _, _, _ = H._hybrid_obs_terms(state, onehot)
        m_h = H._obs_mask(state, onehot)
        e_h = jnp.linalg.norm(r_h / state.d_sig, axis=-1)
        out["dynamic_point"] = _entry(e_h, m_h)

        r_sm, _, _, _ = H._smooth_triple_terms(state)
        m_sm = H._smooth_triple_mask(state, cfg)
        e_sm = jnp.linalg.norm(r_sm / sig["smooth"], axis=-1)
        out["smoothing"] = _entry(e_sm, m_sm)
        odom_mask = H._odom_mask(state)
    else:
        from dynosam_tpu.backend import solver as S

        out = {}
        dtype = state.X.dtype
        sig = S._sigmas(cfg, dtype)
        onehot = S._object_onehot(state, dtype)

        r_s, _ = S._static_residuals(state)
        gate = S._static_gate(state, cfg)
        m_s = state.s_valid & gate[None, :]
        e_s = jnp.linalg.norm(r_s / state.s_sig, axis=-1)
        out["static_point"] = _entry(e_s, m_s)

        r_d, _ = S._dyn_ptp_residuals(state)
        m_d = state.d_valid & (state.d_obj >= 0)[:, None]
        e_d = jnp.linalg.norm(r_d / state.d_sig, axis=-1)
        out["dynamic_point"] = _entry(e_d, m_d)

        r_t, _, _ = S._ternary_terms(state, onehot)
        m_t = S._ternary_mask(state, onehot)
        e_t = jnp.linalg.norm(r_t, axis=-1) / sig["ternary"]
        out["ternary"] = _entry(e_t, m_t)

        H_prev = jnp.concatenate([state.H[:, :1], state.H[:, :-1]], axis=1)
        eye4 = jnp.broadcast_to(jnp.eye(4, dtype=dtype), state.H.shape)
        r_sm = factors.between_residual(H_prev, state.H, eye4)
        m_sm = S._smooth_mask(state, cfg)
        e_sm = jnp.linalg.norm(r_sm / sig["smooth"], axis=-1)
        out["smoothing"] = _entry(e_sm, m_sm)
        odom_mask = S._odom_mask(state)

    X_prev = jnp.concatenate([state.X[:1], state.X[:-1]], axis=0)
    r_o = factors.between_residual(X_prev, state.X, state.odom)
    e_o = jnp.linalg.norm(r_o / sig["odom"], axis=-1)
    out["odometry"] = _entry(e_o, odom_mask)

    r_p = factors.prior_residual(state.X[0], state.X0_prior) / sig["prior0"]
    out["gauge_prior"] = {
        "count": float(~state.prior_valid),
        "chi2": float(
            (~state.prior_valid) * jnp.sum(0.5 * r_p * r_p)
        ),
    }
    dx_lin = _prior_dx(state, hybrid)
    r_mp = state.prior_b + state.prior_L @ dx_lin
    out["marginal_prior"] = {
        "count": float(state.prior_valid),
        "chi2": float(state.prior_valid * jnp.sum(0.5 * r_mp * r_mp)),
    }
    return out


def _prior_dx(state, hybrid):
    if hybrid:
        from dynosam_tpu.backend.hybrid import _prior_dx as f
    else:
        from dynosam_tpu.backend.solver import _prior_dx as f
    return f(state)


def _entry(e, mask) -> Dict[str, float]:
    m = jnp.asarray(mask)
    return {
        "count": float(jnp.sum(m)),
        "chi2": float(jnp.sum(jnp.where(m, 0.5 * e * e, 0.0))),
    }


def sparsity_stats(S: np.ndarray, tol: float = 0.0) -> Dict[str, float]:
    """SparsityStats role (FactorGraphTools.hpp:313-360): dimensions, nnz,
    fill ratio of a (reduced) Hessian / information matrix."""
    A = np.asarray(S)
    nnz = int(np.sum(np.abs(A) > tol))
    return {
        "rows": int(A.shape[0]),
        "cols": int(A.shape[1]),
        "nnz": nnz,
        "fill": nnz / max(A.size, 1),
    }


def save_sparsity_png(S: np.ndarray, path: str, tol: float = 0.0) -> None:
    """Sparsity-pattern image (the cv::Mat the reference draws for R factors
    / block Jacobians, FactorGraphTools.hpp:438-533)."""
    from PIL import Image

    A = (np.abs(np.asarray(S)) > tol).astype(np.uint8) * 255
    Image.fromarray(255 - A, mode="L").save(path)


def export_graph_json(
    state: GraphState, cfg: BackendParams, path: str, hybrid: bool = False
) -> dict:
    """Graph-structure export (the dot/graph-file role): active window
    summary — variables, per-type factor counts, per-object observation
    tallies — as JSON."""
    n = int(state.num_frames)
    obj_ids = np.asarray(state.obj_ids)
    d_obj = np.asarray(state.d_obj)
    d_valid = np.asarray(state.d_valid)
    per_object = {}
    for j, oid in enumerate(obj_ids):
        if oid <= 0:
            continue
        sel = d_obj == j
        per_object[int(oid)] = {
            "tracklets": int(sel.sum()),
            "observations": int(d_valid[sel].sum()),
        }
    doc = {
        "frames": n,
        "frame_ids": [int(v) for v in np.asarray(state.frame_ids)[:n]],
        "static_landmarks": int(np.asarray(state.s_valid).any(axis=0).sum()),
        "objects": per_object,
        "factors": {
            k: v["count"]
            for k, v in error_breakdown(state, cfg, hybrid).items()
        },
        "errors": {
            k: v["chi2"]
            for k, v in error_breakdown(state, cfg, hybrid).items()
        },
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    return doc
