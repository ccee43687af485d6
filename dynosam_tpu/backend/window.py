"""Sliding-window advance with Schur-complement marginal priors.

TPU-native analogue of the reference's SlidingWindowOptimization
(/root/reference/dynosam_opt/include/dynosam_opt/SlidingWindowOptimization.hpp:
43-101: optimize window, marginalize out-of-window keys into prior factors via
CalculateMarginalFactors / EliminatePreferCholesky) and of the fixed-lag
behaviour used by ParallelHybrid's static smoother.

When the window is full, `advance`:
  1. linearises the *departing* factor set — everything that references frame
     slot 0: PTP observations at slot 0, the ternary factors (0 -> 1), the
     odometry factor (0, 1), the smoothing factors (H_{j,0}, H_{j,1}), the
     gauge prior, and the previous marginal prior;
  2. eliminates the departing variables {X_0, H_{:,0}, m_{:,0}} with a Schur
     complement, producing a dense prior over the remaining (pose, motion)
     tangent;
  3. rolls every frame-indexed table left by one slot and re-indexes the
     prior to the new layout.

Approximation (documented deviation from GTSAM's exact marginal): dynamic
points m_{i,1} that the departing ternary factors couple to are treated as
*fixed* at their current estimates during the marginalisation, so the prior
keeps the (X_1, H_{:,1}) information block instead of storing point-coupled
prior terms. This is slightly over-confident for H_{:,1} (whose own ternary
factors left the window) and is the standard trade made by fixed-lag VIO
systems that keep priors pose-sized; accuracy impact is measured in
tests/test_backend.py against full-batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.backend import factors
from dynosam_tpu.backend.graph import GraphState
from dynosam_tpu.backend.solver import _EPS_REG, _prior_dx, _sigmas
from dynosam_tpu.config import BackendParams
from dynosam_tpu.utils import lie


def _block_selectors(offsets, D: int, dtype):
    """(J, 6, D) constant one-hot selectors: row r of selector j picks
    tangent index offsets[j] + r. Static offsets -> constant-folded by XLA;
    block placement becomes MXU matmuls instead of J scattered dynamic
    updates (whose program size would scale with J)."""
    offsets = np.asarray(offsets)
    J = offsets.shape[0]
    S = np.zeros((J, 6, D), np.float32)
    rows = np.repeat(np.arange(J), 6)
    cols = (offsets[:, None] + np.arange(6)[None, :]).reshape(-1)
    S[rows, np.tile(np.arange(6), J), cols] = 1.0
    return jnp.asarray(S, dtype)


def _place_blocks(M, g, S_row, S_col, B, gb=None):
    """M += sum_j S_row[j]^T B[j] S_col[j]; g += sum_j S_row[j]^T gb[j]."""
    M = M + lie.einsum("jad,jab,jbe->de", S_row, B, S_col)
    if gb is not None:
        g = g + lie.einsum("jad,ja->d", S_row, gb)
    return M, g


def _departing_information(state: GraphState, cfg: BackendParams):
    """Dense (D, D) Hessian + (D,) gradient of the departing factor set,
    with departing dynamic points m_{:,0} already Schur-eliminated and the
    coupled m_{:,1} held fixed (see module docstring)."""
    F, J, Ld = state.F, state.J, state.Ld
    D = state.D
    dtype = state.X.dtype
    sig = _sigmas(cfg, dtype)

    M = jnp.zeros((D, D), dtype)
    g = jnp.zeros((D,), dtype)

    # ---- per-tracklet: PTP(X_0, m_0) + ternary(m_0, m_1, H_{j,1}) --------
    X0 = state.X[0]
    R0 = lie.rotation(X0)
    m0 = state.md[:, 0]                                  # (Ld, 3)
    m1 = state.md[:, 1]
    z0 = state.d_z[:, 0]
    has_obj = state.d_obj >= 0
    iw_ptp = (state.d_valid[:, 0] & has_obj).astype(dtype)[:, None] / (
        state.d_sig[:, 0] ** 2
    )                                                     # (Ld, 3)

    j_idx = jnp.clip(state.d_obj, 0, J - 1)
    H1 = state.H[j_idx, 1]                                # (Ld, 4, 4)
    # ternary(0,1) active mask mirrors solver._ternary_mask at f=1
    Hv1 = state.H_valid[j_idx, 1]
    w_ter = (
        state.d_valid[:, 0] & state.d_valid[:, 1] & Hv1 & has_obj
    ).astype(dtype) / (sig["ternary"] ** 2)

    # PTP residual/Jacobians at slot 0
    y0 = lie.transform_points(lie.inverse(X0), m0)
    r_ptp = y0 - z0
    eye3 = jnp.eye(3, dtype=dtype)
    Jx0 = jnp.concatenate(
        [lie.hat(y0), -jnp.broadcast_to(eye3, lie.hat(y0).shape)], axis=-1
    )                                                     # (Ld, 3, 6)
    Jp_ptp = jnp.swapaxes(R0, -1, -2)                     # (3, 3), same all tracklets

    # ternary residual/Jacobians with m1 fixed
    r_ter = m1 - lie.transform_points(H1, m0)
    RH = lie.rotation(H1)
    Jm0_ter = -RH                                         # (Ld, 3, 3)
    JH_ter = jnp.concatenate([lie.mm(RH, lie.hat(m0)), -RH], axis=-1)  # (Ld,3,6)

    # per-tracklet elimination of m_0 (full 3x3 blocks):
    # Hpp = R0 diag(iw) R0^T + w_ter I + eps
    from dynosam_tpu.ops import block_tridiag as bt

    hpp = (
        lie.einsum("ab,lb,cb->lac", R0, iw_ptp, R0)
        + (w_ter + _EPS_REG)[:, None, None] * eye3
    )
    inv_hpp = bt.inv3(hpp)                                # (Ld, 3, 3)
    # gradients
    g_m0 = lie.einsum("ab,lb->la", R0, iw_ptp * r_ptp) + w_ter[
        :, None
    ] * lie.einsum("lba,lb->la", Jm0_ter, r_ter)
    # cross blocks (var row, m0 col): X0 from PTP, H1 from ternary
    C_x0 = lie.einsum("lba,lb,bc->lac", Jx0, iw_ptp, Jp_ptp)  # (Ld, 6, 3)
    C_h1 = w_ter[:, None, None] * lie.einsum("lba,lbc->lac", JH_ter, Jm0_ter)

    # direct blocks
    H_x0x0 = lie.einsum("lba,lb,lbc->ac", Jx0, iw_ptp, Jx0)         # (6,6)
    g_x0 = lie.einsum("lba,lb->a", Jx0, iw_ptp * r_ptp)
    H_h1h1 = lie.einsum("lba,l,lbc->lac", JH_ter, w_ter, JH_ter)    # (Ld,6,6)
    g_h1 = lie.einsum("lba,l,lb->la", JH_ter, w_ter, r_ter)

    # Schur corrections after eliminating m0:
    S_x0x0 = lie.einsum("lab,lbc,ldc->ad", C_x0, inv_hpp, C_x0)
    S_x0h1 = lie.einsum("lab,lbc,ldc->lad", C_x0, inv_hpp, C_h1)    # (Ld,6,6)
    S_h1h1 = lie.einsum("lab,lbc,ldc->lad", C_h1, inv_hpp, C_h1)
    gs_x0 = lie.einsum("lab,lbc,lc->a", C_x0, inv_hpp, g_m0)
    gs_h1 = lie.einsum("lab,lbc,lc->la", C_h1, inv_hpp, g_m0)

    # scatter into dense M over the reduced tangent
    M = M.at[:6, :6].add(H_x0x0 - S_x0x0)
    g = g.at[:6].add(g_x0 - gs_x0)

    seg = jnp.where(has_obj, state.d_obj, J)
    H_h1h1_obj = jax.ops.segment_sum(
        H_h1h1 - S_h1h1, seg, num_segments=J + 1
    )[:J]                                                 # (J,6,6)
    g_h1_obj = jax.ops.segment_sum(g_h1 - gs_h1, seg, num_segments=J + 1)[:J]
    S_x0h1_obj = jax.ops.segment_sum(S_x0h1, seg, num_segments=J + 1)[:J]

    off0 = 6 * F
    S1 = _block_selectors(
        [off0 + 6 * (j * F + 1) for j in range(J)], D, dtype
    )                                                     # H_{j,1} selectors
    M, g = _place_blocks(M, g, S1, S1, H_h1h1_obj, g_h1_obj)
    cross = lie.einsum("jab,jbd->ad", -S_x0h1_obj, S1)    # (6, D)
    M = M.at[:6, :].add(cross)
    M = M.at[:, :6].add(cross.T)

    # ---- odometry(0, 1) ---------------------------------------------------
    if cfg.use_vo_factor:
        r_o = factors.between_residual(state.X[0], state.X[1], state.odom[1])
        J_A, J_B = factors.between_jacobians(state.X[0], state.X[1], state.odom[1])
        active = (state.odom_valid[1] & (state.num_frames > 1)).astype(dtype)
        wv = active / sig["odom"] ** 2                    # (6,) per-dim info
        JAw = jnp.swapaxes(J_A, -1, -2) * wv
        JBw = jnp.swapaxes(J_B, -1, -2) * wv
        M = M.at[:6, :6].add(JAw @ J_A)
        M = M.at[6:12, 6:12].add(JBw @ J_B)
        M = M.at[:6, 6:12].add(JAw @ J_B)
        M = M.at[6:12, :6].add((JAw @ J_B).T)
        g = g.at[:6].add(JAw @ r_o)
        g = g.at[6:12].add(JBw @ r_o)

    # ---- smoothing (H_{j,0}, H_{j,1}) --------------------------------------
    if cfg.use_smoothing_factor:
        sm_mask = (state.H_valid[:, 0] & state.H_valid[:, 1]).astype(dtype)
        eye4 = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (J, 4, 4))
        r_m = factors.between_residual(state.H[:, 0], state.H[:, 1], eye4)
        J_Am, J_Bm = factors.between_jacobians(state.H[:, 0], state.H[:, 1], eye4)
        w_sm = sm_mask[:, None] / sig["smooth"] ** 2      # (J, 6)
        JAw = jnp.swapaxes(J_Am, -1, -2) * w_sm[:, None, :]
        JBw = jnp.swapaxes(J_Bm, -1, -2) * w_sm[:, None, :]
        S0 = _block_selectors([off0 + 6 * (j * F) for j in range(J)], D, dtype)
        M, g = _place_blocks(M, g, S0, S0, lie.mm(JAw, J_Am), lie.einsum("jab,jb->ja", JAw, r_m))
        M, g = _place_blocks(M, g, S1, S1, lie.mm(JBw, J_Bm), lie.einsum("jab,jb->ja", JBw, r_m))
        M, _ = _place_blocks(M, g, S0, S1, lie.mm(JAw, J_Bm))
        M, _ = _place_blocks(M, g, S1, S0, jnp.swapaxes(lie.mm(JAw, J_Bm), -1, -2))

    # ---- gauge prior on X_0 (active only before the first marginalisation)
    gauge_on = (~state.prior_valid).astype(dtype)
    r_p = factors.prior_residual(state.X[0], state.X0_prior)
    J_p = factors.prior_jacobian(state.X[0], state.X0_prior)
    w_p = gauge_on / sig["prior0"] ** 2
    M = M.at[:6, :6].add(w_p * (jnp.swapaxes(J_p, -1, -2) @ J_p))
    g = g.at[:6].add(w_p * (jnp.swapaxes(J_p, -1, -2) @ r_p))

    # ---- previous marginal prior -------------------------------------------
    dx_lin = _prior_dx(state)
    r_mp = state.prior_b + state.prior_L @ dx_lin
    pv = state.prior_valid.astype(dtype)
    M = M + pv * lie.mm(state.prior_L.T, state.prior_L)
    g = g + pv * (state.prior_L.T @ r_mp)

    return M, g


def _departing_indices(F: int, J: int):
    """Tangent indices of {X_0, H_{:,0}} in the old layout (static numpy)."""
    idx = [np.arange(6)]
    off0 = 6 * F
    for j in range(J):
        o = off0 + 6 * (j * F)
        idx.append(np.arange(o, o + 6))
    return np.concatenate(idx)


def _remaining_old_for_new(F: int, J: int):
    """old tangent index feeding each new tangent index; -1 for fresh slots.
    Static numpy (used to build constant permutation matrices)."""
    out = -np.ones((6 * F + 6 * J * F,), np.int64)
    # poses: new f <- old f+1 for f < F-1
    for f in range(F - 1):
        out[6 * f : 6 * f + 6] = np.arange(6 * (f + 1), 6 * (f + 1) + 6)
    off0 = 6 * F
    for j in range(J):
        for f in range(F - 1):
            new_o = off0 + 6 * (j * F + f)
            old_o = off0 + 6 * (j * F + f + 1)
            out[new_o : new_o + 6] = np.arange(old_o, old_o + 6)
    return out


def advance(state: GraphState, cfg: BackendParams) -> GraphState:
    """Marginalise frame slot 0 and roll the window left by one. Jittable."""
    M, g = _departing_information(state, cfg)
    return _eliminate_and_roll(state, cfg, M, g)


# ---------------------------------------------------------------------------
# Hybrid-formulation advance
# ---------------------------------------------------------------------------

def _departing_information_hybrid(state: GraphState, cfg: BackendParams):
    """Departing-factor Hessian/gradient for the hybrid formulation.

    Leaving factors touching {X_0, H_{:,0}}: the slot-0 observation factors
    (X_0, H_{j,0}, m_L) with m_L held fixed at its estimate (same
    conservative treatment as the WCME advance), the straddling
    constant-motion smoothing ternary (H_0, H_1, H_2), the odometry factor
    (0, 1), the gauge prior, and the previous marginal prior. Keeping the
    straddling ternary is what carries the constant-motion information of
    the departing motion into the prior — dropping it (round 1) cost
    incremental mode 2-3x object accuracy vs full batch.
    """
    from dynosam_tpu.backend import hybrid as hyb

    F, J, Ld = state.F, state.J, state.Ld
    D = state.D
    dtype = state.X.dtype
    sig = _sigmas(cfg, dtype)

    M = jnp.zeros((D, D), dtype)
    g = jnp.zeros((D,), dtype)

    onehot = hyb._object_onehot(state, dtype)
    r_h, y_h, q, RH = hyb._hybrid_obs_terms(state, onehot)
    mask = hyb._obs_mask(state, onehot)

    eye3 = jnp.eye(3, dtype=dtype)
    y0 = y_h[:, 0]
    Jx = jnp.concatenate(
        [lie.hat(y0), -jnp.broadcast_to(eye3, lie.hat(y0).shape)], axis=-1
    )                                                          # (Ld,3,6)
    R0 = lie.rotation(state.X[0])
    RtRH = lie.einsum("ba,lbc->lac", R0, RH[:, 0])
    hvar = hyb._h_is_variable(state, onehot)[:, 0].astype(dtype)
    Jh = jnp.concatenate([-lie.mm(RtRH, lie.hat(q)), RtRH], axis=-1) * hvar[
        :, None, None
    ]

    # Matrix observation weights with FIRST-ORDER POINT UNCERTAINTY: the
    # departing factors reference the surviving embedded points m_L; holding
    # them at their estimates (round 1) made the marginal prior over-
    # confident (incremental/sliding 2-3x worse than batch). Instead treat
    # m_L ~ N(m_hat, Sigma_m) with Sigma_m from the full-window point
    # Hessian (diagonal 3x3 blocks, same quantity the solver's Schur uses)
    # and inflate each slot-0 observation's noise:
    #   C_l = diag(sigma_l^2) + J_m Sigma_m J_m^T,   W_l = C_l^{-1}.
    if cfg.marginal_point_uncertainty:
        from dynosam_tpu.ops import block_tridiag as bt

        iw_full = mask.astype(dtype)[..., None] / (state.d_sig ** 2)
        RtRH_all = lie.einsum("fba,lfbc->lfac", lie.rotation(state.X), RH)
        Lj_R = lie.einsum("lj,jab->lab", onehot, lie.rotation(state.L_e))
        assigned = jnp.sum(onehot, axis=1) > 0.5
        Lj_R = jnp.where(assigned[:, None, None], Lj_R, eye3)
        Jm_all = lie.einsum("lfab,lbc->lfac", RtRH_all, Lj_R)
        Hpp = lie.einsum("lfba,lfb,lfbc->lac", Jm_all, iw_full, Jm_all) + (
            _EPS_REG * eye3
        )
        Sigma_m = bt.inv3(Hpp)                                # (Ld, 3, 3)
        Jm0 = Jm_all[:, 0]
        C = (state.d_sig[:, 0] ** 2)[:, :, None] * eye3 + lie.mm(
            lie.mm(Jm0, Sigma_m), jnp.swapaxes(Jm0, -1, -2)
        )
        W = bt.inv3(C) * mask[:, 0].astype(dtype)[:, None, None]  # (Ld,3,3)
    else:
        W = (
            mask[:, 0].astype(dtype)[:, None]
            / (state.d_sig[:, 0] ** 2)
        )[..., None] * eye3

    r0 = r_h[:, 0]
    H_xx = lie.einsum("lba,lbc,lcd->ad", Jx, W, Jx)
    g_x = lie.einsum("lba,lbc,lc->a", Jx, W, r0)
    H_hh = lie.einsum("lba,lbc,lcd->lad", Jh, W, Jh)
    g_h = lie.einsum("lba,lbc,lc->la", Jh, W, r0)
    H_xh = lie.einsum("lba,lbc,lcd->lad", Jx, W, Jh)
    H_hh_obj = lie.einsum("lac,lj->jac", H_hh, onehot)
    g_h_obj = lie.einsum("la,lj->ja", g_h, onehot)
    H_xh_obj = lie.einsum("lac,lj->jac", H_xh, onehot)

    M = M.at[:6, :6].add(H_xx)
    g = g.at[:6].add(g_x)
    off0 = 6 * F
    S_f = [
        _block_selectors(
            [off0 + 6 * (j * F + f) for j in range(J)], D, dtype
        )
        for f in range(3)
    ]                                                      # slot 0/1/2 selectors
    M, g = _place_blocks(M, g, S_f[0], S_f[0], H_hh_obj, g_h_obj)
    cross = lie.einsum("jab,jbd->ad", H_xh_obj, S_f[0])    # (6, D)
    M = M.at[:6, :].add(cross)
    M = M.at[:, :6].add(cross.T)

    # straddling constant-motion smoothing ternary: factor at f=2 couples
    # (H_0, H_1, H_2) — the only smoothing factor referencing the departing
    # H_{:,0} (the f=1 factor needs slot -1 and is never active)
    if cfg.use_smoothing_factor:
        r_sm, J_A, J_B, J_C = hyb._smooth_triple_terms(state)
        sm_w = hyb._smooth_triple_mask(state, cfg)[:, 2].astype(dtype)[
            :, None
        ] / (sig["smooth"] ** 2)                               # (J, 6)
        rA = r_sm[:, 2]                                        # (J, 6)
        Js = (J_A[:, 2], J_B[:, 2], J_C[:, 2])                 # slots 0,1,2
        Jws = tuple(jnp.swapaxes(Jk, -1, -2) * sm_w[:, None, :] for Jk in Js)
        for a in range(3):
            M, g = _place_blocks(
                M, g, S_f[a], S_f[a], lie.mm(Jws[a], Js[a]),
                lie.einsum("jab,jb->ja", Jws[a], rA),
            )
            for b in range(3):
                if a == b:
                    continue
                M, _ = _place_blocks(M, g, S_f[a], S_f[b], lie.mm(Jws[a], Js[b]))

    # odometry(0, 1)
    if cfg.use_vo_factor:
        r_o = factors.between_residual(state.X[0], state.X[1], state.odom[1])
        J_A, J_B = factors.between_jacobians(
            state.X[0], state.X[1], state.odom[1], r=r_o
        )
        active = (state.odom_valid[1] & (state.num_frames > 1)).astype(dtype)
        wv = active / sig["odom"] ** 2
        JAw = jnp.swapaxes(J_A, -1, -2) * wv
        JBw = jnp.swapaxes(J_B, -1, -2) * wv
        M = M.at[:6, :6].add(JAw @ J_A)
        M = M.at[6:12, 6:12].add(JBw @ J_B)
        M = M.at[:6, 6:12].add(JAw @ J_B)
        M = M.at[6:12, :6].add((JAw @ J_B).T)
        g = g.at[:6].add(JAw @ r_o)
        g = g.at[6:12].add(JBw @ r_o)

    # gauge prior
    gauge_on = (~state.prior_valid).astype(dtype)
    r_p = factors.prior_residual(state.X[0], state.X0_prior)
    J_p = factors.prior_jacobian(state.X[0], state.X0_prior, r=r_p)
    w_p = gauge_on / sig["prior0"] ** 2
    M = M.at[:6, :6].add(w_p * (jnp.swapaxes(J_p, -1, -2) @ J_p))
    g = g.at[:6].add(w_p * (jnp.swapaxes(J_p, -1, -2) @ r_p))

    # previous marginal prior
    dx_lin = _prior_dx(state)
    r_mp = state.prior_b + state.prior_L @ dx_lin
    pv = state.prior_valid.astype(dtype)
    M = M + pv * lie.mm(state.prior_L.T, state.prior_L)
    g = g + pv * (state.prior_L.T @ r_mp)
    return M, g


def _eliminate_and_roll(state: GraphState, cfg: BackendParams, M, g):
    """Shared second half of advance: Schur out {X_0, H_{:,0}}, re-index the
    prior to the rolled layout, and roll all frame-indexed tables.

    All index selections use constant one-hot matrices contracted on the MXU
    — fancy-index gathers/scatters on (D, D) arrays are latency traps on TPU.
    """
    F, J = state.F, state.J
    D = state.D
    dtype = state.X.dtype

    # float32 hygiene: M is assembled from many einsum paths whose rounding
    # differs above/below the diagonal (1-ulp asymmetry at 1e8-scale gauge
    # entries is enough to break Cholesky downstream) — symmetrize first
    M = 0.5 * (M + M.T)

    dep = np.asarray(_departing_indices(F, J))            # static
    nd = dep.shape[0]
    keep = np.setdiff1d(np.arange(D), dep)
    P_d = jnp.zeros((nd, D), dtype).at[jnp.arange(nd), dep].set(1.0)
    P_r = jnp.zeros((D - nd, D), dtype).at[jnp.arange(D - nd), keep].set(1.0)

    # Permute to [departing; keep] ordering (one-hot matmuls on the MXU).
    P_full = jnp.concatenate([P_d, P_r], axis=0)          # (D, D)
    M_perm = lie.mm(lie.mm(P_full, M), P_full.T)
    g_perm = P_full @ g

    # Diagonal hygiene before factorization: the departing block gets the
    # elimination regularizer _EPS_REG (jittered elimination of the departing
    # block — a spectrum-clamped pseudo-inverse was tried for rank-deficient
    # departures and REVERTED: on HEALTHY streams it quadrupled camera drift,
    # 3.9 -> 15.5 cm on the 8-frame simulator A/B; the small absolute jitter
    # is statistically benign and the degenerate-object stream stays within
    # 2.5 cm of the healthy one, tests/test_degenerate.py). DEAD directions
    # (structurally unused object slots: zero rows) get a tiny relative
    # floor — spurious information ~1e-6 of the dominant diagonal, only on
    # directions carrying NO real information.
    diag0 = jnp.diagonal(M_perm)
    max_d = jnp.maximum(jnp.max(diag0), 1.0)
    dead = diag0 <= 1e-10 * max_d
    reg = jnp.where(dead, 1e-6 * max_d, 0.0) + jnp.where(
        jnp.arange(D) < nd, _EPS_REG, 0.0
    )
    M_perm = M_perm + jnp.diag(reg)

    # re-index to the rolled layout: new = P_map @ keep-space
    old_of_new = np.asarray(_remaining_old_for_new(F, J))  # static
    keep_pos = -np.ones(D, np.int64)
    keep_pos[keep] = np.arange(D - nd)
    rows = np.nonzero(old_of_new >= 0)[0]
    cols = keep_pos[old_of_new[rows]]
    ok = cols >= 0
    P_map = (
        jnp.zeros((D, D - nd), dtype)
        .at[jnp.asarray(rows[ok]), jnp.asarray(cols[ok])]
        .set(1.0)
    )

    # Float32-safe marginalization WITHOUT an explicit Schur complement.
    # History of this code path (each step measured on the driver bench):
    #   * round 3 Cholesky'd the rolled-layout H_new, whose fresh slots are
    #     structurally zero rows -> NaN on EVERY advance -> the O(D^3) eigh
    #     fallback ran per frame (0/20 chol_ok, ~11 ms/advance at D=540,
    #     scripts/probe_advance.py — the bulk of BENCH_r03's 45 FPS);
    #   * Cholesky of the EXPLICIT keep-space Schur complement
    #     M_rr - M_dr^T M_dd^-1 M_dr still failed 19/20: float32
    #     cancellation in the subtraction leaves negative eigenvalues at
    #     ~3e-4 of the spectrum radius (scripts/probe_spectrum.py: min eig
    #     -9.0 vs max 2.7e4) — no diagonal jitter short of accuracy-breaking
    #     magnitudes repairs a matrix that is already indefinite.
    # The fix: factor the FULL permuted information matrix once,
    #   chol([[M_dd, M_dr], [M_rd, M_rr]]) = [[L11, 0], [L21, L22]],
    # and use the identity  Schur(M_dd) == L22 @ L22.T — the marginal prior
    # square root is L22^T DIRECTLY, PSD by construction, no subtraction to
    # cancel. Equilibrate first (M = S Mn S, S = diag sqrt(diag)): the
    # Cholesky then runs on the correlation matrix, so pivot breakdown
    # depends on conditioning, not on the 1e8-scale spread between gauge and
    # pixel information. chol(S Mn S) = S chol(Mn) exactly (S diagonal).
    # The tiny unit-diagonal jitter adds 1e-5 of each direction's OWN
    # information — NOT the reverted max-diagonal jitter, which put up to
    # ~100% spurious information on weakly-informed directions.
    # Rare path: if the factorization still breaks down (genuinely
    # rank-deficient window), lax.cond runs the exact PSD-projected
    # eigendecomposition of the explicit Schur complement; cond executes
    # only the taken branch, so the O(D^3) eigh costs nothing on healthy
    # advances.
    s_eq = jnp.sqrt(jnp.diagonal(M_perm))
    Mn = M_perm / (s_eq[:, None] * s_eq[None, :])
    Mn = Mn + 1e-5 * jnp.eye(D, dtype=dtype)
    Ln = jnp.linalg.cholesky(Mn)
    chol_ok = jnp.isfinite(Ln).all()
    L_full = s_eq[:, None] * Ln

    def _chol_sqrt(_):
        L11 = L_full[:nd, :nd]
        L21 = L_full[nd:, :nd]
        L22 = L_full[nd:, nd:]
        b1 = jax.scipy.linalg.solve_triangular(L11, g_perm[:nd], lower=True)
        b0 = jax.scipy.linalg.solve_triangular(
            L22, g_perm[nd:] - L21 @ b1, lower=True
        )
        return jnp.swapaxes(L22, -1, -2), b0

    def _eigh_sqrt(_):
        L_dd = jnp.linalg.cholesky(M_perm[:nd, :nd])  # _EPS_REG already added
        sol = jax.scipy.linalg.cho_solve(
            (L_dd, True),
            jnp.concatenate([M_perm[:nd, nd:], g_perm[:nd, None]], axis=1),
        )
        H_keep = M_perm[nd:, nd:] - M_perm[:nd, nd:].T @ sol[:, :-1]
        g_mk = g_perm[nd:] - M_perm[:nd, nd:].T @ sol[:, -1]
        H_keep = 0.5 * (H_keep + H_keep.T)
        w_eig, V = jnp.linalg.eigh(H_keep)
        floor = 1e-8 * jnp.maximum(jnp.max(w_eig), 1.0)
        informative = w_eig > floor
        w_cl = jnp.where(informative, w_eig, floor)
        Lp = jnp.sqrt(w_cl)[:, None] * V.T                 # L^T L = H_psd
        bp = jnp.where(informative, (V.T @ g_mk) / jnp.sqrt(w_cl), 0.0)
        return Lp, bp

    L_red, b_red = jax.lax.cond(chol_ok, _chol_sqrt, _eigh_sqrt, operand=None)
    # Re-index the sqrt factor to the rolled layout: rows stay in keep-space
    # (padded with nd zero rows to keep the (D, D) contract), columns map
    # keep -> new via P_map^T; prior_L^T prior_L == P_map H_keep P_map^T.
    prior_L = jnp.concatenate(
        [lie.mm(L_red, P_map.T), jnp.zeros((nd, D), dtype)], axis=0
    )
    b = jnp.concatenate([b_red, jnp.zeros((nd,), dtype)])

    def roll0(x):
        return jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)

    def roll1(x):
        return jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)

    X = jnp.concatenate([state.X[1:], state.X[-1:]], axis=0)
    H = jnp.concatenate([state.H[:, 1:], state.H[:, -1:]], axis=1)
    md = jnp.concatenate([state.md[:, 1:], state.md[:, -1:] * 0], axis=1)

    return state.replace(
        X=X,
        H=H,
        md=md,
        frame_ids=jnp.concatenate(
            [state.frame_ids[1:], jnp.full((1,), -1, jnp.int32)]
        ),
        num_frames=state.num_frames - 1,
        H_valid=roll1(state.H_valid),
        s_z=roll0(state.s_z),
        s_valid=roll0(state.s_valid),
        d_z=roll1(state.d_z),
        d_valid=roll1(state.d_valid),
        s_sig=roll0(state.s_sig),
        d_sig=roll1(state.d_sig),
        odom=jnp.concatenate([state.odom[1:], state.odom[-1:]], axis=0),
        odom_valid=roll0(state.odom_valid),
        kf_slot=jnp.maximum(state.kf_slot - 1, -1),
        prior_L=prior_L,
        prior_b=b,
        prior_lin_X=X,
        prior_lin_H=H,
        prior_valid=jnp.array(True),
    )


def advance_hybrid(state: GraphState, cfg: BackendParams) -> GraphState:
    """Hybrid-formulation window advance (marginalise + roll). Jittable.

    Design note — why there is NO keyframe re-anchoring here. The reference
    re-keyframes per object when an anchor ages out
    (/root/reference/dynosam/include/dynosam/backend/rgbd/HybridEstimator.hpp:
    1154-1177 KeyFrameData ranges) because its per-object iSAM2 needs the
    keyframe VARIABLE in the active graph. In this formulation the embedded
    keyframe pose L_e is a CONSTANT (never optimized) and the per-tracklet
    points m_L live in its frame, so the observation factors
    r = X_k^{-1} H_{e,k} L_e m_L - Z_k stay well-defined for arbitrarily old
    e — the anchor sliding out of the window costs nothing. When kf_slot
    reaches -1 every in-window H_{e,k} is a free variable and the marginal
    prior carries their coupling. An explicit re-anchoring reparameterisation
    (H -> H C, L_e -> H_1 L_e, prior congruence-transformed by Ad(C)) was
    tried and REJECTED: measured on the 30-frame two-object scenario it
    compounds rotation error ~1.3x per advance for rotating objects (0.207
    rad RMS vs 0.003 without), because C = H_{e,1}^{-1} picks up the
    formulation's free gauge mode (obs Jacobians are zeroed at the kf slot,
    so smoothing drifts all H jointly while the eliminated points absorb the
    common factor) and bakes it into the prior at every advance. Known trade
    of keeping e fixed: the hat(q) lever arm in the H-Jacobian grows with
    object travel from its first observation; bounded by windowed object
    lifetimes at the horizons we run (<= a few hundred frames).

    Slot recycling: after the roll, an object slot with no in-window motion
    variables, no in-window keyframe, and no live tracklet referencing it is
    FREED (obj_ids=-1, re-opened) — finished epochs (slot_open=False after a
    re-entry break, graph.py) and long-departed objects stop occupying the
    padded J axis, so sequences with many more than J concurrent+historic
    objects (KITTI 0020 carries >30) run at J = max *concurrent* objects."""
    M, g = _departing_information_hybrid(state, cfg)
    state = _eliminate_and_roll(state, cfg, M, g)
    obs_any = jnp.any(state.d_valid, axis=1)                  # (Ld,)
    ref = (
        jax.ops.segment_sum(
            obs_any.astype(jnp.int32),
            jnp.where(state.d_obj >= 0, state.d_obj, state.J),
            num_segments=state.J + 1,
        )[: state.J]
        > 0
    )
    live = jnp.any(state.H_valid, axis=1) | (
        state.kf_valid & (state.kf_slot >= 0)
    ) | ref
    free = (state.obj_ids > 0) & ~live
    return state.replace(
        obj_ids=jnp.where(free, -1, state.obj_ids),
        kf_valid=state.kf_valid & ~free,
        kf_slot=jnp.where(free, -1, state.kf_slot),
        slot_open=state.slot_open | free,
    )


# ---------------------------------------------------------------------------
# WCPE-formulation advance
# ---------------------------------------------------------------------------

def _departing_information_wcpe(state: GraphState, cfg: BackendParams):
    """Departing-factor information for the world-centric POSE formulation:
    the slot-(0,1) motion-pose factors (points held fixed) give a coupled
    (L_0, L_1) block per object; plus odometry(0,1), the gauge prior, and
    the previous marginal prior."""
    from dynosam_tpu.backend import wcpe as wp
    from dynosam_tpu.backend.solver import _object_onehot

    F, J = state.F, state.J
    D = state.D
    dtype = state.X.dtype
    sig = _sigmas(cfg, dtype)

    M = jnp.zeros((D, D), dtype)
    g = jnp.zeros((D,), dtype)

    onehot = _object_onehot(state, dtype)
    r_t, RG, J_L = wp._pose_chain_terms(state, onehot)
    mask = wp._pose_chain_mask(state, onehot)
    w = mask[:, 1].astype(dtype) / (sig["ternary"] ** 2)      # factor at f=1

    JL1 = J_L[:, 1]                                           # (Ld, 3, 6)
    r1 = r_t[:, 1]
    H11 = lie.einsum("lba,l,lbc->lac", JL1, w, JL1)           # (Ld,6,6)
    g1 = lie.einsum("lba,l,lb->la", JL1, w, r1)
    H11_obj = lie.einsum("lac,lj->jac", H11, onehot)
    g1_obj = lie.einsum("la,lj->ja", g1, onehot)

    off0 = 6 * F
    # J_{L_0} = -J_{L_1}: blocks (0,0)=H, (1,1)=H, (0,1)=(1,0)=-H
    S0 = _block_selectors([off0 + 6 * (j * F) for j in range(J)], D, dtype)
    S1 = _block_selectors([off0 + 6 * (j * F + 1) for j in range(J)], D, dtype)
    M, g = _place_blocks(M, g, S0, S0, H11_obj, -g1_obj)
    M, g = _place_blocks(M, g, S1, S1, H11_obj, g1_obj)
    M, _ = _place_blocks(M, g, S0, S1, -H11_obj)
    M, _ = _place_blocks(M, g, S1, S0, -H11_obj)

    if cfg.use_vo_factor:
        r_o = factors.between_residual(state.X[0], state.X[1], state.odom[1])
        J_A, J_B = factors.between_jacobians(
            state.X[0], state.X[1], state.odom[1], r=r_o
        )
        active = (state.odom_valid[1] & (state.num_frames > 1)).astype(dtype)
        wv = active / sig["odom"] ** 2
        JAw = jnp.swapaxes(J_A, -1, -2) * wv
        JBw = jnp.swapaxes(J_B, -1, -2) * wv
        M = M.at[:6, :6].add(JAw @ J_A)
        M = M.at[6:12, 6:12].add(JBw @ J_B)
        M = M.at[:6, 6:12].add(JAw @ J_B)
        M = M.at[6:12, :6].add((JAw @ J_B).T)
        g = g.at[:6].add(JAw @ r_o)
        g = g.at[6:12].add(JBw @ r_o)

    gauge_on = (~state.prior_valid).astype(dtype)
    r_p = factors.prior_residual(state.X[0], state.X0_prior)
    J_p = factors.prior_jacobian(state.X[0], state.X0_prior, r=r_p)
    w_p = gauge_on / sig["prior0"] ** 2
    M = M.at[:6, :6].add(w_p * (jnp.swapaxes(J_p, -1, -2) @ J_p))
    g = g.at[:6].add(w_p * (jnp.swapaxes(J_p, -1, -2) @ r_p))

    dx_lin = _prior_dx(state)
    r_mp = state.prior_b + state.prior_L @ dx_lin
    pv = state.prior_valid.astype(dtype)
    M = M + pv * lie.mm(state.prior_L.T, state.prior_L)
    g = g + pv * (state.prior_L.T @ r_mp)
    return M, g


def advance_wcpe(state: GraphState, cfg: BackendParams) -> GraphState:
    """WCPE window advance (marginalise + roll). Jittable."""
    M, g = _departing_information_wcpe(state, cfg)
    return _eliminate_and_roll(state, cfg, M, g)
