"""Object-centric keyframed ("Hybrid") formulation — RA-L 2025 parity.

Reimplements the reference's HybridFormulation / ParallelHybrid backend
(/root/reference/dynosam/include/dynosam/backend/rgbd/HybridEstimator.hpp,
factors/HybridFormulationFactors.hpp:42-122, ParallelHybridBackendModule.cc)
TPU-natively:

  * each object j carries a constant embedded keyframe pose L_e and keyframed
    world-frame motions ^W_eH_k (variables; H_{e,e} = I fixed);
  * each dynamic tracklet is ONE 3-dof point m_L in the embedded frame;
    every observation factor couples (X_k, ^W_eH_k, m_L) with residual
        r = X_k^{-1} ^W_eH_k L_e m_L - Z_k      (projectToCamera3 form);
  * point elimination is therefore a per-tracklet 3x3 *diagonal* Schur
    complement (the reference's SmartMotionFactor math,
    HybridEstimator.hpp:784) — no motion-ternary chains, which both matches
    the reference's "recommended for speed" mode and removes the
    block-tridiagonal solve from the hot path;
  * constant-motion smoothing becomes a *ternary* factor over consecutive
    keyframed motions: r = log(F2F_{k-1}^{-1} F2F_k) with
    F2F_k = H_{e,k} H_{e,k-1}^{-1}, closed-form Jacobians via exact SE(3)
    inverse left/right Jacobians (verified vs autodiff in tests);
  * the reference's per-object TBB parallelism (tbb::parallel_for_each,
    ParallelHybridBackendModule.cc:548) is a padded object axis in batched
    einsums, and the camera is solved jointly (strictly more information
    than the reference's decoupled static smoother).

F2F motions for output/eval: H_f2f(k) = H_{e,k} H_{e,k-1}^{-1}; object pose
L_k = H_{e,k} L_e.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynosam_tpu.backend import factors
from dynosam_tpu.backend.graph import GraphState
from dynosam_tpu.backend.solver import (
    _EPS_REG,
    _block_diag_embed,
    _chain_se3_blocks,
    _huber_rho,
    _irls_w,
    _object_onehot,
    _odom_mask,
    _prior_dx,
    _sigmas,
    _static_gate,
    _static_residuals,
)
from dynosam_tpu.config import BackendParams
from dynosam_tpu.ops import block_tridiag as bt
from dynosam_tpu.utils import lie


class _HybridLin(NamedTuple):
    S: jnp.ndarray
    rhs: jnp.ndarray
    Hpp_inv_s: jnp.ndarray  # (Ls, 3, 3)
    g_s: jnp.ndarray
    A_s: jnp.ndarray      # (F, Ls, 6, 3) static cross blocks
    Hpp_inv_d: jnp.ndarray  # (Ld, 3, 3) point Hessian inverses
    g_d: jnp.ndarray      # (Ld, 3)
    Ax_d: jnp.ndarray     # (Ld, F, 6, 3) pose cross blocks
    Ah_d: jnp.ndarray     # (Ld, F, 6, 3) motion cross blocks
    onehot: jnp.ndarray   # (Ld, J)


# ---------------------------------------------------------------------------
# Hybrid observation terms
# ---------------------------------------------------------------------------

def _hybrid_obs_terms(state: GraphState, onehot):
    """Per-(tracklet, frame) residuals + frames of reference.

    Returns (r (Ld,F,3), y (Ld,F,3) camera-frame predictions,
    q (Ld,3) world point at the keyframe, RH (Ld,F,3,3))."""
    Lj = lie.einsum("lj,jab->lab", onehot, state.L_e)        # (Ld,4,4)
    assigned = jnp.sum(onehot, axis=1) > 0.5
    eye4 = jnp.eye(4, dtype=state.X.dtype)
    Lj = jnp.where(assigned[:, None, None], Lj, eye4)
    q = lie.transform_points(Lj, state.m_hyb)                # (Ld, 3) world@kf
    Hj = lie.einsum("lj,jfab->lfab", onehot, state.H)        # (Ld,F,4,4)
    Hj = jnp.where(assigned[:, None, None, None], Hj, eye4)
    m_w = lie.transform_points(Hj, q[:, None, :])            # (Ld, F, 3)
    Xinv = lie.inverse(state.X)                              # (F,4,4)
    y = lie.transform_points(Xinv[None], m_w)
    r = y - state.d_z
    return r, y, q, lie.rotation(Hj)


def _obs_mask(state: GraphState, onehot):
    assigned = jnp.sum(onehot, axis=1) > 0.5
    kf_ok = lie.einsum(
        "lj,j->l", onehot, state.kf_valid.astype(onehot.dtype)
    ) > 0.5
    in_window = jnp.arange(state.F)[None, :] < state.num_frames
    # the motion state at (j, f) must either be a free variable or the
    # keyframe identity — observations at frames before the keyframe (or at
    # frames whose motion was gated out) have no consistent motion model.
    kf = lie.einsum("lj,j->l", onehot, state.kf_slot.astype(onehot.dtype))
    at_kf = jnp.arange(state.F)[None, :] == kf[:, None].astype(jnp.int32)
    h_ok = _h_is_variable(state, onehot) | at_kf
    return state.d_valid & assigned[:, None] & kf_ok[:, None] & in_window & h_ok


def _h_is_variable(state: GraphState, onehot):
    """(Ld, F) — the motion at (tracklet's object, f) is a free variable."""
    Hv = lie.einsum("lj,jf->lf", onehot, state.H_valid.astype(onehot.dtype)) > 0.5
    kf = lie.einsum("lj,j->l", onehot, state.kf_slot.astype(onehot.dtype))
    not_kf = jnp.arange(state.F)[None, :] != kf[:, None].astype(jnp.int32)
    return Hv & not_kf


def _smooth_triple_mask(state: GraphState, cfg: BackendParams):
    """(J, F) — ternary smoothing factor between slots (f-2, f-1, f)."""
    if not cfg.use_smoothing_factor:
        return jnp.zeros_like(state.H_valid)
    Hv = state.H_valid
    f = jnp.arange(state.F)[None, :]
    # NB: the keyframe-slot equality must exclude departed keyframes
    # (kf_slot == -1): at f=1 the comparison -1 == f-2 would otherwise turn
    # the factor on with jnp.roll wrap-around garbage in the H_{f-2} operand.
    exists_prev2 = jnp.concatenate(
        [jnp.zeros_like(Hv[:, :2]), Hv[:, :-2]], axis=1
    ) | ((state.kf_slot[:, None] == f - 2) & (state.kf_slot[:, None] >= 0)) | (
        (state.kf_slot[:, None] < 0) & (f >= 2)
    )
    valid_prev = jnp.concatenate([jnp.zeros_like(Hv[:, :1]), Hv[:, :-1]], axis=1)
    return Hv & valid_prev & exists_prev2 & state.kf_valid[:, None]


def _smooth_triple_terms(state: GraphState):
    """Residual + closed-form Jacobians of the constant-motion ternary.

    r_f = log(M), M = A B^{-1} C B^{-1} with A = H_{f-2}, B = H_{f-1},
    C = H_f (keyframed motions of one object). Right-perturbation Jacobians:
      J_A = Jl^{-1}(r) Ad(A),  J_C = Jr^{-1}(r) Ad(B),
      J_B = -(J_A + J_C).
    (A e^a = e^{Ad_A a} A gives the left-perturbed forms; both occurrences of
    B contribute, one from the left, one from the right.)
    """
    H = state.H                                             # (J, F, 4, 4)
    A = jnp.roll(H, 2, axis=1)
    B = jnp.roll(H, 1, axis=1)
    C = H
    Binv = lie.inverse(B)
    M = lie.mm(lie.mm(lie.mm(A, Binv), C), Binv)
    r = lie.se3_log(M)                                      # (J, F, 6)
    Jl_inv = lie.se3_left_jacobian_inv(r)
    Jr_inv = lie.se3_left_jacobian_inv(-r)
    J_A = lie.mm(Jl_inv, lie.adjoint(A))
    J_C = lie.mm(Jr_inv, lie.adjoint(B))
    J_B = -(J_A + J_C)
    return r, J_A, J_B, J_C


def total_error(
    state: GraphState, cfg: BackendParams, dynamic_scale: float = 1.0
) -> jnp.ndarray:
    """Graph error. dynamic_scale=0.0 gives the static-only objective used
    by the decoupled camera phase (matches linearize(dynamic_scale=0.0))."""
    dtype = state.X.dtype
    sig = _sigmas(cfg, dtype)
    k = cfg.noise.robust_k_huber
    use_rob = cfg.noise.use_robust_kernel
    onehot = _object_onehot(state, dtype)

    def rho(e):
        return _huber_rho(e, k) if use_rob else 0.5 * e * e

    err = jnp.zeros((), dtype)

    r_s, _ = _static_residuals(state)
    gate = _static_gate(state, cfg)
    e = jnp.linalg.norm(r_s, axis=-1) / sig["static_pt"]
    err += jnp.sum(jnp.where(state.s_valid & gate[None, :], rho(e), 0.0))

    if dynamic_scale:
        r_h, _, _, _ = _hybrid_obs_terms(state, onehot)
        mask = _obs_mask(state, onehot)
        e = jnp.linalg.norm(r_h / state.d_sig, axis=-1)
        err += dynamic_scale * jnp.sum(jnp.where(mask, rho(e), 0.0))

        r_sm, _, _, _ = _smooth_triple_terms(state)
        sm_mask = _smooth_triple_mask(state, cfg)
        err += dynamic_scale * jnp.sum(
            jnp.where(
                sm_mask[..., None], 0.5 * (r_sm / sig["smooth"]) ** 2, 0.0
            )
        )

    if cfg.use_vo_factor:
        X_prev = jnp.concatenate([state.X[:1], state.X[:-1]], axis=0)
        r_o = factors.between_residual(X_prev, state.X, state.odom) / sig["odom"]
        err += jnp.sum(jnp.where(_odom_mask(state)[:, None], 0.5 * r_o * r_o, 0.0))

    gauge_on = (~state.prior_valid).astype(dtype)
    r_p = factors.prior_residual(state.X[0], state.X0_prior) / sig["prior0"]
    err += gauge_on * jnp.sum(0.5 * r_p * r_p)

    dx_lin = _prior_dx(state)
    r_mp = state.prior_b + state.prior_L @ dx_lin
    err += jnp.where(state.prior_valid, jnp.sum(0.5 * r_mp * r_mp), 0.0)
    return err


# ---------------------------------------------------------------------------
# Linearisation
# ---------------------------------------------------------------------------

def linearize(
    state: GraphState,
    cfg: BackendParams,
    lam,
    dynamic_scale: float = 1.0,
    fixed_scale: float = 1.0,
    final_reg: bool = True,
) -> _HybridLin:
    """Build the reduced (camera + motion) normal equations.

    `dynamic_scale` scales every dynamic-observation and smoothing weight;
    0.0 gives the static-only system used by the decoupled (ParallelHybrid)
    camera phase. `fixed_scale` scales the NON-landmark terms (smoothing,
    odometry, gauge, marginal prior): under landmark-sharded assembly
    (parallel/sharded.py) each of P shards contributes its local landmark
    sums plus 1/P of the replicated terms, so the psum is exact.
    `final_reg=False` defers the data-dependent diagonal regularisation to
    the caller (it is nonlinear in the psum)."""
    F, J, Ls, Ld = state.F, state.J, state.Ls, state.Ld
    D = state.D
    dtype = state.X.dtype
    sig = _sigmas(cfg, dtype)
    k_rob = cfg.noise.robust_k_huber
    use_rob = cfg.noise.use_robust_kernel
    onehot = _object_onehot(state, dtype)

    S = jnp.zeros((D, D), dtype)
    rhs = jnp.zeros((D,), dtype)

    R = lie.rotation(state.X)
    Rt = jnp.swapaxes(R, -1, -2)
    eye3 = jnp.eye(3, dtype=dtype)

    # ================= static landmarks (same as WCME) ====================
    r_s, y_s = _static_residuals(state)
    gate = _static_gate(state, cfg)
    e_s = jnp.linalg.norm(r_s / state.s_sig, axis=-1)
    iw_s = (state.s_valid & gate[None, :]).astype(dtype)[..., None] * _irls_w(
        e_s, k_rob, use_rob
    )[..., None] / (state.s_sig ** 2)

    hat_y = lie.hat(y_s)
    Jx_s = jnp.concatenate(
        [hat_y, -jnp.broadcast_to(eye3, hat_y.shape)], axis=-1
    )
    Hpp_s = lie.einsum("fab,flb,fcb->lac", R, iw_s, R) + (
        _EPS_REG + lam
    ) * eye3
    Hpp_inv_s = bt.inv3(Hpp_s)
    g_s = lie.einsum("fab,flb->la", R, iw_s * r_s)
    A_s = lie.einsum("flba,flb,fbc->flac", Jx_s, iw_s, Rt)
    Hxx_s = lie.einsum("flab,fla,flac->fbc", Jx_s, iw_s, Jx_s)
    gx_s = lie.einsum("flab,fla->fb", Jx_s, iw_s * r_s)
    S_pp = lie.einsum("flab,lbc,gldc->fagd", A_s, Hpp_inv_s, A_s)
    S = S.at[: 6 * F, : 6 * F].add(
        _block_diag_embed(Hxx_s) - S_pp.reshape(6 * F, 6 * F)
    )
    rhs = rhs.at[: 6 * F].add(
        (-gx_s + lie.einsum("flab,lbc,lc->fa", A_s, Hpp_inv_s, g_s)).reshape(-1)
    )

    # ================= hybrid dynamic observations ========================
    # dynamic_scale is a PYTHON float: 0.0 (the decoupled camera phase)
    # skips every dynamic/smoothing term at trace time — same gating as
    # total_error — instead of emitting einsums multiplied by a constant
    # zero that XLA does not reliably eliminate. Halves the phase-1 program.
    if dynamic_scale == 0.0:
        Ld_, F_ = state.Ld, state.F
        zero_lin = _HybridLin(
            S=S, rhs=rhs, Hpp_inv_s=Hpp_inv_s, g_s=g_s, A_s=A_s,
            Hpp_inv_d=jnp.zeros((Ld_, 3, 3), dtype),
            g_d=jnp.zeros((Ld_, 3), dtype),
            Ax_d=jnp.zeros((Ld_, F_, 6, 3), dtype),
            Ah_d=jnp.zeros((Ld_, F_, 6, 3), dtype),
            onehot=onehot,
        )
        S, rhs = _fixed_terms(
            state, cfg, S, rhs, fixed_scale, sig, dtype
        )
        if final_reg:
            diag = jnp.diag(S)
            S = S + jnp.diag((_EPS_REG + lam) + (1e-5 + lam) * jnp.abs(diag))
        return zero_lin._replace(S=S, rhs=rhs)

    r_h, y_h, q, RH = _hybrid_obs_terms(state, onehot)       # (Ld,F,3)...
    mask = _obs_mask(state, onehot)
    e_h = jnp.linalg.norm(r_h / state.d_sig, axis=-1)
    iw_h = mask.astype(dtype)[..., None] * _irls_w(e_h, k_rob, use_rob)[
        ..., None
    ] / (state.d_sig ** 2)                                   # (Ld, F, 3)
    iw_h = iw_h * dynamic_scale

    hat_yh = lie.hat(y_h)
    Jx = jnp.concatenate(
        [hat_yh, -jnp.broadcast_to(eye3, hat_yh.shape)], axis=-1
    )                                                        # (Ld,F,3,6)
    # J_h = R_X^T R_H [-hat(q) | I]; zero where the motion is not a variable
    RtRH = lie.einsum("fba,lfbc->lfac", R, RH)               # R_X^T R_H
    hvar = _h_is_variable(state, onehot).astype(dtype)
    Jh = jnp.concatenate(
        [
            -lie.mm(RtRH, lie.hat(q)[:, None]),
            RtRH,
        ],
        axis=-1,
    ) * hvar[..., None, None]                                # (Ld,F,3,6)
    # J_m = R_X^T R_H R_L — orthonormal, so Hpp = (sum w) I; use Jm explicitly
    # for the gradient/cross terms.
    Lj_R = lie.einsum(
        "lj,jab->lab", onehot, lie.rotation(state.L_e)
    )
    assigned = jnp.sum(onehot, axis=1) > 0.5
    Lj_R = jnp.where(assigned[:, None, None], Lj_R, eye3)
    Jm = lie.einsum("lfab,lbc->lfac", RtRH, Lj_R)            # (Ld,F,3,3)

    # Hpp = sum_f Jm^T diag(iw) Jm (full 3x3)
    Hpp_d = lie.einsum("lfba,lfb,lfbc->lac", Jm, iw_h, Jm) + (
        _EPS_REG + lam
    ) * eye3
    Hpp_inv_d = bt.inv3(Hpp_d)                               # (Ld,3,3)
    g_d = lie.einsum("lfba,lfb->la", Jm, iw_h * r_h)         # (Ld,3)
    Ax_d = lie.einsum("lfba,lfb,lfbc->lfac", Jx, iw_h, Jm)   # (Ld,F,6,3)
    Ah_d = lie.einsum("lfba,lfb,lfbc->lfac", Jh, iw_h, Jm)

    # direct blocks
    Hxx_d = lie.einsum("lfab,lfa,lfac->fbc", Jx, iw_h, Jx)
    gx_d = lie.einsum("lfab,lfa->fb", Jx, iw_h * r_h)
    S = S.at[: 6 * F, : 6 * F].add(_block_diag_embed(Hxx_d))
    rhs = rhs.at[: 6 * F].add(-gx_d.reshape(-1))

    Hhh_blk = lie.einsum("lfab,lfa,lfac->lfbc", Jh, iw_h, Jh)  # (Ld,F,6,6)
    gh_blk = lie.einsum("lfab,lfa->lfb", Jh, iw_h * r_h)
    Hxh_blk = lie.einsum("lfab,lfa,lfac->lfbc", Jx, iw_h, Jh)  # same-frame cross
    Hhh = lie.einsum("lfbc,lj->jfbc", Hhh_blk, onehot)       # (J,F,6,6)
    gh = lie.einsum("lfb,lj->jfb", gh_blk, onehot)
    Hxh = lie.einsum("lfbc,lj->jfbc", Hxh_blk, onehot)       # (J,F,6,6)

    # Schur corrections over points (Hpp diagonal!)
    Sxx_c = lie.einsum("lfab,lbc,lgdc->fagd", Ax_d, Hpp_inv_d, Ax_d)
    rx_c = lie.einsum("lfab,lbc,lc->fa", Ax_d, Hpp_inv_d, g_d)
    # Per-object Schur blocks, J-independent compile: build the per-tracklet
    # (6F, 6F) outer products once, then group by object with ONE (J, Ld) x
    # (Ld, 36F^2) matmul — a pure MXU contraction replacing the Python J-loop
    # (compile time and program size used to scale linearly with J).
    n6 = F * 6
    Ax2 = Ax_d.reshape(Ld, n6, 3)
    Ah2 = Ah_d.reshape(Ld, n6, 3)
    AhPinv = lie.einsum("lab,lbc->lac", Ah2, Hpp_inv_d)   # (Ld, 6F, 3)
    t_xh = lie.einsum("lab,lcb->lac", Ax2, AhPinv)        # (Ld, 6F, 6F)
    t_hh = lie.einsum("lab,lcb->lac", Ah2, AhPinv)
    onehot_T = onehot.T                                    # (J, Ld)
    Sxh_c = (onehot_T @ t_xh.reshape(Ld, n6 * n6)).reshape(J, F, 6, F, 6)
    Shh_c = (onehot_T @ t_hh.reshape(Ld, n6 * n6)).reshape(J, F, 6, F, 6)
    rh_c = lie.einsum("lab,lb,lj->ja", AhPinv, g_d, onehot).reshape(J, F, 6)

    S = S.at[: 6 * F, : 6 * F].add(-Sxx_c.reshape(6 * F, 6 * F))
    rhs = rhs.at[: 6 * F].add(rx_c.reshape(-1))

    # ================= smoothing ternary (per object, batched) ============
    r_sm, J_A, J_B, J_C = _smooth_triple_terms(state)        # (J,F,...)
    w_sm = (dynamic_scale * fixed_scale) * _smooth_triple_mask(
        state, cfg
    ).astype(dtype)[..., None] / (sig["smooth"] ** 2)        # (J,F,6)
    # pairwise weighted products
    JAw = jnp.swapaxes(J_A, -1, -2) * w_sm[..., None, :]
    JBw = jnp.swapaxes(J_B, -1, -2) * w_sm[..., None, :]
    JCw = jnp.swapaxes(J_C, -1, -2) * w_sm[..., None, :]
    eyeF = jnp.eye(F, dtype=dtype)
    E1 = jnp.eye(F, k=1, dtype=dtype)    # E1[g, f] = 1 iff g = f-1
    E2 = jnp.eye(F, k=2, dtype=dtype)    # E2[g, f] = 1 iff g = f-2

    # accumulate (J, F,6,F,6): var slots A->f-2, B->f-1, C->f
    blocks = (
        lie.einsum("jfab,gf,hf->jgahb", lie.mm(JAw, J_A), E2, E2)
        + lie.einsum("jfab,gf,hf->jgahb", lie.mm(JBw, J_B), E1, E1)
        + lie.einsum("jfab,gf,hf->jgahb", lie.mm(JCw, J_C), eyeF, eyeF)
        + _sym2(lie.einsum("jfab,gf,hf->jgahb", lie.mm(JAw, J_B), E2, E1))
        + _sym2(lie.einsum("jfab,gf,hf->jgahb", lie.mm(JAw, J_C), E2, eyeF))
        + _sym2(lie.einsum("jfab,gf,hf->jgahb", lie.mm(JBw, J_C), E1, eyeF))
    )
    g_sm = (
        lie.einsum("jfab,jfb,gf->jga", JAw, r_sm, E2)
        + lie.einsum("jfab,jfb,gf->jga", JBw, r_sm, E1)
        + lie.einsum("jfab,jfb->jfa", JCw, r_sm)
    )

    # ================= assemble motion region ==============================
    n = 6 * F
    off0 = 6 * F
    motion_diag = (
        jax.vmap(_block_diag_embed)(Hhh)
        - Shh_c.reshape(J, n, n)
        + blocks.reshape(J, n, n)
    )
    motion_block = lie.einsum("jab,jk->jakb", motion_diag, jnp.eye(J, dtype=dtype))
    S = S.at[off0:, off0:].add(motion_block.reshape(J * n, J * n))
    cross = jax.vmap(_block_diag_embed)(Hxh) - Sxh_c.reshape(J, n, n)
    cross_flat = jnp.swapaxes(cross, 0, 1).reshape(n, J * n)
    S = S.at[:n, off0:].add(cross_flat)
    S = S.at[off0:, :n].add(cross_flat.T)
    rhs = rhs.at[off0:].add(
        ((-gh - g_sm).reshape(J, n) + rh_c.reshape(J, n)).reshape(-1)
    )

    # ================= odometry / gauge / marginal prior ==================
    S, rhs = _fixed_terms(state, cfg, S, rhs, fixed_scale, sig, dtype)

    if final_reg:
        diag = jnp.diag(S)
        S = S + jnp.diag((_EPS_REG + lam) + (1e-5 + lam) * jnp.abs(diag))

    return _HybridLin(
        S=S, rhs=rhs, Hpp_inv_s=Hpp_inv_s, g_s=g_s, A_s=A_s,
        Hpp_inv_d=Hpp_inv_d, g_d=g_d, Ax_d=Ax_d, Ah_d=Ah_d, onehot=onehot,
    )


def _fixed_terms(state: GraphState, cfg: BackendParams, S, rhs, fixed_scale,
                 sig, dtype):
    """Non-landmark terms shared by both linearize paths: odometry chain,
    gauge prior, marginal prior."""
    F = state.F
    if cfg.use_vo_factor:
        X_prev = jnp.concatenate([state.X[:1], state.X[:-1]], axis=0)
        r_o = factors.between_residual(X_prev, state.X, state.odom)
        J_Ao, J_Bo = factors.between_jacobians(X_prev, state.X, state.odom, r=r_o)
        w_o = fixed_scale * _odom_mask(state).astype(dtype)[:, None] / (
            sig["odom"] ** 2
        )
        od_block, od_g = _chain_se3_blocks(r_o, J_Ao, J_Bo, w_o)
        S = S.at[: 6 * F, : 6 * F].add(od_block.reshape(6 * F, 6 * F))
        rhs = rhs.at[: 6 * F].add(-od_g.reshape(-1))

    r_p = factors.prior_residual(state.X[0], state.X0_prior)
    J_p = factors.prior_jacobian(state.X[0], state.X0_prior, r=r_p)
    w_p = fixed_scale * (~state.prior_valid).astype(dtype) / sig["prior0"] ** 2
    S = S.at[:6, :6].add(w_p * lie.mm(jnp.swapaxes(J_p, -1, -2), J_p))
    rhs = rhs.at[:6].add(-w_p * (jnp.swapaxes(J_p, -1, -2) @ r_p))

    dx_lin = _prior_dx(state)
    r_mp = state.prior_b + state.prior_L @ dx_lin
    pv = fixed_scale * state.prior_valid.astype(dtype)
    S = S + pv * lie.mm(state.prior_L.T, state.prior_L)
    rhs = rhs - pv * (state.prior_L.T @ r_mp)
    return S, rhs


def _sym2(B):
    """B (J, F, 6, F, 6): return B + B^T (block transpose)."""
    return B + jnp.transpose(B, (0, 3, 4, 1, 2))


# ---------------------------------------------------------------------------
# Update + optimize
# ---------------------------------------------------------------------------

def _apply_update(state: GraphState, lin: _HybridLin, dx):
    F, J = state.F, state.J
    dX = dx[: 6 * F].reshape(F, 6)
    dH = dx[6 * F :].reshape(J, F, 6)

    X_new = lie.retract(state.X, dX)
    H_new = lie.retract(state.H, dH)

    At_dx = lie.einsum("flab,fa->lb", lin.A_s, dX)
    ms_new = state.ms + lie.einsum(
        "lab,lb->la", lin.Hpp_inv_s, -lin.g_s - At_dx
    )

    dh_l = lie.einsum("lj,jfc->lfc", lin.onehot, dH)
    corr = lie.einsum("lfab,fa->lb", lin.Ax_d, dX) + lie.einsum(
        "lfab,lfa->lb", lin.Ah_d, dh_l
    )
    m_hyb_new = state.m_hyb + lie.einsum(
        "lab,lb->la", lin.Hpp_inv_d, -lin.g_d - corr
    )

    return state.replace(X=X_new, H=H_new, ms=ms_new, m_hyb=m_hyb_new)



def _clip_step(dx, max_step):
    """Scale 6-dof tangent blocks so none exceeds max_step (GN trust region)."""
    blocks = dx.reshape(-1, 6)
    norms = jnp.linalg.norm(blocks, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, max_step / jnp.clip(norms, 1e-12, None))
    return (blocks * scale).reshape(-1)


def optimize_decoupled(state: GraphState, cfg: BackendParams) -> GraphState:
    """ParallelHybridBackendModule solve order: the camera/static scene first
    (its own fixed-lag solve, no dynamic factors), then every object with the
    camera FROZEN (reference ParallelHybridBackendModule.cc:440-560: the
    static estimator produces a Pose3Measurement consumed by each per-object
    iSAM2). Decoupling is a robustness feature — one degenerate object cannot
    perturb the camera/static solve. With the camera frozen the motion block
    is exactly per-object block-diagonal (objects only couple through X), so
    the batched solve IS the reference's tbb::parallel_for_each.
    """
    op = cfg.optimizer
    n = 6 * state.F
    D = state.D
    # FLAGS_num_dynamic_optimize (ParallelHybridBackendModule.cc:64,525):
    # iteration budget of the per-object phase; 0 = optimizer default
    obj_iters = cfg.num_dynamic_optimize or op.max_iterations

    from dynosam_tpu.backend.solver import lm_accept_reject

    def chol_solve(S, g):
        L = jnp.linalg.cholesky(S)
        z = jax.scipy.linalg.solve_triangular(L, g, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, z, lower=False)

    # Phase 1 — camera/static, dynamic information zeroed, error-based LM
    # accept/reject on the STATIC-ONLY objective (the reference's static
    # fixed-lag smoother is an error-accepting LM too; a plain-GN camera
    # phase was tried and replaced — unchecked finite-but-bad steps wander).
    def lin_cam(st, cfg_, lam):
        return linearize(st, cfg_, lam, dynamic_scale=0.0)

    from dynosam_tpu.backend.solver import gate_dx_by_type

    def solve_cam(lin):
        dx_x = chol_solve(lin.S[:n, :n], lin.rhs[:n])
        dx = jnp.concatenate(
            [_clip_step(dx_x, op.gn_max_step), jnp.zeros(D - n, dx_x.dtype)]
        )
        return gate_dx_by_type(dx, state.F, op)

    def err_cam(st, cfg_):
        return total_error(st, cfg_, dynamic_scale=0.0)

    state = lm_accept_reject(
        state, cfg, lin_cam, _apply_update, solve_cam, err_cam
    )

    # Phase 2 — every object with the camera FROZEN (block-diagonal in the
    # motions: the batched solve IS the reference's tbb::parallel_for_each),
    # accept/reject on the full objective (static terms are constant here).
    def solve_obj(lin):
        dh = chol_solve(lin.S[n:, n:], lin.rhs[n:])
        dx = jnp.concatenate(
            [jnp.zeros(n, dh.dtype), _clip_step(dh, op.gn_max_step)]
        )
        return gate_dx_by_type(dx, state.F, op)

    state = lm_accept_reject(
        state,
        cfg,
        linearize,
        _apply_update,
        solve_obj,
        total_error,
        iterations=obj_iters,
    )
    return state


def marginal_covariances(state: GraphState, cfg: BackendParams):
    """Marginal covariance blocks at the current estimate.

    The gtsam::Marginals role (reference ParallelHybridBackendModule.cc:
    479-487 camera-pose covariance; ParallelObjectISAM.hpp:49-120 per-object
    covariances, the backend->frontend feedback contract). One dense inverse
    of the reduced (camera + motion) system — the exact joint marginals,
    strictly more information than the reference's decoupled per-graph
    marginals (which ignore camera-object cross terms).

    Returns (cov_X (F, 6, 6), cov_H (J, F, 6, 6)).
    """
    F, J = state.F, state.J
    lin = linearize(state, cfg, jnp.asarray(0.0, state.X.dtype))
    Sigma = jnp.linalg.inv(lin.S)
    n = 6 * F
    # diagonal-block gathers (no Python loops: program size stays J/F-free)
    fidx = jnp.arange(F)
    cov_X = Sigma[:n, :n].reshape(F, 6, F, 6)[fidx, :, fidx, :]
    mot = Sigma[n:, n:].reshape(J, F, 6, J, F, 6)
    jj = jnp.arange(J)[:, None].repeat(F, 1)
    ff = fidx[None, :].repeat(J, 0)
    cov_H = mot[jj, ff, :, jj, ff, :]
    return cov_X, cov_H


def optimize(state: GraphState, cfg: BackendParams) -> GraphState:
    op = cfg.optimizer
    if cfg.decoupled_object_solve:
        return optimize_decoupled(state, cfg)
    Fv = state.F

    def solve_dx(lin):
        from dynosam_tpu.backend.solver import gate_dx_by_type

        L = jnp.linalg.cholesky(lin.S)
        z = jax.scipy.linalg.solve_triangular(L, lin.rhs, lower=True)
        dx = jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
        return gate_dx_by_type(dx, Fv, op)

    if not op.accept_reject:
        lam0 = jnp.asarray(op.lm_initial_lambda, state.X.dtype)

        def gn_step(carry, _):
            st, lam = carry
            lin = linearize(st, cfg, lam)
            cand = _apply_update(st, lin, _clip_step(solve_dx(lin), op.gn_max_step))
            # failed-solve recovery: escalate damping, don't freeze (see
            # solver.optimize; reference IncrementalOptimization.hpp:277-306)
            ok = jnp.isfinite(cand.X).all() & jnp.isfinite(cand.H).all()
            st = jax.tree.map(lambda a, b: jnp.where(ok, a, b), cand, st)
            lam = jnp.where(
                ok,
                jnp.maximum(lam / op.lm_lambda_factor, lam0),
                jnp.minimum(lam * op.lm_lambda_factor, op.lm_max_lambda),
            )
            return (st, lam), None

        (state, _), _ = jax.lax.scan(
            gn_step, (state, lam0), None, length=op.max_iterations
        )
        return state

    from dynosam_tpu.backend.solver import lm_accept_reject

    return lm_accept_reject(
        state, cfg, linearize, _apply_update, solve_dx, total_error
    )


# ---------------------------------------------------------------------------
# Accessor helpers
# ---------------------------------------------------------------------------

def f2f_motion(state: GraphState, f):
    """F2F world motions at frame slot f: H_{e,f} H_{e,f-1}^{-1}. (J,4,4)."""
    H_f = state.H[:, f]
    H_prev = state.H[:, jnp.maximum(f - 1, 0)]
    return lie.mm(H_f, lie.inverse(H_prev))


def object_pose(state: GraphState, f):
    """Object poses L_k = H_{e,f} L_e. (J, 4, 4)."""
    return lie.mm(state.H[:, f], state.L_e)
