"""World-centric object-POSE formulation (WCPE) — T-RO parity.

Reimplements the reference's WorldPoseFormulation
(/root/reference/dynosam/src/backend/rgbd/WorldPoseEstimator.{hpp:39-75,cc}):
object *poses* L_{j,k} are the variables (instead of WCME's motions), with

  * LandmarkMotionPoseFactor (factors/LandmarkMotionPoseFactor.cc:99):
      r = m_k - L_k L_{k-1}^{-1} m_{k-1}
  * LandmarkPoseSmoothingFactor (factors/LandmarkPoseSmoothingFactor.cc:82):
      r = log( (L_{k-1} L_{k-2}^{-1})^{-1} (L_k L_{k-1}^{-1}) )
    — identical algebra to the hybrid formulation's constant-motion ternary.

The dynamic-point chain structure matches WCME (points per frame coupled by
the motion-pose factor), so the same block-tridiagonal elimination applies;
each chain factor now cross-couples TWO pose variables (L_{k-1}, L_k) with
J_{L_{k-1}} = -J_{L_k}, which makes the per-object pose Hessian block
tridiagonal. Cross blocks are assembled densely per tracklet (this
formulation is for parity/experiments; hybrid is the speed mode).

State reuse: GraphState.H holds L_{j,k}; H_valid marks existing pose
variables; md holds per-frame dynamic points (as in WCME). F2F motions for
output: H_k = L_k L_{k-1}^{-1}.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynosam_tpu.backend import factors
from dynosam_tpu.backend.graph import GraphState, update_from_packet
from dynosam_tpu.backend.hybrid import _smooth_triple_mask, _smooth_triple_terms
from dynosam_tpu.backend.solver import (
    _EPS_REG,
    _block_diag_embed,
    _chain_se3_blocks,
    _embed_prev_frame,
    _embed_same_frame,
    _huber_rho,
    _irls_w,
    _object_onehot,
    _odom_mask,
    _prior_dx,
    _shift_frame_up,
    _sigmas,
    _static_gate,
    _static_residuals,
    _dyn_ptp_residuals,
)
from dynosam_tpu.config import BackendParams
from dynosam_tpu.cv import camera as cam
from dynosam_tpu.frontend.types import VisionPacket
from dynosam_tpu.ops import block_tridiag as bt
from dynosam_tpu.utils import lie


# ---------------------------------------------------------------------------
# Ingestion: initialise object POSES instead of motions
# ---------------------------------------------------------------------------

def update_from_packet_wcpe(
    state: GraphState,
    packet: VisionPacket,
    intr: cam.CameraIntrinsics,
    cfg: BackendParams,
) -> GraphState:
    """WCME ingestion + pose-variable initialisation:
    L_{j,f} = H_f2f(packet) * L_{j,f-1}; new objects anchor at their point
    centroid with identity rotation (the reference's ObjectPoseMap init)."""
    f = state.num_frames
    prev_obj_ids = state.obj_ids
    base = update_from_packet(state, packet, intr, cfg)
    dtype = base.X.dtype
    J, F = base.J, base.F

    newly = (prev_obj_ids < 0) & (base.obj_ids > 0)
    existed = (prev_obj_ids > 0) & (base.obj_ids > 0)

    d_obs_valid = base.d_valid[:, f]
    dt = packet.dynamic_tracks
    zd_world = lie.transform_points(
        base.X[f], cam.backproject(dt.uv, dt.depth, intr).astype(dtype)
    )
    onehot = (
        (base.d_obj[:, None] == jnp.arange(J)[None, :]) & d_obs_valid[:, None]
    ).astype(dtype)
    counts = jnp.sum(onehot, axis=0)
    centroid = lie.einsum("lj,lc->jc", onehot, zd_world) / jnp.clip(
        counts[:, None], 1.0, None
    )
    L_new = lie.make_pose(jnp.eye(3, dtype=dtype), centroid)

    eq = base.obj_ids[:, None] == packet.object_ids[None, :]
    pkt_ok = packet.object_valid & (packet.object_ids > 0)
    hit = jnp.any(eq & pkt_ok[None, :], axis=1)
    idx = jnp.argmax(eq & pkt_ok[None, :], axis=1)
    H_f2f = jnp.where(
        (hit & existed)[:, None, None],
        packet.object_motions[idx].astype(dtype),
        jnp.broadcast_to(jnp.eye(4, dtype=dtype), (J, 4, 4)),
    )
    L_prev = base.H[:, jnp.maximum(f - 1, 0)]
    L_init = jnp.where(
        (existed & (f > 0))[:, None, None],
        lie.compose(H_f2f, L_prev),
        L_new,
    )
    H = base.H.at[:, f].set(L_init)
    # L variable exists whenever the object has enough observations this frame
    min_obs = max(cfg.min_dynamic_observations, 1)
    H_valid = base.H_valid.at[:, f].set((counts >= min_obs) & (base.obj_ids > 0))
    return base.replace(H=H, H_valid=H_valid)


# ---------------------------------------------------------------------------
# Residual terms
# ---------------------------------------------------------------------------

def _pose_chain_terms(state: GraphState, onehot):
    """Motion-pose residuals r_f = m_f - G_f m_{f-1}, G_f = L_f L_{f-1}^{-1}.

    Returns (r (Ld,F,3), RG (Ld,F,3,3), J_L (Ld,F,3,6)) where J_L is the
    Jacobian w.r.t. L_f (and -J_L w.r.t. L_{f-1})."""
    Lj = lie.einsum("lj,jfab->lfab", onehot, state.H)       # (Ld,F,4,4)
    assigned = jnp.sum(onehot, axis=1) > 0.5
    eye4 = jnp.eye(4, dtype=state.X.dtype)
    Lj = jnp.where(assigned[:, None, None, None], Lj, eye4)
    L_prev = jnp.concatenate([Lj[:, :1], Lj[:, :-1]], axis=1)
    G = lie.mm(Lj, lie.inverse(L_prev))
    m_prev = jnp.concatenate([state.md[:, :1], state.md[:, :-1]], axis=1)
    r = state.md - lie.transform_points(G, m_prev)
    # u = L_{f-1}^{-1} m_{f-1}: point in the object frame
    u = lie.transform_points(lie.inverse(L_prev), m_prev)
    RL = lie.rotation(Lj)
    J_L = jnp.concatenate([lie.mm(RL, lie.hat(u)), -RL], axis=-1)  # (Ld,F,3,6)
    return r, lie.rotation(G), J_L


def _pose_chain_mask(state: GraphState, onehot):
    v = state.d_valid
    prev_v = jnp.concatenate([jnp.zeros_like(v[:, :1]), v[:, :-1]], axis=1)
    Lv = lie.einsum("lj,jf->lf", onehot, state.H_valid.astype(onehot.dtype)) > 0.5
    Lv_prev = jnp.concatenate([jnp.zeros_like(Lv[:, :1]), Lv[:, :-1]], axis=1)
    in_window = jnp.arange(state.F)[None, :] < state.num_frames
    return v & prev_v & Lv & Lv_prev & in_window


def total_error(state: GraphState, cfg: BackendParams) -> jnp.ndarray:
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
    e = jnp.linalg.norm(r_s / state.s_sig, axis=-1)
    err += jnp.sum(jnp.where(state.s_valid & gate[None, :], rho(e), 0.0))

    r_d, _ = _dyn_ptp_residuals(state)
    e = jnp.linalg.norm(r_d / state.d_sig, axis=-1)
    err += jnp.sum(jnp.where(state.d_valid & (state.d_obj >= 0)[:, None], rho(e), 0.0))

    r_t, _, _ = _pose_chain_terms(state, onehot)
    e = jnp.linalg.norm(r_t, axis=-1) / sig["ternary"]
    err += jnp.sum(jnp.where(_pose_chain_mask(state, onehot), rho(e), 0.0))

    r_sm, _, _, _ = _smooth_triple_terms(state)
    sm_mask = _smooth_triple_mask_wcpe(state, cfg)
    err += jnp.sum(
        jnp.where(sm_mask[..., None], 0.5 * (r_sm / sig["smooth"]) ** 2, 0.0)
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


def _smooth_triple_mask_wcpe(state: GraphState, cfg: BackendParams):
    if not cfg.use_smoothing_factor:
        return jnp.zeros_like(state.H_valid)
    Hv = state.H_valid
    prev1 = jnp.concatenate([jnp.zeros_like(Hv[:, :1]), Hv[:, :-1]], axis=1)
    prev2 = jnp.concatenate([jnp.zeros_like(Hv[:, :2]), Hv[:, :-2]], axis=1)
    return Hv & prev1 & prev2


# ---------------------------------------------------------------------------
# Linearisation
# ---------------------------------------------------------------------------

class _WcpeLin(NamedTuple):
    S: jnp.ndarray
    rhs: jnp.ndarray
    Hpp_inv_s: jnp.ndarray  # (Ls, 3, 3)
    g_s: jnp.ndarray
    A_s: jnp.ndarray
    Pd: jnp.ndarray
    Pu: jnp.ndarray
    Dp_inv: jnp.ndarray
    Wm: jnp.ndarray
    g_d: jnp.ndarray
    Bx: jnp.ndarray       # (Ld, 6F, 3F) dense pose-chain cross
    Bl: jnp.ndarray       # (Ld, 6F, 3F) dense object-pose cross
    onehot: jnp.ndarray


def linearize(state: GraphState, cfg: BackendParams, lam) -> _WcpeLin:
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

    # ---- static (same as WCME) -------------------------------------------
    r_s, y_s = _static_residuals(state)
    gate = _static_gate(state, cfg)
    e_s = jnp.linalg.norm(r_s / state.s_sig, axis=-1)
    iw_s = (state.s_valid & gate[None, :]).astype(dtype)[..., None] * _irls_w(
        e_s, k_rob, use_rob
    )[..., None] / (state.s_sig ** 2)
    hat_y = lie.hat(y_s)
    Jx_s = jnp.concatenate([hat_y, -jnp.broadcast_to(eye3, hat_y.shape)], axis=-1)
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

    # ---- dynamic PTP + pose-chain factors --------------------------------
    r_d, y_d = _dyn_ptp_residuals(state)
    has_obj_f = jnp.sum(onehot, axis=1)
    e_d = jnp.linalg.norm(r_d / state.d_sig, axis=-1)
    iw_d = (state.d_valid.astype(dtype) * has_obj_f[:, None])[
        ..., None
    ] * _irls_w(e_d, k_rob, use_rob)[..., None] / (state.d_sig ** 2)

    r_t, RG, J_L = _pose_chain_terms(state, onehot)
    mask_t = _pose_chain_mask(state, onehot)
    e_t = jnp.linalg.norm(r_t, axis=-1) / sig["ternary"]
    w_t = mask_t.astype(dtype) * _irls_w(e_t, k_rob, use_rob) / (sig["ternary"] ** 2)

    hat_yd = lie.hat(y_d)
    Jx_d = jnp.concatenate([hat_yd, -jnp.broadcast_to(eye3, hat_yd.shape)], axis=-1)

    # chain Hessian (same structure as WCME: J_prev = -RG, J_curr = I)
    w_t_next = jnp.concatenate([w_t[:, 1:], jnp.zeros_like(w_t[:, :1])], axis=1)
    Pd_ptp = lie.einsum("fab,lfb,fcb->lfac", R, iw_d, R)
    diag_scalar = w_t + w_t_next + _EPS_REG + lam
    Pd = Pd_ptp + diag_scalar[..., None, None] * eye3
    off = -jnp.swapaxes(RG, -1, -2) * w_t[..., None, None]
    Pu = jnp.concatenate([off[:, 1:], jnp.zeros_like(off[:, :1])], axis=1)

    g_d = lie.einsum("fab,lfb->lfa", R, iw_d * r_d)
    g_ter_curr = r_t * w_t[..., None]
    g_ter_prev = -lie.einsum("lfba,lfb->lfa", RG, r_t * w_t[..., None])
    g_d = g_d + g_ter_curr + _shift_frame_up(g_ter_prev, axis=1)

    # cross blocks, dense per tracklet (clarity over speed; see module doc)
    Bx_blk = lie.einsum("lfba,lfb,fbc->lfac", Jx_d, iw_d, Rt)
    Bx = _embed_same_frame(Bx_blk, F).reshape(Ld, 6 * F, 3 * F)

    JLT = jnp.swapaxes(J_L, -1, -2)                          # (Ld,F,6,3)
    Bl_curr = JLT * w_t[..., None, None]                     # J_L^T W J_curr
    Bl_prev = -lie.einsum("lfab,lfbc->lfac", JLT * w_t[..., None, None], RG)
    # rows L_f from factor f; rows L_{f-1} get the negations
    Bl = (
        _embed_same_frame(Bl_curr, F)
        + _embed_prev_frame(Bl_prev, F)
        + _embed_row_prev(-Bl_curr, F)           # (row f-1, col f)
        + _embed_row_col_prev(-Bl_prev, F)       # (row f-1, col f-1)
    ).reshape(Ld, 6 * F, 3 * F)

    # direct reduced blocks
    Hxx_d = lie.einsum("lfab,lfa,lfac->fbc", Jx_d, iw_d, Jx_d)
    gx_d = lie.einsum("lfab,lfa->fb", Jx_d, iw_d * r_d)
    S = S.at[: 6 * F, : 6 * F].add(_block_diag_embed(Hxx_d))
    rhs = rhs.at[: 6 * F].add(-gx_d.reshape(-1))

    # pose-pose direct blocks (per object, tridiagonal via +-J_L)
    HLL = lie.einsum("lfab,lf,lfac->lfbc", J_L, w_t, J_L)    # (Ld,F,6,6)
    gL = lie.einsum("lfab,lf,lfa->lfb", J_L, w_t, r_t)
    eyeF = jnp.eye(F, dtype=dtype)
    E1 = jnp.eye(F, k=1, dtype=dtype)
    blocks_l = (
        lie.einsum("lfab,fg,fh->lgahb", HLL, eyeF, eyeF)            # (f, f)
        + lie.einsum("lfab,gf,hf->lgahb", HLL, E1, E1)              # (f-1, f-1)
        - lie.einsum("lfab,gf,fh->lgahb", HLL, E1, eyeF)            # (f-1, f)
        - lie.einsum("lfab,fg,hf->lgahb", HLL, eyeF, E1)            # (f, f-1)
    )
    g_l = lie.einsum("lfb,fg->lgb", gL, eyeF) - lie.einsum("lfb,gf->lgb", gL, E1)
    HLL_obj = lie.einsum("lgahb,lj->jgahb", blocks_l, onehot)
    gL_obj = lie.einsum("lgb,lj->jgb", g_l, onehot)

    # smoothing ternary on L (identical algebra to the hybrid module)
    r_sm, J_A, J_B, J_C = _smooth_triple_terms(state)
    w_sm = _smooth_triple_mask_wcpe(state, cfg).astype(dtype)[..., None] / (
        sig["smooth"] ** 2
    )
    JAw = jnp.swapaxes(J_A, -1, -2) * w_sm[..., None, :]
    JBw = jnp.swapaxes(J_B, -1, -2) * w_sm[..., None, :]
    JCw = jnp.swapaxes(J_C, -1, -2) * w_sm[..., None, :]
    E2 = jnp.eye(F, k=2, dtype=dtype)

    def sym2(B):
        return B + jnp.transpose(B, (0, 3, 4, 1, 2))

    sm_blocks = (
        lie.einsum("jfab,gf,hf->jgahb", lie.mm(JAw, J_A), E2, E2)
        + lie.einsum("jfab,gf,hf->jgahb", lie.mm(JBw, J_B), E1, E1)
        + lie.einsum("jfab,fg,fh->jgahb", lie.mm(JCw, J_C), eyeF, eyeF)
        + sym2(lie.einsum("jfab,gf,hf->jgahb", lie.mm(JAw, J_B), E2, E1))
        + sym2(lie.einsum("jfab,gf,fh->jgahb", lie.mm(JAw, J_C), E2, eyeF))
        + sym2(lie.einsum("jfab,gf,fh->jgahb", lie.mm(JBw, J_C), E1, eyeF))
    )
    g_sm = (
        lie.einsum("jfab,jfb,gf->jga", JAw, r_sm, E2)
        + lie.einsum("jfab,jfb,gf->jga", JBw, r_sm, E1)
        + lie.einsum("jfab,jfb->jfa", JCw, r_sm)
    )

    # ---- chain Schur ------------------------------------------------------
    Dp_inv, Wm = bt.factorize(Pd, Pu)
    Pinv = bt.full_inverse(Pd, Pu).reshape(Ld, 3 * F, 3 * F)
    g_df = g_d.reshape(Ld, 3 * F)

    PinvBxT = lie.einsum("lij,lbj->lib", Pinv, Bx)
    PinvBlT = lie.einsum("lij,lbj->lib", Pinv, Bl)
    Pinv_g = lie.einsum("lij,lj->li", Pinv, g_df)

    Sxx_c = lie.einsum("lai,lib->ab", Bx, PinvBxT)
    Sxl_c = lie.einsum("lai,lib,lj->jab", Bx, PinvBlT, onehot)
    Sll_c = lie.einsum("lai,lib,lj->jab", Bl, PinvBlT, onehot)
    rx_c = lie.einsum("lai,li->a", Bx, Pinv_g)
    rl_c = lie.einsum("lai,li,lj->ja", Bl, Pinv_g, onehot)

    S = S.at[: 6 * F, : 6 * F].add(-Sxx_c)
    rhs = rhs.at[: 6 * F].add(rx_c)

    n = 6 * F
    off0 = 6 * F
    motion_diag = (
        HLL_obj.reshape(J, n, n) + sm_blocks.reshape(J, n, n) - Sll_c
    )
    motion_block = lie.einsum("jab,jk->jakb", motion_diag, jnp.eye(J, dtype=dtype))
    S = S.at[off0:, off0:].add(motion_block.reshape(J * n, J * n))
    cross_flat = jnp.swapaxes(-Sxl_c, 0, 1).reshape(n, J * n)
    S = S.at[:n, off0:].add(cross_flat)
    S = S.at[off0:, :n].add(cross_flat.T)
    rhs = rhs.at[off0:].add(
        ((-gL_obj - g_sm).reshape(J, n) + rl_c).reshape(-1)
    )

    # ---- odometry / gauge / marginal prior -------------------------------
    if cfg.use_vo_factor:
        X_prev = jnp.concatenate([state.X[:1], state.X[:-1]], axis=0)
        r_o = factors.between_residual(X_prev, state.X, state.odom)
        J_Ao, J_Bo = factors.between_jacobians(X_prev, state.X, state.odom, r=r_o)
        w_o = _odom_mask(state).astype(dtype)[:, None] / sig["odom"] ** 2
        od_block, od_g = _chain_se3_blocks(r_o, J_Ao, J_Bo, w_o)
        S = S.at[: 6 * F, : 6 * F].add(od_block.reshape(6 * F, 6 * F))
        rhs = rhs.at[: 6 * F].add(-od_g.reshape(-1))

    r_p = factors.prior_residual(state.X[0], state.X0_prior)
    J_p = factors.prior_jacobian(state.X[0], state.X0_prior, r=r_p)
    w_p = (~state.prior_valid).astype(dtype) / sig["prior0"] ** 2
    S = S.at[:6, :6].add(w_p * lie.mm(jnp.swapaxes(J_p, -1, -2), J_p))
    rhs = rhs.at[:6].add(-w_p * (jnp.swapaxes(J_p, -1, -2) @ r_p))

    dx_lin = _prior_dx(state)
    r_mp = state.prior_b + state.prior_L @ dx_lin
    pv = state.prior_valid.astype(dtype)
    S = S + pv * lie.mm(state.prior_L.T, state.prior_L)
    rhs = rhs - pv * (state.prior_L.T @ r_mp)

    diag = jnp.diag(S)
    S = S + jnp.diag((_EPS_REG + lam) + (1e-5 + lam) * jnp.abs(diag))

    return _WcpeLin(
        S=S, rhs=rhs, Hpp_inv_s=Hpp_inv_s, g_s=g_s, A_s=A_s,
        Pd=Pd, Pu=Pu, Dp_inv=Dp_inv, Wm=Wm, g_d=g_df,
        Bx=Bx, Bl=Bl, onehot=onehot,
    )


def _embed_row_prev(blk, F):
    """blk (Ld,F,A,B) placed at (row f-1, col f)."""
    E = jnp.eye(F, k=1, dtype=blk.dtype)   # E[g, f] = 1 iff g = f-1
    return lie.einsum("lfab,gf,fh->lgahb", blk, E, jnp.eye(F, dtype=blk.dtype))


def _embed_row_col_prev(blk, F):
    """blk (Ld,F,A,B) placed at (row f-1, col f-1)."""
    E = jnp.eye(F, k=1, dtype=blk.dtype)
    return lie.einsum("lfab,gf,hf->lgahb", blk, E, E)


# ---------------------------------------------------------------------------
# Update + optimize
# ---------------------------------------------------------------------------

def _apply_update(state: GraphState, lin: _WcpeLin, dx):
    F, J = state.F, state.J
    dX = dx[: 6 * F].reshape(F, 6)
    dL = dx[6 * F :].reshape(J, F, 6)

    X_new = lie.retract(state.X, dX)
    L_new = lie.retract(state.H, dL)

    At_dx = lie.einsum("flab,fa->lb", lin.A_s, dX)
    ms_new = state.ms + lie.einsum(
        "lab,lb->la", lin.Hpp_inv_s, -lin.g_s - At_dx
    )

    dl_l = lie.einsum("lj,jfc->lfc", lin.onehot, dL).reshape(state.Ld, 6 * F)
    rhs_blk = -(
        lin.g_d
        + lie.einsum("lai,a->li", lin.Bx, dx[: 6 * F])
        + lie.einsum("lai,la->li", lin.Bl, dl_l)
    ).reshape(state.Ld, F, 3)
    dmd = bt.solve_factored(lin.Dp_inv, lin.Wm, lin.Pu, rhs_blk[..., None])[..., 0]
    md_new = state.md + dmd

    return state.replace(X=X_new, H=L_new, ms=ms_new, md=md_new)



def _clip_step(dx, max_step):
    """Scale 6-dof tangent blocks so none exceeds max_step (GN trust region)."""
    blocks = dx.reshape(-1, 6)
    norms = jnp.linalg.norm(blocks, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, max_step / jnp.clip(norms, 1e-12, None))
    return (blocks * scale).reshape(-1)


def optimize(state: GraphState, cfg: BackendParams) -> GraphState:
    op = cfg.optimizer
    Fv = state.F

    def solve_dx(lin):
        from dynosam_tpu.backend.solver import gate_dx_by_type

        L = jnp.linalg.cholesky(lin.S)
        z = jax.scipy.linalg.solve_triangular(L, lin.rhs, lower=True)
        dx = jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
        # h thresholds gate the object-POSE (L) block in this formulation
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


def f2f_motion(state: GraphState, f):
    """F2F world motions H_k = L_k L_{k-1}^{-1}. (J, 4, 4)."""
    L_f = state.H[:, f]
    L_prev = state.H[:, jnp.maximum(f - 1, 0)]
    return lie.mm(L_f, lie.inverse(L_prev))
