"""Batched Levenberg-Marquardt with Schur-complement landmark elimination.

TPU-native replacement for GTSAM's nonlinear optimizers as used by the
reference backend (/root/reference/dynosam/src/backend/
RegularBackendModule.cc:286-322: LM full-batch / sliding window / iSAM2):
instead of symbolic factor graphs + sparse elimination orderings, the problem
is laid out as dense fixed-capacity tables (graph.GraphState) and each LM
iteration does:

  1. closed-form batched linearisation of every factor type (factors.py),
  2. exact elimination of all landmarks:
       * static landmarks: per-landmark diagonal blocks (PTP point Jacobians
         are orthonormal, so Hpp = (sum w) I),
       * dynamic landmarks: per-tracklet *chains* m_{i,0..F-1} coupled by
         motion-ternary factors -> per-tracklet (3F x 3F) block-tridiagonal
         Hessians, eliminated with batched Cholesky (the dense analogue of
         the reference's SmartMotionFactor Schur complement,
         HybridEstimator.hpp:784),
  3. dense Cholesky of the reduced (pose + object-motion) system,
  4. back-substitution of landmark updates,
  5. Huber IRLS weighting and LM accept/reject on the true robust cost.

Everything is shape-static; the LM loop is a lax.scan; objects are a padded
slot axis, so the per-object solves the reference parallelises with TBB
(ParallelHybridBackendModule.cc:548) are rows of batched einsums here.

Tangent layout of the reduced system (D = 6F + 6JF):
  pose f      -> dx[6f : 6f+6]
  motion j,f  -> dx[6F + 6(jF + f) : +6]
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynosam_tpu.backend import factors
from dynosam_tpu.backend.graph import GraphState
from dynosam_tpu.config import BackendParams
from dynosam_tpu.utils import lie

_EPS_REG = 1e-5  # Tikhonov floor so padded/unconstrained variables stay SPD


def _huber_rho(e, k):
    return jnp.where(e <= k, 0.5 * e * e, k * (e - 0.5 * k))


def _irls_w(e, k, use_robust):
    if not use_robust:
        return jnp.ones_like(e)
    safe = jnp.clip(e, 1e-12, None)
    return jnp.where(e <= k, jnp.ones_like(safe), k / safe)


class _Linearization(NamedTuple):
    S: jnp.ndarray        # (D, D) reduced Hessian (damped)
    rhs: jnp.ndarray      # (D,)
    sw_s: jnp.ndarray     # (Ls,) static Hpp = sw * I
    g_s: jnp.ndarray      # (Ls, 3)
    A_s: jnp.ndarray      # (F, Ls, 6, 3) pose-landmark cross blocks
    P_chol: jnp.ndarray   # (Ld, 3F, 3F) chain Cholesky factors
    g_d: jnp.ndarray      # (Ld, 3F)
    Bx: jnp.ndarray       # (Ld, 6F, 3F) pose-chain cross
    Bh: jnp.ndarray       # (Ld, 6F, 3F) motion-chain cross


def _sigmas(cfg: BackendParams, dtype):
    n = cfg.noise
    return dict(
        static_pt=jnp.asarray(n.static_point_noise_sigma, dtype),
        dyn_pt=jnp.asarray(n.dynamic_point_noise_sigma, dtype),
        ternary=jnp.asarray(n.motion_ternary_factor_noise_sigma, dtype),
        odom=jnp.asarray(
            [n.odometry_rotation_sigma] * 3 + [n.odometry_translation_sigma] * 3, dtype
        ),
        smooth=jnp.asarray(
            [n.constant_object_motion_rotation_sigma] * 3
            + [n.constant_object_motion_translation_sigma] * 3,
            dtype,
        ),
        prior0=jnp.asarray(n.initial_pose_prior_sigma, dtype),
    )


# ---------------------------------------------------------------------------
# Residual collections (shared by cost + linearisation)
# ---------------------------------------------------------------------------

def _static_residuals(state: GraphState):
    Xinv = lie.inverse(state.X)
    y = lie.transform_points(Xinv[:, None], state.ms[None, :, :])
    return y - state.s_z, y  # (F, Ls, 3)


def _static_gate(state: GraphState, cfg: BackendParams):
    return jnp.sum(state.s_valid, axis=0) >= cfg.min_static_observations


def _dyn_ptp_residuals(state: GraphState):
    Xinv = lie.inverse(state.X)
    y = lie.transform_points(Xinv[None, :], state.md)
    return y - state.d_z, y  # (Ld, F, 3)


def _ternary_terms(state: GraphState):
    j = jnp.clip(state.d_obj, 0, state.J - 1)
    Hj = state.H[j]                                  # (Ld, F, 4, 4)
    m_prev = jnp.concatenate([state.md[:, :1], state.md[:, :-1]], axis=1)
    r = state.md - lie.transform_points(Hj, m_prev)
    return r, m_prev, Hj                             # (Ld, F, 3), ...


def _ternary_mask(state: GraphState):
    v = state.d_valid
    prev_v = jnp.concatenate([jnp.zeros_like(v[:, :1]), v[:, :-1]], axis=1)
    j = jnp.clip(state.d_obj, 0, state.J - 1)
    Hv = state.H_valid[j]
    has_obj = (state.d_obj >= 0)[:, None]
    in_window = jnp.arange(state.F)[None, :] < state.num_frames
    return v & prev_v & Hv & has_obj & in_window


def _odom_mask(state: GraphState):
    f = jnp.arange(state.F)
    return state.odom_valid & (f > 0) & (f < state.num_frames)


def _smooth_mask(state: GraphState, cfg: BackendParams):
    if not cfg.use_smoothing_factor:
        return jnp.zeros_like(state.H_valid)
    prev = jnp.concatenate(
        [jnp.zeros_like(state.H_valid[:, :1]), state.H_valid[:, :-1]], axis=1
    )
    return state.H_valid & prev


def _prior_dx(state: GraphState):
    dX = lie.local_coordinates(state.prior_lin_X, state.X).reshape(-1)
    dH = lie.local_coordinates(state.prior_lin_H, state.H).reshape(-1)
    return jnp.concatenate([dX, dH])


def total_error(state: GraphState, cfg: BackendParams) -> jnp.ndarray:
    """True robust cost over all factors (LM accept/reject metric)."""
    dtype = state.X.dtype
    sig = _sigmas(cfg, dtype)
    k = cfg.noise.robust_k_huber
    use_rob = cfg.noise.use_robust_kernel

    def rho(e):
        return _huber_rho(e, k) if use_rob else 0.5 * e * e

    err = jnp.zeros((), dtype)

    r_s, _ = _static_residuals(state)
    gate = _static_gate(state, cfg)
    e = jnp.linalg.norm(r_s, axis=-1) / sig["static_pt"]
    err += jnp.sum(jnp.where(state.s_valid & gate[None, :], rho(e), 0.0))

    r_d, _ = _dyn_ptp_residuals(state)
    e = jnp.linalg.norm(r_d, axis=-1) / sig["dyn_pt"]
    err += jnp.sum(jnp.where(state.d_valid & (state.d_obj >= 0)[:, None], rho(e), 0.0))

    r_t, _, _ = _ternary_terms(state)
    e = jnp.linalg.norm(r_t, axis=-1) / sig["ternary"]
    err += jnp.sum(jnp.where(_ternary_mask(state), rho(e), 0.0))

    if cfg.use_vo_factor:
        X_prev = jnp.concatenate([state.X[:1], state.X[:-1]], axis=0)
        r_o = factors.between_residual(X_prev, state.X, state.odom) / sig["odom"]
        err += jnp.sum(jnp.where(_odom_mask(state)[:, None], 0.5 * r_o * r_o, 0.0))

    H_prev = jnp.concatenate([state.H[:, :1], state.H[:, :-1]], axis=1)
    eye4 = jnp.broadcast_to(jnp.eye(4, dtype=dtype), state.H.shape)
    r_sm = factors.between_residual(H_prev, state.H, eye4) / sig["smooth"]
    err += jnp.sum(
        jnp.where(_smooth_mask(state, cfg)[:, :, None], 0.5 * r_sm * r_sm, 0.0)
    )

    # gauge prior: once a marginal prior exists it carries the gauge instead
    gauge_on = (~state.prior_valid).astype(dtype)
    r_p = factors.prior_residual(state.X[0], state.X0_prior) / sig["prior0"]
    err += gauge_on * jnp.sum(0.5 * r_p * r_p)

    dx_lin = _prior_dx(state)
    r_mp = state.prior_b + state.prior_L @ dx_lin
    err += jnp.where(state.prior_valid, jnp.sum(0.5 * r_mp * r_mp), 0.0)
    return err


# ---------------------------------------------------------------------------
# Embedding helpers (one-hot einsums instead of scatter — XLA-friendly)
# ---------------------------------------------------------------------------

def _block_diag_embed(blocks):
    """(F, 6, 6) -> (6F, 6F) block-diagonal."""
    F = blocks.shape[0]
    eyeF = jnp.eye(F, dtype=blocks.dtype)
    return lie.einsum("fab,fg->fagb", blocks, eyeF).reshape(6 * F, 6 * F)


def _embed_same_frame(blk, F):
    """blk (Ld, F, A, B) -> (Ld, F, A, F, B) nonzero at [f, :, f, :]."""
    eyeF = jnp.eye(F, dtype=blk.dtype)
    return lie.einsum("lfab,fg->lfagb", blk, eyeF)


def _embed_prev_frame(blk, F):
    """blk (Ld, F, A, B) placed at [f, :, f-1, :]: out[l,f,a,g,b], g=f-1."""
    # E[g, f] = 1 iff g = f-1  <=>  superdiagonal of eye: eye(F, k=1)[g, f]
    E = jnp.eye(F, k=1, dtype=blk.dtype)
    return lie.einsum("lfab,gf->lfagb", blk, E)


# ---------------------------------------------------------------------------
# Linearisation
# ---------------------------------------------------------------------------

def linearize(state: GraphState, cfg: BackendParams, lam) -> _Linearization:
    F, J, Ls, Ld = state.F, state.J, state.Ls, state.Ld
    D = state.D
    dtype = state.X.dtype
    sig = _sigmas(cfg, dtype)
    k_rob = cfg.noise.robust_k_huber
    use_rob = cfg.noise.use_robust_kernel

    S = jnp.zeros((D, D), dtype)
    rhs = jnp.zeros((D,), dtype)

    R = lie.rotation(state.X)
    Rt = jnp.swapaxes(R, -1, -2)
    eye3 = jnp.eye(3, dtype=dtype)

    # ================= static landmarks ==================================
    r_s, y_s = _static_residuals(state)
    gate = _static_gate(state, cfg)
    e_s = jnp.linalg.norm(r_s, axis=-1) / sig["static_pt"]
    w_s = (state.s_valid & gate[None, :]).astype(dtype) * _irls_w(
        e_s, k_rob, use_rob
    ) / (sig["static_pt"] ** 2)                       # (F, Ls)

    hat_y = lie.hat(y_s)
    Jx_s = jnp.concatenate(
        [hat_y, -jnp.broadcast_to(eye3, hat_y.shape)], axis=-1
    )                                                 # (F, Ls, 3, 6)

    sw_s = jnp.sum(w_s, axis=0) + _EPS_REG + lam      # (Ls,)
    g_s = lie.einsum("fab,flb,fl->la", R, r_s, w_s)   # (Ls, 3)
    A_s = lie.einsum("flba,fl,fbc->flac", Jx_s, w_s, Rt)  # (F, Ls, 6, 3)

    Hxx_s = lie.einsum("flab,fl,flac->fbc", Jx_s, w_s, Jx_s)
    gx_s = lie.einsum("flab,fl,fla->fb", Jx_s, w_s, r_s)

    inv_sw = 1.0 / sw_s
    S_pp = lie.einsum("flab,l,glcb->fagc", A_s, inv_sw, A_s)  # (F,6,F,6)
    S = S.at[: 6 * F, : 6 * F].add(
        _block_diag_embed(Hxx_s) - S_pp.reshape(6 * F, 6 * F)
    )
    rhs_stat = lie.einsum("flab,l,lb->fa", A_s, inv_sw, g_s)  # (F, 6)
    rhs = rhs.at[: 6 * F].add((-gx_s + rhs_stat).reshape(-1))

    # ================= dynamic landmark chains ===========================
    r_d, y_d = _dyn_ptp_residuals(state)              # (Ld, F, 3)
    has_obj = state.d_obj >= 0
    e_d = jnp.linalg.norm(r_d, axis=-1) / sig["dyn_pt"]
    w_d = (state.d_valid & has_obj[:, None]).astype(dtype) * _irls_w(
        e_d, k_rob, use_rob
    ) / (sig["dyn_pt"] ** 2)                          # (Ld, F)

    r_t, m_prev, Hj = _ternary_terms(state)
    mask_t = _ternary_mask(state)
    e_t = jnp.linalg.norm(r_t, axis=-1) / sig["ternary"]
    w_t = mask_t.astype(dtype) * _irls_w(e_t, k_rob, use_rob) / (
        sig["ternary"] ** 2
    )                                                 # (Ld, F)

    RH = lie.rotation(Hj)                             # (Ld, F, 3, 3)
    J_H = jnp.concatenate([lie.mm(RH, lie.hat(m_prev)), -RH], axis=-1)

    hat_yd = lie.hat(y_d)
    Jx_d = jnp.concatenate(
        [hat_yd, -jnp.broadcast_to(eye3, hat_yd.shape)], axis=-1
    )                                                 # (Ld, F, 3, 6)

    # ---- chain Hessian P (Ld, F, 3, F, 3) -------------------------------
    # diagonal scalars * I: PTP w_d, ternary J_curr at f (w_t), ternary
    # J_prev at f-1 (w_t shifted), plus damping.
    w_t_next = jnp.concatenate([w_t[:, 1:], jnp.zeros_like(w_t[:, :1])], axis=1)
    diag_vals = w_d + w_t + w_t_next + _EPS_REG + lam           # (Ld, F)
    eyeF = jnp.eye(F, dtype=dtype)
    P = lie.einsum("lf,fg,ab->lfagb", diag_vals, eyeF, eye3)
    # off-diagonal (f-1, f): J_prev^T W J_curr = -w_t RH^T
    # block (f-1, f) of P is off = J_prev^T W J_curr = -w_t RH^T; the lower
    # block (f, f-1) is off^T. _embed_prev_frame places blk[l, f] at
    # (row f, col f-1), so embed off^T there and add its full transpose.
    off = -jnp.swapaxes(RH, -1, -2) * w_t[..., None, None]      # (Ld, F, 3, 3)
    lower = _embed_prev_frame(jnp.swapaxes(off, -1, -2), F)
    P = P + lower + jnp.transpose(lower, (0, 3, 4, 1, 2))

    # ---- chain gradient (Ld, F, 3) --------------------------------------
    g_d = lie.einsum("fab,lfb,lf->lfa", R, r_d, w_d)
    g_ter_curr = r_t * w_t[..., None]
    g_ter_prev = -lie.einsum("lfba,lfb->lfa", RH, r_t * w_t[..., None])
    g_d = g_d + g_ter_curr
    g_d = g_d + jnp.concatenate(
        [g_ter_prev[:, 1:], jnp.zeros_like(g_ter_prev[:, :1])], axis=1
    )

    # ---- cross blocks -----------------------------------------------------
    Bx_blk = lie.einsum("lfba,lf,fbc->lfac", Jx_d, w_d, Rt)     # (Ld,F,6,3)
    Bx = _embed_same_frame(Bx_blk, F)                 # (Ld, F, 6, F, 3)

    JHT = jnp.swapaxes(J_H, -1, -2)                   # (Ld, F, 6, 3)
    Bh_curr = JHT * w_t[..., None, None]
    Bh_prev = -lie.einsum("lfab,lfbc->lfac", JHT * w_t[..., None, None], RH)
    Bh = _embed_same_frame(Bh_curr, F) + _embed_prev_frame(Bh_prev, F)

    # ---- direct reduced-system contributions ----------------------------
    Hxx_d = lie.einsum("lfab,lf,lfac->fbc", Jx_d, w_d, Jx_d)
    gx_d = lie.einsum("lfab,lf,lfa->fb", Jx_d, w_d, r_d)
    S = S.at[: 6 * F, : 6 * F].add(_block_diag_embed(Hxx_d))
    rhs = rhs.at[: 6 * F].add(-gx_d.reshape(-1))

    Hhh_blk = lie.einsum("lfab,lf,lfac->lfbc", J_H, w_t, J_H)
    gh_blk = lie.einsum("lfab,lf,lfa->lfb", J_H, w_t, r_t)
    seg = jnp.where(has_obj, state.d_obj, J)
    Hhh = jax.ops.segment_sum(Hhh_blk, seg, num_segments=J + 1)[:J]
    gh = jax.ops.segment_sum(gh_blk, seg, num_segments=J + 1)[:J]

    # ---- per-tracklet Schur ----------------------------------------------
    Pf = P.reshape(Ld, 3 * F, 3 * F)
    chol = jnp.linalg.cholesky(Pf)
    Bx_f = Bx.reshape(Ld, 6 * F, 3 * F)
    Bh_f = Bh.reshape(Ld, 6 * F, 3 * F)
    g_df = g_d.reshape(Ld, 3 * F)

    def chol_solve_mat(L, rhs_mat):
        z = jax.scipy.linalg.solve_triangular(L, rhs_mat, lower=True)
        return jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), z, lower=False
        )

    PinvBxT = chol_solve_mat(chol, jnp.swapaxes(Bx_f, -1, -2))  # (Ld,3F,6F)
    PinvBhT = chol_solve_mat(chol, jnp.swapaxes(Bh_f, -1, -2))
    Pinv_g = chol_solve_mat(chol, g_df[..., None])[..., 0]      # (Ld,3F)

    S_xx_corr = lie.einsum("lab,lbc->ac", Bx_f, PinvBxT)
    S_xh_corr = lie.einsum("lab,lbc->lac", Bx_f, PinvBhT)
    S_hh_corr = lie.einsum("lab,lbc->lac", Bh_f, PinvBhT)
    S_xh_obj = jax.ops.segment_sum(S_xh_corr, seg, num_segments=J + 1)[:J]
    S_hh_obj = jax.ops.segment_sum(S_hh_corr, seg, num_segments=J + 1)[:J]

    rhs_x_corr = lie.einsum("lab,lb->a", Bx_f, Pinv_g)
    rhs_h_corr = jax.ops.segment_sum(
        lie.einsum("lab,lb->la", Bh_f, Pinv_g), seg, num_segments=J + 1
    )[:J]

    S = S.at[: 6 * F, : 6 * F].add(-S_xx_corr)
    rhs = rhs.at[: 6 * F].add(rhs_x_corr)

    off0 = 6 * F
    n = 6 * F
    Hhh_embed = jax.vmap(_block_diag_embed)(Hhh)                # (J, 6F, 6F)
    diag_obj = Hhh_embed - S_hh_obj
    cross_obj = -S_xh_obj                                       # (J, 6F, 6F)
    # block-diagonal over objects in the motion-motion region
    motion_block = lie.einsum("jab,jk->jakb", diag_obj, jnp.eye(J, dtype=dtype))
    S = S.at[off0:, off0:].add(motion_block.reshape(J * n, J * n))
    cross_flat = jnp.swapaxes(cross_obj, 0, 1).reshape(n, J * n)
    S = S.at[:n, off0:].add(cross_flat)
    S = S.at[off0:, :n].add(cross_flat.T)
    rhs = rhs.at[off0:].add((-gh.reshape(J, n) + rhs_h_corr).reshape(-1))

    # ================= odometry between ==================================
    if cfg.use_vo_factor:
        X_prev = jnp.concatenate([state.X[:1], state.X[:-1]], axis=0)
        r_o = factors.between_residual(X_prev, state.X, state.odom)
        J_A, J_B = factors.between_jacobians(X_prev, state.X, state.odom)
        w_o = _odom_mask(state).astype(dtype)[:, None] / sig["odom"] ** 2
        S, rhs = _add_chain_se3(S, rhs, r_o, J_A, J_B, w_o, base=0, F=F)

    # ================= smoothing between (per object) ====================
    H_prev = jnp.concatenate([state.H[:, :1], state.H[:, :-1]], axis=1)
    eye4 = jnp.broadcast_to(jnp.eye(4, dtype=dtype), state.H.shape)
    r_m = factors.between_residual(H_prev, state.H, eye4)       # (J, F, 6)
    J_Am, J_Bm = factors.between_jacobians(H_prev, state.H, eye4)
    w_m = _smooth_mask(state, cfg).astype(dtype)[..., None] / sig["smooth"] ** 2
    for j in range(J):
        S, rhs = _add_chain_se3(
            S, rhs, r_m[j], J_Am[j], J_Bm[j], w_m[j], base=off0 + j * n, F=F
        )

    # ================= gauge prior on pose 0 =============================
    # (disabled once a marginal prior carries the gauge)
    r_p = factors.prior_residual(state.X[0], state.X0_prior)
    J_p = factors.prior_jacobian(state.X[0], state.X0_prior)
    w_p = (~state.prior_valid).astype(dtype) / sig["prior0"] ** 2
    S = S.at[:6, :6].add(w_p * lie.mm(jnp.swapaxes(J_p, -1, -2), J_p))
    rhs = rhs.at[:6].add(-w_p * (jnp.swapaxes(J_p, -1, -2) @ r_p))

    # ================= linear marginal prior =============================
    dx_lin = _prior_dx(state)
    r_mp = state.prior_b + state.prior_L @ dx_lin
    pv = state.prior_valid.astype(dtype)
    S = S + pv * lie.mm(state.prior_L.T, state.prior_L)
    rhs = rhs - pv * (state.prior_L.T @ r_mp)

    # padded-variable regularisation + LM damping
    S = S + (_EPS_REG + lam) * jnp.eye(D, dtype=dtype)

    return _Linearization(
        S=S, rhs=rhs, sw_s=sw_s, g_s=g_s, A_s=A_s,
        P_chol=chol, g_d=g_df, Bx=Bx_f, Bh=Bh_f,
    )


def _add_chain_se3(S, rhs, r, J_A, J_B, w, base, F):
    """Chain of binary SE(3) factors between consecutive slots of one block.

    r: (F, 6) residual of factor f (between slots f-1 and f; entry 0 unused —
    its weight must be 0). J_A/J_B: (F, 6, 6). w: (F, 6) per-dim information.
    base: tangent offset of slot 0 of this chain within S.
    """
    dtype = r.dtype
    n = 6 * F
    JAw = jnp.swapaxes(J_A, -1, -2) * w[:, None, :]
    JBw = jnp.swapaxes(J_B, -1, -2) * w[:, None, :]
    Haa = lie.mm(JAw, J_A)      # (F,6,6) at (f-1, f-1)
    Hbb = lie.mm(JBw, J_B)      # at (f, f)
    Hab = lie.mm(JAw, J_B)      # at (f-1, f)
    ga = lie.einsum("fab,fb->fa", JAw, r)
    gb = lie.einsum("fab,fb->fa", JBw, r)

    eyeF = jnp.eye(F, dtype=dtype)
    E_prev = jnp.eye(F, k=1, dtype=dtype)  # E[g, f] = 1 iff g = f-1

    # diagonal contributions
    diag = lie.einsum("fab,fg->fagb", Hbb, eyeF)                 # (F,6,F,6)
    diag_prev = lie.einsum("fab,gf,gh->gahb", Haa, E_prev, eyeF)  # Haa at (f-1,f-1)
    # off-diagonal (f-1, f)
    off = lie.einsum("fab,gf,fh->gahb", Hab, E_prev, eyeF)
    block = diag + diag_prev + off + jnp.swapaxes(jnp.swapaxes(off, 0, 2), 1, 3)
    block = block.reshape(n, n)

    g = jnp.zeros((F, 6), dtype)
    g = g + gb
    g = g + lie.einsum("fa,gf->ga", ga, E_prev)                  # ga at slot f-1

    S = jax.lax.dynamic_update_slice(
        S, jax.lax.dynamic_slice(S, (base, base), (n, n)) + block, (base, base)
    )
    rhs = jax.lax.dynamic_update_slice(
        rhs, jax.lax.dynamic_slice(rhs, (base,), (n,)) - g.reshape(-1), (base,)
    )
    return S, rhs


# ---------------------------------------------------------------------------
# Solve + update
# ---------------------------------------------------------------------------

def _apply_update(state: GraphState, lin: _Linearization, dx):
    F, J = state.F, state.J
    dX = dx[: 6 * F].reshape(F, 6)
    dH = dx[6 * F :].reshape(J, F, 6)

    X_new = lie.retract(state.X, dX)
    H_new = lie.retract(state.H, dH)

    At_dx = lie.einsum("flab,fa->lb", lin.A_s, dX)
    dms = (-lin.g_s - At_dx) / lin.sw_s[:, None]
    ms_new = state.ms + dms

    j_idx = jnp.clip(state.d_obj, 0, J - 1)
    dh_per_tracklet = dH[j_idx].reshape(state.Ld, 6 * F)
    rhs_d = (
        -lin.g_d
        - lie.einsum("lba,b->la", lin.Bx, dx[: 6 * F])
        - lie.einsum("lba,lb->la", lin.Bh, dh_per_tracklet)
    )

    z = jax.scipy.linalg.solve_triangular(lin.P_chol, rhs_d[..., None], lower=True)
    dmd = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(lin.P_chol, -1, -2), z, lower=False
    )[..., 0].reshape(state.Ld, F, 3)
    md_new = state.md + dmd

    return state.replace(X=X_new, H=H_new, ms=ms_new, md=md_new)


def optimize(state: GraphState, cfg: BackendParams) -> GraphState:
    """LM to (approximate) convergence. Jittable, shape-static."""
    op = cfg.optimizer

    if not op.accept_reject:
        # plain damped GN (iSAM2-style non-backtracking updates): no robust
        # cost evaluation per iteration — roughly halves the per-frame cost.
        lam = jnp.asarray(op.lm_initial_lambda, state.X.dtype)

        def gn_step(st, _):
            lin = linearize(st, cfg, lam)
            L = jnp.linalg.cholesky(lin.S)
            z = jax.scipy.linalg.solve_triangular(L, lin.rhs, lower=True)
            dx = jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
            return _apply_update(st, lin, dx), None

        state, _ = jax.lax.scan(gn_step, state, None, length=op.max_iterations)
        return state

    def step(carry, _):
        st, lam, err = carry
        lin = linearize(st, cfg, lam)
        L = jnp.linalg.cholesky(lin.S)
        z = jax.scipy.linalg.solve_triangular(L, lin.rhs, lower=True)
        dx = jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
        cand = _apply_update(st, lin, dx)
        new_err = total_error(cand, cfg)
        accept = (new_err < err) & jnp.isfinite(new_err)
        st = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, st)
        err = jnp.where(accept, new_err, err)
        lam = jnp.where(
            accept,
            jnp.maximum(lam / op.lm_lambda_factor, op.lm_min_lambda),
            jnp.minimum(lam * op.lm_lambda_factor, op.lm_max_lambda),
        )
        return (st, lam, err), err

    err0 = total_error(state, cfg)
    lam0 = jnp.asarray(op.lm_initial_lambda, state.X.dtype)
    (state, _, _), _ = jax.lax.scan(
        step, (state, lam0, err0), None, length=op.max_iterations
    )
    return state
