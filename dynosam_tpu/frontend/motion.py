"""Camera ego-motion and per-object motion solvers (batched RANSAC + GN).

TPU-native replacement for the reference's OpenGV-based solvers
(/root/reference/dynosam/include/dynosam/frontend/vision/MotionSolver.hpp:
EgoMotionSolver:250, ObjectMotionSovlerF2F:366 and MotionSolver.cc:216-733):

* Hypotheses come from closed-form 3-point Kabsch on RGB-D 3D-3D
  correspondences (instead of OpenGV's Kneip P3P) — batched via vmap.
* Scoring uses *pixel reprojection error* with the reference's
  `ransac_threshold_pnp` semantics, so inlier sets match the 3d-2d PnP
  behaviour.
* Refinement is fixed-iteration Huber GN on reprojection residuals, playing
  the role of both `optimize_3d2d_pose_from_inliers` and the joint
  optical-flow refinement (OpticalFlowAndPoseOptimizer).
* Object motion: solve G s.t. obs_k ~ project(G^-1 m_{k-1}^w), then
  H_w = X_k * G_w with G_w = G^-1 (MotionSolver.cc:698) — here expressed
  directly as the world-frame motion m_k^w = H m_{k-1}^w.
* Per-object solves are vmapped over a padded object-slot axis — the
  reference's per-object loop becomes one batched program.

All functions are shape-static and jit-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynosam_tpu.config import MotionSolverParams
from dynosam_tpu.cv import camera as cam
from dynosam_tpu.ops import gauss_newton, kabsch, ransac
from dynosam_tpu.utils import lie


class MotionSolveResult(NamedTuple):
    pose: jnp.ndarray         # (4,4) — X_world_cam for ego; H_w for objects
    inliers: jnp.ndarray      # (N,) bool over the correspondence table
    num_inliers: jnp.ndarray  # () int32
    valid: jnp.ndarray        # () bool


def _project_sq_err(T, pts, uv_obs, intr, eps=1e-6):
    """Squared reprojection error of `T @ pts` vs uv_obs, fully elementwise.

    RANSAC scores (hyps, N)-shaped residual grids; any jnp.stack /
    concatenate / trailing unit dim in that chain becomes an XLA fusion
    boundary that materializes multi-MB intermediates in HBM (measured ~1 GB
    of traffic per object-solve call). Component arithmetic keeps the whole
    hypothesis-scoring chain one fused elementwise loop. Compare against
    threshold**2.
    """
    px, py, pz = pts[..., 0], pts[..., 1], pts[..., 2]
    mx = T[..., 0, 0] * px + T[..., 0, 1] * py + T[..., 0, 2] * pz + T[..., 0, 3]
    my = T[..., 1, 0] * px + T[..., 1, 1] * py + T[..., 1, 2] * pz + T[..., 1, 3]
    mz = T[..., 2, 0] * px + T[..., 2, 1] * py + T[..., 2, 2] * pz + T[..., 2, 3]
    safe_z = jnp.where(jnp.abs(mz) < eps, eps, mz)
    du = intr.fx * mx / safe_z + intr.cx - uv_obs[..., 0]
    dv = intr.fy * my / safe_z + intr.cy - uv_obs[..., 1]
    return du * du + dv * dv, mz


# ---------------------------------------------------------------------------
# Ego-motion: world 3D points (from k-1) + pixel observations (at k)
# ---------------------------------------------------------------------------

def solve_camera_pose(
    key,
    pts_world,          # (N, 3) landmarks in world (backprojected at k-1)
    uv_k,               # (N, 2) observed pixels at frame k
    pts_cam_k,          # (N, 3) camera-frame 3D at frame k (from depth)
    valid,              # (N,) bool
    intr: cam.CameraIntrinsics,
    params: MotionSolverParams,
    X_prior,            # (4,4) prior pose (e.g. constant-velocity prediction)
    R_known=None,       # (3,3) known camera rotation R_cam_world at k (IMU)
) -> MotionSolveResult:
    """Estimate X_world_cam at frame k.

    Falls back to `X_prior` when RANSAC fails (< min_inliers), mirroring the
    reference's constant-velocity / IMU fallback
    (RGBDInstanceFrontendModule.cc:324-370).

    R_known: the EgoMotionSolver known-rotation mode (the reference's 2-point
    RANSAC with an IMU rotation prior, MotionSolver.cc:216-311): hypotheses
    solve translation only with the rotation pinned, which shrinks the
    minimal problem and is robust when most correspondences sit on one plane.
    The refit and GN stages still refine the full pose.
    """
    rp = params.camera
    data = {"p_w": pts_world, "uv": uv_k, "p_c": pts_cam_k}

    if R_known is None:
        def solve_fn(s):
            # T maps world -> camera_k; closed-form triad on the 3-point
            # minimal set (exact = Kabsch for congruent samples; no SVD
            # custom-call)
            return kabsch.solve_rigid_3pt(s["p_w"], s["p_c"])
    else:
        def solve_fn(s):
            # rotation pinned: each sample point votes t = p_c - R p_w
            t = jnp.mean(
                s["p_c"] - lie.rotate_points(R_known, s["p_w"]), axis=0
            )
            return lie.make_pose(R_known, t)

    # use_ego_motion_pnp (reference FrontendParams.cc:57,
    # RGBDInstanceFrontendModule.cc:294-303): True scores/refines in pixel
    # space (3D2D PnP, geometricOutlierRejection3d2d); False scores/refines
    # on 3D point alignment (3D3D Arun/Kabsch — the path the reference
    # declares but never shipped; here it is a tested first-class mode).
    use_pnp = params.use_ego_motion_pnp

    if use_pnp:
        def residual_fn(T_cw, d):
            # squared pixel error (elementwise-fused); threshold squared below
            sq, _ = _project_sq_err(T_cw, d["p_w"], d["uv"], intr)
            return sq
        threshold = rp.ransac_threshold_pnp ** 2
    else:
        def residual_fn(T_cw, d):
            diff = lie.transform_points(T_cw, d["p_w"]) - d["p_c"]
            return jnp.sum(diff * diff, axis=-1)
        threshold = rp.ransac_threshold_3d ** 2

    def refit_fn(d, w, model):
        # Horn quaternion refit warm-started at the current model (no SVD)
        return kabsch.solve_rigid_quat(
            d["p_w"], d["p_c"], w, R0=model[..., :3, :3]
        )

    res = ransac.ransac(
        key,
        solve_fn,
        residual_fn,
        data,
        valid,
        num_hypotheses=rp.num_hypotheses(),
        sample_size=3,
        threshold=threshold,
        min_inliers=rp.min_inliers,
        refit_fn=refit_fn,
        # optimize_pose_from_inliers=False returns the raw RANSAC winner
        # (reference OpenGV-style toggle): no inlier refit, no GN polish
        refit_rounds=params.refit_rounds if rp.optimize_pose_from_inliers else 0,
    )

    T_cw = res.model

    if use_pnp:
        def gn_residual(T):
            uv_pred = cam.project(lie.transform_points(T, pts_world), intr)
            return uv_pred - uv_k
        k_huber = params.joint_of_k_huber * intr.fx  # huber in pixels
    else:
        def gn_residual(T):
            return lie.transform_points(T, pts_world) - pts_cam_k
        k_huber = rp.ransac_threshold_3d             # huber in meters

    w0 = res.inliers.astype(pts_world.dtype)
    T_cw, w = gauss_newton.refine_pose(
        gn_residual,
        T_cw,
        w0,
        iterations=params.refinement_iterations
        if rp.optimize_pose_from_inliers
        else 0,
        k_huber=k_huber,
    )

    X = lie.inverse(T_cw)
    # Fallback to the prior when the solve is invalid.
    X = jnp.where(res.valid, X, X_prior)
    return MotionSolveResult(
        pose=X, inliers=res.inliers, num_inliers=res.num_inliers, valid=res.valid
    )


# ---------------------------------------------------------------------------
# Object motions: one padded slot per object, vmapped.
# ---------------------------------------------------------------------------

def solve_object_motion(
    key,
    pts_world_prev,     # (N, 3) object points in world at k-1
    uv_k,               # (N, 2) observations at k
    pts_world_k,        # (N, 3) object points in world at k (via X_k + depth)
    valid,              # (N,) bool — correspondences of THIS object only
    X_k,                # (4,4) solved camera pose at k
    intr: cam.CameraIntrinsics,
    params: MotionSolverParams,
) -> MotionSolveResult:
    """World-frame motion H with m_k^w = H m_{k-1}^w for one object."""
    rp = params.object
    T_cam_world = lie.inverse(X_k)
    data = {"p_prev": pts_world_prev, "uv": uv_k, "p_k": pts_world_k}
    z_k = lie.transform_points(T_cam_world, pts_world_k)[..., 2]

    def solve_fn(s):
        return kabsch.solve_rigid_3pt(s["p_prev"], s["p_k"])

    def _uv_z_residual(H, p_prev, uv_obs, z_obs):
        """Reprojection + disparity-scaled depth residual (pixels).

        The depth term (a virtual-stereo disparity residual, RGBDCamera-style)
        breaks the classic planar-PnP two-lobe ambiguity that pure
        reprojection scoring suffers on near-planar objects.
        """
        # compose the (tiny) 4x4s once; ONE fused point transform over N
        m_c = lie.transform_points(lie.compose(T_cam_world, H), p_prev)
        uv_pred = cam.project(m_c, intr)
        z_pred = m_c[..., 2]
        # pixel-equivalent depth residual: fx * dz / z is the lateral pixel
        # displacement a depth error of dz produces at range z
        dz = (z_pred - z_obs) * intr.fx / jnp.clip(z_obs, 1e-3, None)
        return jnp.concatenate([uv_pred - uv_obs, dz[..., None]], axis=-1)

    # use_object_motion_pnp (reference FrontendParams.cc:58): True scores in
    # pixel space (reprojection + virtual-stereo depth, the 3D2D path);
    # False scores on 3D point-pair alignment (3D3D).
    if params.use_object_motion_pnp:
        def residual_fn(H, d):
            # squared (reprojection + pixel-equivalent depth), elementwise
            T = lie.compose(T_cam_world, H)
            sq, mz = _project_sq_err(T, d["p_prev"], d["uv"], intr)
            zk = d["z_k"]
            dz = (mz - zk) * intr.fx / jnp.clip(zk, 1e-3, None)
            return sq + dz * dz
        threshold = rp.ransac_threshold_pnp ** 2
    else:
        def residual_fn(H, d):
            diff = lie.transform_points(H, d["p_prev"]) - d["p_k"]
            return jnp.sum(diff * diff, axis=-1)
        threshold = rp.ransac_threshold_3d ** 2

    def refit_fn(d, w, model):
        return kabsch.solve_rigid_quat(
            d["p_prev"], d["p_k"], w, R0=model[..., :3, :3]
        )

    data["z_k"] = z_k
    res = ransac.ransac(
        key,
        solve_fn,
        residual_fn,
        data,
        valid,
        num_hypotheses=rp.num_hypotheses(),
        sample_size=3,
        threshold=threshold,
        min_inliers=rp.min_inliers,
        refit_fn=refit_fn,
        # optimize_pose_from_inliers=False returns the raw RANSAC winner
        # (reference OpenGV-style toggle): no inlier refit, no GN polish
        refit_rounds=params.refit_rounds if rp.optimize_pose_from_inliers else 0,
    )

    H = res.model
    inlier_w = res.inliers.astype(pts_world_prev.dtype)

    if params.use_object_motion_pnp:
        def gn_residual(Hx):
            return _uv_z_residual(Hx, pts_world_prev, uv_k, z_k)
        k_huber = params.joint_of_k_huber * intr.fx
    else:
        def gn_residual(Hx):
            return lie.transform_points(Hx, pts_world_prev) - pts_world_k
        k_huber = rp.ransac_threshold_3d

    H, _ = gauss_newton.refine_pose(
        gn_residual,
        H,
        inlier_w,
        iterations=params.object_refinement_iterations
        if rp.optimize_pose_from_inliers
        else 0,
        k_huber=k_huber,
    )

    if params.refine_motion_with_3d:
        # MotionOnlyRefinementOptimizer parity (reference MotionSolver.cc:700
        # behind refine_motion_with_3d): an extra motion-only GN pass on the
        # 3D point-pair residual H p_{k-1} - p_k with a tight Huber
        # (motion_3d_k_huber, meters) — tightens the translation using the
        # full depth information after the image-space solve.
        def residual_3d(Hx):
            return lie.transform_points(Hx, pts_world_prev) - pts_world_k

        H, _ = gauss_newton.refine_pose(
            residual_3d,
            H,
            inlier_w,
            iterations=params.object_refinement_iterations,
            k_huber=params.motion_3d_k_huber,
        )

    H = jnp.where(res.valid, H, jnp.eye(4, dtype=H.dtype))
    return MotionSolveResult(
        pose=H, inliers=res.inliers, num_inliers=res.num_inliers, valid=res.valid
    )


def solve_all_object_motions(
    key,
    object_ids,         # (J,) int32 slot -> object id, -1 pad
    track_object_ids,   # (N,) int32 per-correspondence object id
    pts_world_prev,     # (N, 3)
    uv_k,               # (N, 2)
    pts_world_k,        # (N, 3)
    track_valid,        # (N,) bool
    X_k,
    intr: cam.CameraIntrinsics,
    params: MotionSolverParams,
):
    """vmap of `solve_object_motion` over the padded object-slot axis.

    Replaces the reference's sequential per-object loop
    (ObjectMotionSovlerF2F::solve) and the ParallelHybrid TBB loop with one
    batched program: every slot sees the full correspondence table masked to
    its own object id.
    """
    J = object_ids.shape[0]
    keys = jax.random.split(key, J)

    def per_slot(k_j, oid):
        valid_j = track_valid & (track_object_ids == oid) & (oid > 0)
        return solve_object_motion(
            k_j, pts_world_prev, uv_k, pts_world_k, valid_j, X_k, intr, params
        )

    return jax.vmap(per_slot)(keys, object_ids)


# ---------------------------------------------------------------------------
# Joint optical-flow + pose refinement (OpticalFlowAndPoseOptimizer)
# ---------------------------------------------------------------------------

def joint_flow_pose_refine(
    T_eff0,             # (4,4) world -> camera-side map (see below)
    pts_world,          # (N, 3) anchored 3D points from k-1 (held fixed)
    kp_prev,            # (N, 2) keypoints at k-1
    flow_meas,          # (N, 2) measured flow (kp_k - kp_prev)
    valid,              # (N,) bool
    intr: cam.CameraIntrinsics,
    params: MotionSolverParams,
):
    """Jointly refine a pose-like transform AND the per-feature flows.

    The OpticalFlowAndPoseOptimizer role (reference MotionSolver.hpp:119-213,
    factors/Pose3FlowProjectionFactor.h:73-130): per feature i

        e1_i = (kp_prev_i + f_i) - pi(T_eff @ P_W_i)     sigma = flow_sigma
        e2_i = f_i - flow_meas_i                         sigma = flow_prior

    with a Huber loss on e1. `T_eff` is whatever maps world points at k-1 to
    the frame the prediction is projected in: inverse(X_k) for the camera
    solve, inverse(X_k) @ H_w for an object-motion solve (the reference's
    G = X_k^-1 H parameterisation, MotionSolver.cc:673-690).

    TPU shape: the flow variables are Schur-eliminated in closed form — their
    Hessian blocks are scalar multiples of I2 — so each Gauss-Newton
    iteration is one batched Jacobian, a 6x6 solve, and fused elementwise
    updates. No per-feature loop, no sparsity machinery.

    Returns (T_eff_refined, flow_refined (N,2), weights (N,)) where weights
    fold the final Huber IRLS factor (callers use as a soft inlier mask).
    """
    dtype = T_eff0.dtype
    v = valid.astype(dtype)
    w_meas = v / params.flow_sigma**2
    w_prior = v / params.flow_prior_sigma**2
    k_px = params.joint_of_k_huber * intr.fx          # huber in pixels
    # relative damping + a step cap: with < 3 supporting features the Schur
    # system is near-singular and an uncapped GN step diverges wildly
    # (catastrophic refined motions on object re-entry frames)
    damping = 1e-6
    max_step = params.joint_of_max_step

    def step(carry, _):
        T, f = carry

        def pred_fn(xi):
            return cam.project(
                lie.transform_points(lie.retract(T, xi), pts_world), intr
            )

        zero = jnp.zeros(6, dtype)
        pred = pred_fn(zero)                           # (N, 2)
        Jt = jax.jacfwd(pred_fn)(zero)                 # (N, 2, 6)
        r1 = (kp_prev + f) - pred
        r2 = f - flow_meas
        w1 = w_meas * gauss_newton.huber_weights(
            jnp.linalg.norm(r1, axis=-1), k_px
        )

        # normal equations over [xi; f], then Schur over the f blocks:
        #   H_xx = sum w1 Jt^T Jt          H_xf_i = -w1_i Jt_i^T   (6, 2)
        #   C_i  = (w1_i + w_prior_i) I2   g_x = -sum w1 Jt^T r1
        #   g_f_i = w1_i r1_i + w_prior_i r2_i
        A = lie.einsum("nai,n,naj->ij", Jt, w1, Jt)
        g_x = -lie.einsum("nai,na->i", Jt, w1[:, None] * r1)
        c = jnp.maximum(w1 + w_prior, 1e-12)           # (N,)
        g_f = w1[:, None] * r1 + w_prior[:, None] * r2
        Hs = A - lie.einsum("nai,n,naj->ij", Jt, w1 * w1 / c, Jt)
        gs = g_x + lie.einsum("nai,n,na->i", Jt, w1 / c, g_f)
        Hs = Hs + (
            damping + 1e-6 * jnp.max(jnp.abs(jnp.diag(Hs)))
        ) * jnp.eye(6, dtype=dtype)
        xi = -jnp.linalg.solve(Hs, gs)
        nrm = jnp.linalg.norm(xi)
        xi = xi * jnp.minimum(1.0, max_step / jnp.maximum(nrm, 1e-12))
        xi = jnp.where(jnp.isfinite(xi), xi, 0.0)
        # back-substitute: df_i = -(g_f_i + H_fx_i xi) / c_i
        H_fx_xi = -w1[:, None] * lie.einsum("nai,i->na", Jt, xi)
        df = -(g_f + H_fx_xi) / c[:, None]
        return (lie.retract(T, xi), f + v[:, None] * df), None

    (T, f), _ = jax.lax.scan(
        step, (T_eff0, flow_meas), None, length=params.joint_of_iterations
    )
    pred = cam.project(lie.transform_points(T, pts_world), intr)
    r1 = (kp_prev + f) - pred
    w_final = v * gauss_newton.huber_weights(jnp.linalg.norm(r1, axis=-1), k_px)
    return T, f, w_final
