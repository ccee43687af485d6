"""Stereo camera: rectification geometry, undistort-rectify maps, and
sparse stereo (L->R KLT) depth.

Reference parity:
  * StereoCamera (/root/reference/dynosam_cv/include/dynosam_cv/
    StereoCamera.hpp:45 — R1/R2/P1/P2/Q rectification parameters, rectified
    gtsam::Cal3_S2Stereo, baseline)
  * UndistortRectifier (/root/reference/dynosam_cv/include/dynosam_cv/
    UndistortRectifier.hpp — cv::initUndistortRectifyMap + remap)
  * FeatureTracker::stereoTrack (/root/reference/dynosam/src/frontend/vision/
    FeatureTracker.cc:194-337 — KLT L->R with flow-back check, epipolar gate,
    disparity -> depth)

TPU decomposition: the rectification PARAMETERS (R1, R2, P, baseline) and the
per-pixel source-coordinate maps are computed once on the host in numpy (they
depend only on calibration); applying the maps and the stereo KLT matching are
jitted device programs (bilinear gathers + the shared pyramidal LK op).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.cv import camera as cam
from dynosam_tpu.ops import lk


# ---------------------------------------------------------------------------
# Calibration containers (host-side, plain numpy)
# ---------------------------------------------------------------------------

@dataclass
class MonoCalibration:
    """One physical camera: pinhole + distortion (CameraParams analogue)."""

    K: np.ndarray                        # (3, 3) intrinsics
    dist: np.ndarray = field(default_factory=lambda: np.zeros(4))
    model: str = "radtan"                # "radtan" (k1 k2 p1 p2) | "equidistant"
    width: int = 0
    height: int = 0

    @classmethod
    def create(cls, fx, fy, cx, cy, width, height, dist=None, model="radtan"):
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
        d = np.zeros(4) if dist is None else np.asarray(dist, np.float64)
        return cls(K=K, dist=d, model=model, width=int(width), height=int(height))


def _distort_normalized(x, y, dist, model):
    """Apply the forward distortion model to normalized coordinates (numpy)."""
    if model == "radtan":
        k1, k2, p1, p2 = dist[:4]
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        return xd, yd
    if model == "equidistant":
        k1, k2, k3, k4 = dist[:4]
        r = np.sqrt(x * x + y * y)
        theta = np.arctan(r)
        t2 = theta * theta
        theta_d = theta * (1 + k1 * t2 + k2 * t2**2 + k3 * t2**3 + k4 * t2**4)
        scale = np.where(r > 1e-8, theta_d / np.maximum(r, 1e-8), 1.0)
        return x * scale, y * scale
    raise ValueError(f"unknown distortion model {model!r}")


def _rodrigues(r):
    """Axis-angle (3,) -> rotation matrix (numpy)."""
    theta = np.linalg.norm(r)
    if theta < 1e-12:
        return np.eye(3)
    k = r / theta
    K = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]]
    )
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def _log_so3(R):
    """Rotation matrix -> axis-angle (numpy)."""
    cos = np.clip((np.trace(R) - 1) / 2, -1.0, 1.0)
    theta = np.arccos(cos)
    if theta < 1e-12:
        return np.zeros(3)
    w = (
        np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        / (2 * np.sin(theta))
    )
    return w * theta


def stereo_rectify(
    left: MonoCalibration,
    right: MonoCalibration,
    T_left_right: np.ndarray,
) -> dict:
    """Compute rectification rotations + the shared rectified pinhole.

    T_left_right: (4, 4) pose of the RIGHT camera in the LEFT camera frame
    (its translation is the physical baseline vector).

    Returns dict(R1, R2, P, fx, fy, cx, cy, baseline): R1/R2 rotate each
    camera frame into the common rectified frame whose x-axis is the
    baseline (cv::stereoRectify's construction: split the relative rotation
    evenly between the cameras, then align x with the translation).
    """
    R_lr = T_left_right[:3, :3]
    t = T_left_right[:3, 3]

    # split the relative rotation evenly (same as OpenCV)
    r = _log_so3(R_lr)
    R_half_l = _rodrigues(0.5 * r)       # rotates left toward right
    R_half_r = _rodrigues(-0.5 * r)      # rotates right toward left
    # baseline expressed in the "middle" frame
    t_mid = R_half_r @ t

    # rectified frame: e1 along the baseline, e2 orthogonal in the xy plane
    e1 = t_mid / np.linalg.norm(t_mid)
    if e1[0] < 0:
        e1 = -e1                          # keep +x to the right camera
    e2 = np.array([-e1[1], e1[0], 0.0])
    n2 = np.linalg.norm(e2)
    e2 = e2 / n2 if n2 > 1e-9 else np.array([0.0, 1.0, 0.0])
    e3 = np.cross(e1, e2)
    R_rect = np.stack([e1, e2, e3])       # middle -> rectified

    R1 = R_rect @ R_half_l.T
    R2 = R_rect @ R_half_r.T

    # shared rectified pinhole: average focal, centered principal point
    fx = 0.5 * (left.K[0, 0] + right.K[0, 0])
    fy = 0.5 * (left.K[1, 1] + right.K[1, 1])
    cx = 0.5 * (left.K[0, 2] + right.K[0, 2])
    cy = 0.5 * (left.K[1, 2] + right.K[1, 2])
    baseline = float(np.linalg.norm(t))
    return dict(R1=R1, R2=R2, fx=fx, fy=fy, cx=cx, cy=cy, baseline=baseline)


def undistort_rectify_map(
    calib: MonoCalibration,
    R: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
) -> np.ndarray:
    """(H, W, 2) source-pixel coordinates for each rectified target pixel.

    cv::initUndistortRectifyMap: target pixel -> rectified normalized ray ->
    rotate back by R^T -> distort -> original pixel.
    """
    H, W = calib.height, calib.width
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    x = (u - cx) / fx
    y = (v - cy) / fy
    ray = np.stack([x, y, np.ones_like(x)], axis=-1)       # rectified frame
    src = ray @ R                                           # = (R^T ray^T)^T
    xs = src[..., 0] / src[..., 2]
    ys = src[..., 1] / src[..., 2]
    xd, yd = _distort_normalized(xs, ys, calib.dist, calib.model)
    K = calib.K
    map_u = K[0, 0] * xd + K[0, 2]
    map_v = K[1, 1] * yd + K[1, 2]
    return np.stack([map_u, map_v], axis=-1).astype(np.float32)


# ---------------------------------------------------------------------------
# Device-side application
# ---------------------------------------------------------------------------

def remap_bilinear(img, src_map):
    """Sample img (H, W[, C]) at src_map (H, W, 2) pixel coords. Jittable;
    out-of-bounds sources clamp to the border (cv::BORDER_REPLICATE)."""
    H, W = img.shape[:2]
    u = jnp.clip(src_map[..., 0], 0.0, W - 1.001)
    v = jnp.clip(src_map[..., 1], 0.0, H - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = (u - u0)[..., None] if img.ndim == 3 else u - u0
    dv = (v - v0)[..., None] if img.ndim == 3 else v - v0

    def g(dv_, du_):
        return img[v0 + dv_, u0 + du_]

    top = g(0, 0) * (1 - du) + g(0, 1) * du
    bot = g(1, 0) * (1 - du) + g(1, 1) * du
    return top * (1 - dv) + bot * dv


class StereoCamera:
    """Rectified stereo rig (StereoCamera + UndistortRectifier roles).

    Host-side construction computes R1/R2 + per-camera remap grids; `rectify`
    runs on device. `intrinsics()` is the rectified pinhole used by the rest
    of the pipeline (the UndistortRectifier contract: downstream code sees
    ideal rectified pinholes only).
    """

    def __init__(
        self,
        left: MonoCalibration,
        right: MonoCalibration,
        T_left_right: np.ndarray,
    ):
        p = stereo_rectify(left, right, T_left_right)
        self.baseline = p["baseline"]
        self.fx, self.fy = float(p["fx"]), float(p["fy"])
        self.cx, self.cy = float(p["cx"]), float(p["cy"])
        self.R1, self.R2 = p["R1"], p["R2"]
        self.map_left = jnp.asarray(
            undistort_rectify_map(left, p["R1"], self.fx, self.fy, self.cx, self.cy)
        )
        self.map_right = jnp.asarray(
            undistort_rectify_map(right, p["R2"], self.fx, self.fy, self.cx, self.cy)
        )
        self.width, self.height = left.width, left.height

    def intrinsics(self) -> cam.CameraIntrinsics:
        return cam.CameraIntrinsics.create(
            fx=self.fx, fy=self.fy, cx=self.cx, cy=self.cy,
            width=self.width, height=self.height, baseline=self.baseline,
        )

    def rectify(self, left_img, right_img):
        return (
            remap_bilinear(left_img, self.map_left),
            remap_bilinear(right_img, self.map_right),
        )

    def depth_from_disparity(self, disparity):
        """Rectified disparity (pixels) -> metric depth (RGBDCamera role)."""
        return self.fx * self.baseline / jnp.maximum(disparity, 1e-6)


# ---------------------------------------------------------------------------
# Sparse stereo matching (stereoTrack)
# ---------------------------------------------------------------------------

def stereo_track(
    left_gray,
    right_gray,
    uv_left,              # (N, 2) keypoints in the rectified left image
    valid,                # (N,) bool
    fx: float,
    baseline: float,
    *,
    levels: int = 3,
    half: int = 4,
    iters: int = 12,
    min_eig: float = 1e-4,
    fb_threshold: float = 1.0,
    epipolar_tolerance: float = 1.0,
    min_disparity: float = 0.1,
    max_disparity: float = 256.0,
):
    """Match left keypoints into the rectified right image and triangulate.

    The reference runs sparse KLT L->R with a flow-back check, rejects
    matches off the epipolar line, and converts disparity to depth
    (FeatureTracker.cc:194-337). Rectified geometry makes the epipolar check
    a |dv| gate. Returns (depth (N,), uv_right (N, 2), ok (N,)).
    """
    uv_right, ok = lk.lk_track(
        left_gray,
        right_gray,
        uv_left,
        valid,
        levels=levels,
        half=half,
        iters=iters,
        min_eig=min_eig,
        fb_check=True,
        fb_threshold=fb_threshold,
    )
    dv = uv_right[:, 1] - uv_left[:, 1]
    disparity = uv_left[:, 0] - uv_right[:, 0]
    ok = (
        ok
        & (jnp.abs(dv) <= epipolar_tolerance)
        & (disparity > min_disparity)
        & (disparity < max_disparity)
    )
    depth = fx * baseline / jnp.maximum(disparity, min_disparity)
    return depth, uv_right, ok


# ---------------------------------------------------------------------------
# Dense stereo matching (StereoMatcher::denseStereoReconstruction role)
# ---------------------------------------------------------------------------

def _box_filter(x, half: int):
    """(H, W) mean filter with a (2*half+1)^2 window, edge-padded."""
    k = 2 * half + 1
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (k, k), (1, 1), [(half, half), (half, half)]
    )
    return s / float(k * k)


def dense_disparity(
    left_gray,
    right_gray,
    *,
    num_disparities: int = 64,
    block_size: int = 5,
    uniqueness_ratio: float = 0.15,
    lr_threshold: float = 1.25,
    subpixel: bool = True,
):
    """Block-matching dense disparity, jittable, left-image frame.

    The TPU-native counterpart of the reference's OpenCV SGBM matcher
    (/root/reference/dynosam_cv/src/StereoMatcher.cc — used by the VIODE
    provider's `getDepthImage`, ViodeDataProvider.cc:91-103). Instead of the
    sequential SGM dynamic program (hostile to SIMD/MXU), this builds the
    full (D, H, W) SAD cost volume with shifted subtractions + box filters
    — pure fused elementwise/reduce-window work that XLA pipelines well —
    then winner-take-all with

      * parabolic sub-pixel refinement,
      * a uniqueness-ratio gate vs the best cost outside +-1 disparity
        (the `uniqueness_ratio_` parameter's role),
      * a left-right consistency check (reusing the same volume via
        cost_R[d, y, x] = cost_L[d, y, x + d]).

    Returns (disparity (H, W) float32, valid (H, W) bool); invalid pixels
    have disparity 0.
    """
    L = jnp.asarray(left_gray, jnp.float32)
    R = jnp.asarray(right_gray, jnp.float32)
    H, W = L.shape
    D = num_disparities
    half = block_size // 2
    big = jnp.float32(1e9)

    def cost_at(d):
        # R shifted right by d: R_d[:, x] = R[:, x - d]; x < d is invalid
        Rd = jnp.roll(R, d, axis=1)
        c = _box_filter(jnp.abs(L - Rd), half)
        return jnp.where(jnp.arange(W)[None, :] >= d, c, big)

    cost = jax.vmap(cost_at)(jnp.arange(D))              # (D, H, W)

    best = jnp.argmin(cost, axis=0)                      # (H, W) int
    cmin = jnp.min(cost, axis=0)

    # uniqueness: best cost outside the +-1 neighbourhood of the winner
    d_idx = jnp.arange(D)[:, None, None]
    near = jnp.abs(d_idx - best[None]) <= 1
    second = jnp.min(jnp.where(near, big, cost), axis=0)
    unique_ok = cmin * (1.0 + uniqueness_ratio) <= second

    # sub-pixel: parabola through (c[-1], c[0], c[+1])
    cm = jnp.take_along_axis(
        cost, jnp.clip(best - 1, 0, D - 1)[None], axis=0
    )[0]
    cp = jnp.take_along_axis(
        cost, jnp.clip(best + 1, 0, D - 1)[None], axis=0
    )[0]
    denom = cm - 2.0 * cmin + cp
    delta = jnp.where(
        denom > 1e-9, 0.5 * (cm - cp) / jnp.maximum(denom, 1e-9), 0.0
    )
    disp = best.astype(jnp.float32) + (
        jnp.clip(delta, -0.5, 0.5) if subpixel else 0.0
    )

    # left-right check: the right image's WTA at x_R = x - d must agree
    xs = jnp.arange(W)[None, :]
    cost_r = jax.vmap(
        lambda d: jnp.take_along_axis(
            cost[d], jnp.clip(xs + d, 0, W - 1), axis=1
        )
    )(jnp.arange(D))                                     # (D, H, W_right)
    best_r = jnp.argmin(cost_r, axis=0)                  # (H, W) right frame
    xr = jnp.clip(xs - best, 0, W - 1)
    lr = jnp.take_along_axis(best_r, xr, axis=1)
    lr_ok = jnp.abs(lr - best) <= lr_threshold

    valid = (
        unique_ok
        & lr_ok
        & (best > 0)
        & (best < D - 1)
        & (xs >= best)
        & (cmin < big)
    )
    return jnp.where(valid, disp, 0.0), valid


def dense_stereo_depth(
    left_gray,
    right_gray,
    fx: float,
    baseline: float,
    **kwargs,
):
    """Dense metric depth map from a rectified pair; 0 where invalid."""
    disp, valid = dense_disparity(left_gray, right_gray, **kwargs)
    depth = fx * baseline / jnp.maximum(disp, 1e-3)
    return jnp.where(valid, depth, 0.0)
