"""Camera calibration tools.

TPU-native equivalent of the reference's Python calibration tooling
(reference: quadcam_tools/ — stereo_calib.py fisheye calibration,
photometric/vignette calibration): checkerboard intrinsic calibration
as a jitted LM over (intrinsics, per-view poses) using the same
AD-through-retraction machinery as the estimator, and radial vignette
fitting.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from d2slam_tpu.geometry.cameras import (
    KBParams,
    PinholeParams,
    kb_project,
    pinhole_project,
)
from d2slam_tpu.geometry.lie import pose_boxplus, quat_conj, quat_rotate
from d2slam_tpu.utils import np_lie


def _init_poses(board_pts, img_pts_list, f_guess, cx, cy):
    """Rough per-view pose init: planar homography-free PnP via our DLT
    on normalized points (board z=0, points well-spread)."""
    from d2slam_tpu.frontend.pnp import ransac_pnp

    poses = []
    for img_pts in img_pts_list:
        rays = np.concatenate(
            [(img_pts - [cx, cy]) / f_guess, np.ones((len(img_pts), 1))],
            axis=1,
        )
        rays /= np.linalg.norm(rays, axis=1, keepdims=True)
        T, inl = ransac_pnp(rays, board_pts, thresh=0.05, iters=50,
                            min_inliers=6)
        if T is None:
            # fallback: board 0.5 m in front
            T = np.array([0, 0, -0.5, 0, 0, 0, 1.0])
        poses.append(np_lie.pose_inverse(T))  # cam_T_world
    return np.stack(poses)


def _lm_calibrate(residual_fn, x0, n_iters=30, lam0=1e-3):
    """Small dense LM on a flat parameter vector (host-driven loop,
    jitted residual+jacobian)."""
    jac = jax.jit(jax.jacfwd(residual_fn))
    res = jax.jit(residual_fn)
    x = x0
    lam = lam0
    cost = float(jnp.sum(res(x) ** 2))
    for _ in range(n_iters):
        r = np.asarray(res(x))
        J = np.asarray(jac(x))
        H = J.T @ J
        g = J.T @ r
        Hd = H + lam * np.diag(np.maximum(np.diag(H), 1e-9))
        try:
            dx = -np.linalg.solve(Hd, g)
        except np.linalg.LinAlgError:
            lam *= 10
            continue
        x_new = x + dx
        c_new = float(jnp.sum(res(jnp.asarray(x_new)) ** 2))
        if c_new < cost:
            x, cost, lam = jnp.asarray(x_new), c_new, lam * 0.5
        else:
            lam *= 4
    return x, cost


def calibrate_pinhole(
    board_pts: np.ndarray,            # [K, 3] board-frame corners (z=0)
    img_pts_list: List[np.ndarray],   # V x [K, 2] detected pixels
    img_size: Tuple[int, int],
    f_guess: float | None = None,
) -> Tuple[PinholeParams, float]:
    """Calibrate fx, fy, cx, cy, k1, k2, p1, p2. Returns (params,
    RMS reprojection error in px)."""
    W, H = img_size
    cx0, cy0 = W / 2.0, H / 2.0
    f0 = f_guess or 1.2 * max(W, H) / 2.0
    V = len(img_pts_list)
    poses0 = _init_poses(board_pts, img_pts_list, f0, cx0, cy0)

    board = jnp.asarray(board_pts, jnp.float64)
    obs = jnp.asarray(np.stack(img_pts_list), jnp.float64)  # [V, K, 2]
    poses0_j = jnp.asarray(poses0, jnp.float64)

    def unpack(x):
        intr = x[:8]
        dpose = x[8:].reshape(V, 6)
        return intr, dpose

    def residual(x):
        intr, dpose = unpack(x)
        params = PinholeParams(*[intr[i] for i in range(8)])
        poses = jax.vmap(pose_boxplus)(poses0_j, dpose)  # cam_T_world

        def per_view(pose, o):
            pc = quat_rotate(pose[3:], board) + pose[:3]
            uv, valid = pinhole_project(pc, params)
            return ((uv - o) * valid[:, None]).reshape(-1)

        return jax.vmap(per_view)(poses, obs).reshape(-1)

    x0 = jnp.concatenate([
        jnp.asarray([f0, f0, cx0, cy0, 0, 0, 0, 0], jnp.float64),
        jnp.zeros(V * 6, jnp.float64),
    ])
    x, cost = _lm_calibrate(residual, x0)
    intr, _ = unpack(x)
    n = sum(len(p) for p in img_pts_list)
    rms = float(np.sqrt(cost / n))
    return PinholeParams(*[float(intr[i]) for i in range(8)]), rms


def calibrate_kb(
    board_pts: np.ndarray,
    img_pts_list: List[np.ndarray],
    img_size: Tuple[int, int],
    f_guess: float | None = None,
) -> Tuple[KBParams, float]:
    """Calibrate a Kannala-Brandt fisheye (fx, fy, cx, cy, k2..k5)."""
    W, H = img_size
    cx0, cy0 = W / 2.0, H / 2.0
    f0 = f_guess or 0.6 * max(W, H) / 2.0
    V = len(img_pts_list)
    poses0 = _init_poses(board_pts, img_pts_list, f0, cx0, cy0)

    board = jnp.asarray(board_pts, jnp.float64)
    obs = jnp.asarray(np.stack(img_pts_list), jnp.float64)
    poses0_j = jnp.asarray(poses0, jnp.float64)

    def residual(x):
        intr = x[:8]
        dpose = x[8:].reshape(V, 6)
        params = KBParams(*[intr[i] for i in range(8)])
        poses = jax.vmap(pose_boxplus)(poses0_j, dpose)

        def per_view(pose, o):
            pc = quat_rotate(pose[3:], board) + pose[:3]
            uv, valid = kb_project(pc, params)
            return ((uv - o) * valid[:, None]).reshape(-1)

        return jax.vmap(per_view)(poses, obs).reshape(-1)

    x0 = jnp.concatenate([
        jnp.asarray([f0, f0, cx0, cy0, 0, 0, 0, 0], jnp.float64),
        jnp.zeros(V * 6, jnp.float64),
    ])
    x, cost = _lm_calibrate(residual, x0)
    n = sum(len(p) for p in img_pts_list)
    rms = float(np.sqrt(cost / n))
    return KBParams(*[float(x[i]) for i in range(8)]), rms


def calibrate_stereo_extrinsic(
    board_pts: np.ndarray,             # [K, 3] board-frame corners (z=0)
    img_pts0_list: List[np.ndarray],   # V x [K, 2] pixels in camera 0
    img_pts1_list: List[np.ndarray],   # V x [K, 2] pixels in camera 1
    project0,                          # pts_cam [K,3] -> (uv [K,2], valid [K])
    project1,
    intr0_f: float,
    intr0_c: Tuple[float, float],
    intr1_f: float,
    intr1_c: Tuple[float, float],
) -> Tuple[np.ndarray, float]:
    """Stereo extrinsic calibration: cam1_T_cam0 from joint checkerboard
    views (reference: quadcam_tools/stereo_calib.py, calib_stereos.py —
    cv2.stereoCalibrate over the camera chain). Intrinsics are fixed
    (calibrate per-camera first); the LM jointly refines the relative
    pose and the per-view board poses.

    project0/project1: intrinsic projection closures (e.g.
    ``lambda pc: pinhole_project(pc, params0)``).
    Returns (rel_pose [7] cam1_T_cam0, RMS reprojection error px).
    """
    V = len(img_pts0_list)
    assert len(img_pts1_list) == V
    poses0 = _init_poses(board_pts, img_pts0_list, intr0_f, *intr0_c)
    poses1 = _init_poses(board_pts, img_pts1_list, intr1_f, *intr1_c)
    # per-view relative estimates cam1_T_cam0 = pose1 ∘ pose0^-1; average
    rels = np.stack([
        np_lie.pose_compose(poses1[v], np_lie.pose_inverse(poses0[v]))
        for v in range(V)
    ])
    rel0 = rels[0].copy()
    rel0[:3] = rels[:, :3].mean(0)

    board = jnp.asarray(board_pts, jnp.float64)
    obs0 = jnp.asarray(np.stack(img_pts0_list), jnp.float64)
    obs1 = jnp.asarray(np.stack(img_pts1_list), jnp.float64)
    poses0_j = jnp.asarray(poses0, jnp.float64)
    rel0_j = jnp.asarray(rel0, jnp.float64)

    def residual(x):
        drel = x[:6]
        dpose = x[6:].reshape(V, 6)
        rel = pose_boxplus(rel0_j, drel)
        poses = jax.vmap(pose_boxplus)(poses0_j, dpose)  # cam0_T_world

        def per_view(pose, o0, o1):
            pc0 = quat_rotate(pose[3:], board) + pose[:3]
            uv0, v0 = project0(pc0)
            pc1 = quat_rotate(rel[3:], pc0) + rel[:3]
            uv1, v1 = project1(pc1)
            return jnp.concatenate([
                ((uv0 - o0) * v0[:, None]).reshape(-1),
                ((uv1 - o1) * v1[:, None]).reshape(-1),
            ])

        return jax.vmap(per_view)(poses, obs0, obs1).reshape(-1)

    x0 = jnp.zeros(6 + V * 6, jnp.float64)
    x, cost = _lm_calibrate(residual, x0)
    rel = np.asarray(pose_boxplus(rel0_j, x[:6]))
    n = 2 * sum(len(p) for p in img_pts0_list)
    rms = float(np.sqrt(cost / n))
    return rel, rms


def calibrate_vignette(mean_image: np.ndarray, cx=None, cy=None,
                       degree: int = 3):
    """Fit a radial attenuation polynomial v(r) = 1 + a1 r^2 + ... from
    a mean flat-field image (reference photometric calibration).
    Returns (coeffs [degree], correction_image)."""
    H, W = mean_image.shape
    cx = W / 2.0 if cx is None else cx
    cy = H / 2.0 if cy is None else cy
    ys, xs = np.mgrid[0:H, 0:W]
    r2 = ((xs - cx) ** 2 + (ys - cy) ** 2) / (max(H, W) / 2.0) ** 2
    center_val = np.median(
        mean_image[int(cy) - 5 : int(cy) + 5, int(cx) - 5 : int(cx) + 5]
    )
    ratio = mean_image.flatten() / max(center_val, 1e-9)
    A = np.stack([r2.flatten() ** (k + 1) for k in range(degree)], axis=1)
    coeffs, *_ = np.linalg.lstsq(A, ratio - 1.0, rcond=None)
    vignette = 1.0 + A @ coeffs
    correction = (1.0 / np.maximum(vignette, 0.05)).reshape(H, W)
    return coeffs, correction
