"""Headless visualization suite.

TPU-native (ROS-free) counterpart of the reference's D2Visualization
publishers — odometry, per-drone paths, landmark point clouds, camera
poses, sliding-window markers (reference:
d2vins/src/visualization/visualization.cpp:39-194) — and the frontend
draw overlays (feature tracks / stereo matches / loop matches,
reference: d2frontend/src/d2featuretracker.cpp:843-1000). All figures
render with the matplotlib Agg backend to PNG files or RGB arrays, so
they work in any headless container; the image overlay functions are
pure numpy and can feed any sink (disk, notebook, video writer).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

_DRONE_COLORS = ["tab:blue", "tab:orange", "tab:green", "tab:red",
                 "tab:purple", "tab:brown", "tab:pink", "tab:gray"]


def plot_trajectories(
    trajs: Dict[int, np.ndarray],
    gt: Optional[Dict[int, np.ndarray]] = None,
    path: Optional[str] = None,
    title: str = "trajectories",
    loops: Optional[Sequence] = None,
):
    """Top-down + height profile of per-drone trajectories.

    trajs: {drone_id: [N, 3] or [N, 7] positions(+quat)}; gt optional
    with the same layout; loops: optional [(drone_a, idx_a, drone_b,
    idx_b)] inter-drone loop edges drawn as dashed segments.
    Returns the matplotlib figure (saved to `path` when given).
    """
    fig, (ax1, ax2) = plt.subplots(
        1, 2, figsize=(11, 4.5), gridspec_kw={"width_ratios": [2, 1]}
    )
    for i, (did, arr) in enumerate(sorted(trajs.items())):
        p = np.asarray(arr)[:, :3]
        c = _DRONE_COLORS[i % len(_DRONE_COLORS)]
        ax1.plot(p[:, 0], p[:, 1], color=c, label=f"drone {did}")
        ax1.scatter(p[0, 0], p[0, 1], color=c, marker="^", s=40)
        ax2.plot(p[:, 2], color=c)
    if gt:
        for i, (did, arr) in enumerate(sorted(gt.items())):
            p = np.asarray(arr)[:, :3]
            ax1.plot(p[:, 0], p[:, 1], "k--", alpha=0.4,
                     label="gt" if i == 0 else None)
            ax2.plot(p[:, 2], "k--", alpha=0.4)
    if loops:
        for (da, ia, db, ib) in loops:
            pa = np.asarray(trajs[da])[ia, :3]
            pb = np.asarray(trajs[db])[ib, :3]
            ax1.plot([pa[0], pb[0]], [pa[1], pb[1]], "r:", alpha=0.7, lw=0.8)
    ax1.set_aspect("equal")
    ax1.set_xlabel("x [m]"); ax1.set_ylabel("y [m]")
    ax1.legend(fontsize=8)
    ax1.set_title(title)
    ax2.set_xlabel("keyframe"); ax2.set_ylabel("z [m]")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def plot_sliding_window(
    poses: np.ndarray,           # [W, 7]
    landmarks: Optional[np.ndarray] = None,   # [L, 3]
    landmark_valid: Optional[np.ndarray] = None,
    path: Optional[str] = None,
    title: str = "sliding window",
):
    """Sliding-window state: keyframe poses (with heading tick) and the
    triangulated landmark cloud (reference sliding-window markers +
    landmark point cloud publishers)."""
    from d2slam_tpu.utils import np_lie

    poses = np.asarray(poses)
    fig, ax = plt.subplots(figsize=(6, 6))
    p = poses[:, :3]
    ax.plot(p[:, 0], p[:, 1], "o-", color="tab:blue", ms=4, label="window")
    for i in range(len(poses)):
        R = np_lie.quat_to_rotmat(poses[i, 3:])
        fwd = R @ np.array([1.0, 0, 0]) * 0.3
        ax.arrow(p[i, 0], p[i, 1], fwd[0], fwd[1], head_width=0.05,
                 color="tab:blue", alpha=0.6)
    if landmarks is not None:
        lm = np.asarray(landmarks)
        m = (np.asarray(landmark_valid).astype(bool)
             if landmark_valid is not None else np.ones(len(lm), bool))
        ax.scatter(lm[m, 0], lm[m, 1], s=4, c="tab:green", alpha=0.5,
                   label=f"landmarks ({int(m.sum())})")
    ax.set_aspect("equal")
    ax.legend(fontsize=8)
    ax.set_title(title)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def plot_pose_graph(
    poses: Dict[int, np.ndarray],       # {drone: [N, >=3]}
    odometry_edges: bool = True,
    loop_edges: Optional[Sequence] = None,  # [(da, ia, db, ib)]
    path: Optional[str] = None,
    title: str = "pose graph",
):
    """Pose-graph structure view (reference d2pgo path publishers +
    g2o snapshots)."""
    fig, ax = plt.subplots(figsize=(7, 6))
    for i, (did, arr) in enumerate(sorted(poses.items())):
        p = np.asarray(arr)[:, :3]
        c = _DRONE_COLORS[i % len(_DRONE_COLORS)]
        if odometry_edges:
            ax.plot(p[:, 0], p[:, 1], "-", color=c, lw=0.8, alpha=0.8)
        ax.scatter(p[:, 0], p[:, 1], s=6, color=c, label=f"drone {did}")
    if loop_edges:
        for (da, ia, db, ib) in loop_edges:
            pa = np.asarray(poses[da])[ia, :3]
            pb = np.asarray(poses[db])[ib, :3]
            ax.plot([pa[0], pb[0]], [pa[1], pb[1]], "r--", lw=0.7, alpha=0.8)
    ax.set_aspect("equal")
    ax.legend(fontsize=8)
    ax.set_title(title)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


# ---------------------------------------------------------------------------
# image overlays (pure numpy -> RGB uint8 arrays)
# ---------------------------------------------------------------------------


def _to_rgb(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0 if img.max() <= 1.5 else img, 0, 255)
        img = img.astype(np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img.copy()


def _draw_disc(rgb, x, y, color, r=2):
    H, W, _ = rgb.shape
    xi, yi = int(round(x)), int(round(y))
    y0, y1 = max(0, yi - r), min(H, yi + r + 1)
    x0, x1 = max(0, xi - r), min(W, xi + r + 1)
    if y0 >= y1 or x0 >= x1:
        return
    yy, xx = np.mgrid[y0:y1, x0:x1]
    m = (yy - yi) ** 2 + (xx - xi) ** 2 <= r * r
    rgb[y0:y1, x0:x1][m] = color


def _draw_line(rgb, x0, y0, x1, y1, color):
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) * 2
    xs = np.linspace(x0, x1, n).round().astype(int)
    ys = np.linspace(y0, y1, n).round().astype(int)
    H, W, _ = rgb.shape
    ok = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    rgb[ys[ok], xs[ok]] = color


def draw_feature_tracks(
    img: np.ndarray,
    kpts_prev: np.ndarray,   # [N, 2]
    kpts_cur: np.ndarray,    # [N, 2]
    mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Track overlay: current keypoints (green) with motion trails to
    the previous frame (the reference's cv::line/cv::circle track
    drawing, d2featuretracker.cpp:843-1000). Returns RGB uint8."""
    rgb = _to_rgb(img)
    kp, kc = np.asarray(kpts_prev), np.asarray(kpts_cur)
    m = (np.asarray(mask).astype(bool) if mask is not None
         else np.ones(len(kc), bool))
    for i in range(len(kc)):
        if not m[i]:
            continue
        _draw_line(rgb, kp[i, 0], kp[i, 1], kc[i, 0], kc[i, 1],
                   (255, 160, 0))
        _draw_disc(rgb, kc[i, 0], kc[i, 1], (0, 220, 0))
    return rgb


def draw_matches(
    img_a: np.ndarray,
    img_b: np.ndarray,
    kpts_a: np.ndarray,
    kpts_b: np.ndarray,
    mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Side-by-side match visualization (the reference's loop/stereo
    match debug images). Returns RGB uint8 [H, Wa+Wb, 3]."""
    ra, rb = _to_rgb(img_a), _to_rgb(img_b)
    H = max(ra.shape[0], rb.shape[0])
    canvas = np.zeros((H, ra.shape[1] + rb.shape[1], 3), np.uint8)
    canvas[: ra.shape[0], : ra.shape[1]] = ra
    canvas[: rb.shape[0], ra.shape[1]:] = rb
    ka, kb = np.asarray(kpts_a), np.asarray(kpts_b)
    m = (np.asarray(mask).astype(bool) if mask is not None
         else np.ones(len(ka), bool))
    off = ra.shape[1]
    for i in range(len(ka)):
        if not m[i]:
            continue
        _draw_disc(canvas, ka[i, 0], ka[i, 1], (0, 220, 0))
        _draw_disc(canvas, kb[i, 0] + off, kb[i, 1], (0, 220, 0))
        _draw_line(canvas, ka[i, 0], ka[i, 1], kb[i, 0] + off, kb[i, 1],
                   (60, 160, 255))
    return canvas


def disparity_to_rgb(disp: np.ndarray, max_disp: float = 32.0) -> np.ndarray:
    """Colormapped disparity (the reference's disp_show conversion,
    virtual_stereo.cpp:170)."""
    d = np.clip(np.asarray(disp, np.float64) / max_disp, 0.0, 1.0)
    cmap = plt.get_cmap("turbo")
    return (cmap(d)[..., :3] * 255).astype(np.uint8)
