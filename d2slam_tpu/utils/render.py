"""Tiny synthetic image renderer for frontend integration tests.

Projects a world point cloud into pinhole cameras and splats Gaussian
blobs, giving the image pipeline (SuperPoint/LK/tracker) real pixels
with exact ground truth — the dataset-free stand-in for the
reference's rosbag-driven validation.
"""
from __future__ import annotations

import numpy as np

from d2slam_tpu.utils import np_lie


def render_blobs(
    pts_w: np.ndarray,          # [N, 3]
    T_w_cam: np.ndarray,        # [7]
    fx: float, fy: float, cx: float, cy: float,
    H: int, W: int,
    sigma: float = 1.5,
    base_texture: np.ndarray | None = None,
    intensities: np.ndarray | None = None,
    signatures: np.ndarray | None = None,
) -> np.ndarray:
    """Returns [H, W] float image in [0, 1].

    signatures: optional [N, 6] per-landmark appearance coefficients
    (3 amplitudes, 3 phases) painting an angular-harmonic ring AROUND
    each corner. Without them every landmark renders the same
    checkerboard corner and appearance-based descriptor matching is
    degenerate (every descriptor ~equals every other — the ratio test
    then rejects all matches); real-world features are distinctive, so
    loop-closure tests should pass ``make_signatures(n, seed)``.
    """
    R = np_lie.quat_to_rotmat(T_w_cam[3:])
    pc = (pts_w - T_w_cam[:3]) @ R
    vis = pc[:, 2] > 0.5
    u = fx * pc[vis, 0] / pc[vis, 2] + cx
    v = fy * pc[vis, 1] / pc[vis, 2] + cy
    if intensities is None:
        inten = np.ones(vis.sum())
    else:
        inten = intensities[vis]
    sigs = signatures[vis] if signatures is not None else None
    img = np.zeros((H, W), np.float64)
    if base_texture is not None:
        img += base_texture
    r = int(np.ceil((5 if sigs is not None else 3) * sigma))
    for k, (ui, vi, ii) in enumerate(zip(u, v, inten)):
        x0, y0 = int(round(ui)), int(round(vi))
        if not (r <= x0 < W - r and r <= y0 < H - r):
            continue
        ys, xs = np.mgrid[y0 - r : y0 + r + 1, x0 - r : x0 + r + 1]
        # checkerboard saddle centered EXACTLY at the subpixel
        # projection: sign(dx)*sign(dy) smoothed — a true corner that
        # detectors/LK localize consistently across viewpoints (plain
        # Gaussian blobs give viewpoint-dependent peak bias)
        dxs = (xs - ui) / sigma
        dys = (ys - vi) / sigma
        sx = np.tanh(2.0 * dxs)
        sy = np.tanh(2.0 * dys)
        env = np.exp(-(dxs**2 + dys**2) / 4.0)
        patch = ii * 0.5 * (sx * sy + 1.0) * env
        if sigs is not None:
            # unique angular ring at ~3 sigma: the center corner stays
            # clean (localization), the surround disambiguates identity
            rr = np.sqrt(dxs**2 + dys**2)
            phi = np.arctan2(dys, dxs)
            ring = 0.5 + (
                sigs[k, 0] * np.cos(2 * phi + sigs[k, 3])
                + sigs[k, 1] * np.cos(3 * phi + sigs[k, 4])
                + sigs[k, 2] * np.cos(4 * phi + sigs[k, 5])
            ) / max(np.abs(sigs[k, :3]).sum(), 1e-6) * 0.5
            ring_env = np.exp(-((rr - 3.0) ** 2) / 2.0)
            patch = patch + ii * 0.9 * ring * ring_env
        img[y0 - r : y0 + r + 1, x0 - r : x0 + r + 1] += patch
    return np.clip(img, 0.0, 1.0)


def make_signatures(n: int, seed: int = 0) -> np.ndarray:
    """Per-landmark appearance coefficients for ``render_blobs``."""
    rng = np.random.default_rng(seed)
    amps = rng.uniform(0.3, 1.0, (n, 3)) * rng.choice([-1, 1], (n, 3))
    phases = rng.uniform(0, 2 * np.pi, (n, 3))
    return np.concatenate([amps, phases], axis=1)
