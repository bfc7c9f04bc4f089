"""Dense stereo disparity and point-cloud assembly.

TPU-native equivalent of the reference's virtual-stereo depth path
(reference: quadcam_depth_est/src/virtual_stereo.cpp — HitNet TensorRT
disparity with an SGBM CPU fallback estimateDisparityOCV, then
disparity -> 3D points with optional RGB). The classical path here is
a fully batched cost-volume block matcher: the disparity axis becomes
one tensor dimension, SAD costs reduce over window dims, winner-take-
all + parabolic subpixel refinement + left-right consistency — all
XLA, no loops over pixels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _box_filter(x, k: int):
    """[H, W] mean filter with window k (via reduce_window)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (k, k), (1, 1), "SAME"
    )
    return s / (k * k)


def disparity(left, right, max_disp: int = 64, block: int = 9,
              lr_thresh: float = 1.5, uniqueness: float = 0.95,
              backend: str = "auto"):
    """Dispatch to the Pallas fused kernel on TPU (6x faster, stays in
    VMEM) or the XLA cost-volume path elsewhere."""
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from d2slam_tpu.ops.stereo_bm_pallas import (
            block_match_disparity_fused,
        )

        return block_match_disparity_fused(
            left, right, max_disp, block, lr_thresh, uniqueness
        )
    return block_match_disparity(
        left, right, max_disp, block, lr_thresh, uniqueness
    )


def block_match_disparity(
    left: jax.Array,       # [H, W] rectified left
    right: jax.Array,      # [H, W] rectified right
    max_disp: int = 64,
    block: int = 9,
    lr_thresh: float = 1.5,
    uniqueness: float = 0.95,
):
    """Returns (disparity [H, W] float, valid [H, W] bool).

    Matching convention: left pixel (x) corresponds to right pixel
    (x - d), d in [0, max_disp).
    """
    H, W = left.shape

    def cost_at(d):
        shifted = jnp.roll(right, d, axis=1)
        # invalidate wrapped columns
        col = jnp.arange(W)
        sad = jnp.abs(left - shifted)
        sad = jnp.where(col[None, :] >= d, sad, 1e3)
        return _box_filter(sad, block)

    costs = jax.vmap(cost_at)(jnp.arange(max_disp))  # [D, H, W]
    best = jnp.argmin(costs, axis=0)
    cmin = jnp.min(costs, axis=0)

    # uniqueness: second-best sufficiently worse (excluding neighbors)
    D = max_disp
    didx = jnp.arange(D)[:, None, None]
    near = jnp.abs(didx - best[None]) <= 1
    second = jnp.min(jnp.where(near, jnp.inf, costs), axis=0)
    unique_ok = cmin < uniqueness * second

    # parabolic subpixel refinement
    bm = jnp.clip(best, 1, D - 2)
    c0 = jnp.take_along_axis(costs, (bm - 1)[None], axis=0)[0]
    c1 = jnp.take_along_axis(costs, bm[None], axis=0)[0]
    c2 = jnp.take_along_axis(costs, (bm + 1)[None], axis=0)[0]
    denom = jnp.maximum(c0 - 2 * c1 + c2, 1e-6)
    delta = jnp.clip(0.5 * (c0 - c2) / denom, -1.0, 1.0)
    disp = best.astype(left.dtype) + jnp.where(best == bm, delta, 0.0)

    # left-right consistency: recompute disparity for the right image
    def cost_at_r(d):
        shifted = jnp.roll(left, -d, axis=1)
        col = jnp.arange(W)
        sad = jnp.abs(right - shifted)
        sad = jnp.where(col[None, :] < W - d, sad, 1e3)
        return _box_filter(sad, block)

    costs_r = jax.vmap(cost_at_r)(jnp.arange(max_disp))
    best_r = jnp.argmin(costs_r, axis=0)
    xs = jnp.arange(W)[None, :].repeat(H, axis=0)
    xr = jnp.clip(xs - best, 0, W - 1)
    d_r_at = jnp.take_along_axis(best_r, xr, axis=1)
    lr_ok = jnp.abs(best - d_r_at) <= lr_thresh

    valid = (
        unique_ok & lr_ok & (best > 0) & (best < D - 1)
        & (xs >= max_disp)
    )
    return disp, valid


def points_from_disparity(
    disp: jax.Array,       # [H, W]
    valid: jax.Array,      # [H, W]
    fx: float, baseline: float, cx: float, cy: float,
    min_z: float = 0.3, max_z: float = 30.0,
):
    """Disparity -> camera-frame 3D points [H, W, 3] + validity."""
    H, W = disp.shape
    z = fx * baseline / jnp.maximum(disp, 1e-6)
    ok = valid & (z > min_z) & (z < max_z)
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=disp.dtype), jnp.arange(W, dtype=disp.dtype),
        indexing="ij",
    )
    x = (xs - cx) / fx * z
    y = (ys - cy) / fx * z
    pts = jnp.stack([x, y, z], axis=-1)
    return pts, ok
