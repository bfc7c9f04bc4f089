"""Pallas stereo kernel vs the XLA reference (interpreter mode on CPU)."""
import numpy as np

import jax.numpy as jnp

from d2slam_tpu.depth.stereo import block_match_disparity
from d2slam_tpu.ops.stereo_bm_pallas import (
    block_match_disparity_fused,
    block_match_disparity_pallas,
)


def _smooth(base):
    from numpy.lib.stride_tricks import sliding_window_view

    pad = np.pad(base, 1, mode="edge")
    return (sliding_window_view(pad, (3, 3)) / 9).sum(axis=(2, 3))


def make_pair(H=64, W=128, d_true=10):
    rng = np.random.default_rng(1)
    base = _smooth(rng.uniform(0, 1, (H, W + 32)))
    left = base[:, 16 : 16 + W]
    right = base[:, 16 + d_true : 16 + d_true + W]
    return (jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32),
            d_true)


def make_pair_subpixel(H=64, W=128, d_true=10.4):
    """Right image shifted by a *fractional* disparity via linear
    interpolation of an oversampled signal."""
    rng = np.random.default_rng(3)
    base = _smooth(_smooth(rng.uniform(0, 1, (H, W + 64))))
    xs = np.arange(W)
    left = base[:, 16 : 16 + W]
    x_r = xs + 16 + d_true
    x0 = np.floor(x_r).astype(int)
    f = x_r - x0
    right = base[:, x0] * (1 - f) + base[:, x0 + 1] * f
    return (jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32),
            d_true)


def test_pallas_matches_xla_winner():
    left, right, d_true = make_pair()
    disp_p, best_p, cost_p, second_p = block_match_disparity_pallas(
        left, right, max_disp=24, block=7, interpret=True
    )
    disp_x, valid_x = block_match_disparity(left, right, max_disp=24, block=7)
    # compare integer winners where the XLA path deems them valid
    vx = np.asarray(valid_x)
    dp = np.asarray(best_p)[vx]
    dx = np.round(np.asarray(disp_x))[vx]
    agree = (np.abs(dp - dx) <= 1).mean()
    assert agree > 0.95, f"winner agreement {agree}"
    assert np.median(np.abs(dp - d_true)) <= 1


def test_pallas_fused_validity():
    left, right, d_true = make_pair()
    disp, valid = block_match_disparity_fused(
        left, right, max_disp=24, block=7, interpret=True
    )
    valid = np.asarray(valid)
    assert valid.mean() > 0.3
    err = np.abs(np.asarray(disp)[valid] - d_true)
    assert np.median(err) <= 1.0


def test_pallas_subpixel_refinement():
    left, right, d_true = make_pair_subpixel(d_true=10.4)
    disp, valid = block_match_disparity_fused(
        left, right, max_disp=24, block=7, interpret=True
    )
    valid = np.asarray(valid)
    assert valid.mean() > 0.3
    err = np.abs(np.asarray(disp)[valid] - d_true)
    # in-kernel parabolic refinement must beat integer resolution
    assert np.median(err) < 0.35, f"median subpixel error {np.median(err)}"


def test_pallas_row_tiling_matches_single_band():
    left, right, _ = make_pair(H=96, W=128)
    full = block_match_disparity_pallas(
        left, right, max_disp=24, block=7, interpret=True
    )
    tiled = block_match_disparity_pallas(
        left, right, max_disp=24, block=7, row_tile=32, interpret=True
    )
    for a, b in zip(full, tiled):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
