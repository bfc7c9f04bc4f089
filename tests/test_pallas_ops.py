"""Pallas stereo kernel vs the XLA reference (interpreter mode on CPU)."""
import numpy as np

import jax.numpy as jnp

from d2slam_tpu.depth.stereo import block_match_disparity
from d2slam_tpu.ops.stereo_bm_pallas import (
    block_match_disparity_fused,
    block_match_disparity_pallas,
)


def make_pair(H=64, W=128, d_true=10):
    rng = np.random.default_rng(1)
    base = rng.uniform(0, 1, (H, W + 32))
    from numpy.lib.stride_tricks import sliding_window_view

    pad = np.pad(base, 1, mode="edge")
    base = (sliding_window_view(pad, (3, 3)) / 9).sum(axis=(2, 3))
    left = base[:, 16 : 16 + W]
    right = base[:, 16 + d_true : 16 + d_true + W]
    return (jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32),
            d_true)


def test_pallas_matches_xla_winner():
    left, right, d_true = make_pair()
    disp_p, cost_p, second_p = block_match_disparity_pallas(
        left, right, max_disp=24, block=7, interpret=True
    )
    disp_x, valid_x = block_match_disparity(left, right, max_disp=24, block=7)
    # compare integer winners where the XLA path deems them valid
    vx = np.asarray(valid_x)
    dp = np.asarray(disp_p)[vx]
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
