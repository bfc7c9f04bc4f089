"""Fused stereo block-matching disparity as a Pallas TPU kernel.

The XLA reference implementation (d2slam_tpu/depth/stereo.py) builds the
full [D, H, W] cost volume in HBM (D=64 disparities -> 64x the image in
bandwidth). This kernel keeps everything in VMEM: the disparity loop
streams on-chip — per step one incremental roll of the right image,
SAD, separable box filter, and a running winner/second-best update —
writing only [H, W] outputs. Classic bandwidth-bound -> compute-bound
conversion (pallas_guide.md: fuse elementwise chains, avoid HBM round
trips).

Sized for the reference's depth resolution (HitNet runs at 320x240,
reference quadcam models): a full image + temporaries fit comfortably
in the ~16 MB VMEM, so the kernel is a single grid step; larger images
would tile rows with manual halo DMA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bm_kernel(left_ref, right_ref, disp_ref, cost_ref, second_ref,
               *, max_disp: int, block: int, height: int, width: int,
               reverse: bool):
    r = block // 2
    L = left_ref[:]    # [H + 2r, W] (vertical halo padded by wrapper)
    R = right_ref[:]
    # pltpu.roll requires non-negative shifts: -s == W - s
    step = (width - 1) if reverse else 1

    col = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)

    def body(d, carry):
        best_c, best_d, second_c, Rshift = carry
        sad = jnp.abs(L - Rshift)
        # vertical box sum over the halo -> [H, W]
        vs = jnp.zeros((height, width), jnp.float32)
        for dy in range(block):  # static offsets -> static slices
            vs = vs + sad[dy : dy + height, :]
        # horizontal box sum via static rolls
        hs = vs
        for dx in range(1, r + 1):
            hs = hs + pltpu.roll(vs, dx, axis=1) \
                + pltpu.roll(vs, width - dx, axis=1)
        c = hs * (1.0 / (block * block))
        invalid = (col < d) if not reverse else (col >= width - d)
        c = jnp.where(invalid, 1e3, c)

        take = c < best_c
        far_old = jnp.abs(best_d - d) > 1
        new_second = jnp.where(
            take,
            jnp.where(far_old, jnp.minimum(second_c, best_c), second_c),
            jnp.where(far_old, jnp.minimum(second_c, c), second_c),
        )
        new_best_c = jnp.where(take, c, best_c)
        new_best_d = jnp.where(take, d, best_d)
        return new_best_c, new_best_d, new_second, pltpu.roll(
            Rshift, step, axis=1
        )

    init = (
        jnp.full((height, width), 1e9, jnp.float32),
        jnp.zeros((height, width), jnp.int32),
        jnp.full((height, width), 1e9, jnp.float32),
        R,
    )
    best_c, best_d, second_c, _ = jax.lax.fori_loop(0, max_disp, body, init)

    disp_ref[:] = best_d.astype(jnp.float32)
    cost_ref[:] = best_c
    second_ref[:] = second_c


@functools.partial(jax.jit, static_argnames=("max_disp", "block", "reverse",
                                             "interpret"))
def block_match_disparity_pallas(
    left: jax.Array,   # [H, W] float32
    right: jax.Array,
    max_disp: int = 64,
    block: int = 9,
    reverse: bool = False,
    interpret: bool = False,
):
    """Returns (disp [H, W] float32 integer-valued, cost, second_cost).

    ``interpret=True`` runs the Pallas interpreter (CPU tests)."""
    H, W = left.shape
    r = block // 2
    Lp = jnp.pad(left.astype(jnp.float32), ((r, r), (0, 0)), mode="edge")
    Rp = jnp.pad(right.astype(jnp.float32), ((r, r), (0, 0)), mode="edge")

    kernel = functools.partial(
        _bm_kernel, max_disp=max_disp, block=block, height=H, width=W,
        reverse=reverse,
    )
    out_shape = [
        jax.ShapeDtypeStruct((H, W), jnp.float32),
        jax.ShapeDtypeStruct((H, W), jnp.float32),
        jax.ShapeDtypeStruct((H, W), jnp.float32),
    ]
    disp, cost, second = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        interpret=interpret,
    )(Lp, Rp)
    return disp, cost, second


def block_match_disparity_fused(
    left, right, max_disp: int = 64, block: int = 9,
    lr_thresh: float = 1.5, uniqueness: float = 0.95,
    interpret: bool = False,
):
    """Drop-in equivalent of depth.stereo.block_match_disparity built on
    the Pallas kernel (integer disparity; uniqueness + left-right checks
    applied in XLA on the kernel outputs)."""
    H, W = left.shape
    disp, cost, second = block_match_disparity_pallas(
        left, right, max_disp, block, reverse=False, interpret=interpret
    )
    disp_r, _, _ = block_match_disparity_pallas(
        right, left, max_disp, block, reverse=True, interpret=interpret
    )
    best = disp.astype(jnp.int32)
    unique_ok = cost < uniqueness * second
    xs = jnp.arange(W)[None, :].repeat(H, axis=0)
    xr = jnp.clip(xs - best, 0, W - 1)
    d_r_at = jnp.take_along_axis(disp_r.astype(jnp.int32), xr, axis=1)
    lr_ok = jnp.abs(best - d_r_at) <= lr_thresh
    valid = (
        unique_ok & lr_ok & (best > 0) & (best < max_disp - 1)
        & (xs >= max_disp)
    )
    return disp, valid
