"""Fused SuperPoint stem (conv1a+relu+conv1b+relu+maxpool2) in Pallas.

The stem's full-resolution 64-channel activations are the single
biggest HBM liability in extraction: at 480x640 each layer is ~157 MB
bf16, and XLA's conv layout assignment shuffles it through several
layout copies plus a full-res reduce_window — measured ~2.2 ms of the
6.4 ms quad extraction on a v5e (round-5 op profile: copy.36 0.76 ms,
slice.56 0.51 ms, first maxpool 0.75 ms), with the MXU mostly idle.

This kernel streams the stem through VMEM in 32-row tiles and keeps
everything in a Mosaic-friendly "pixel-sublane x channel-lane" 2-D
layout (found by probing: lane-aligned minor-dim inserts, major-dim
merges, and arbitrary sublane-offset slices compile; lane-offset
reshapes and stride-2 lane slices do not):

  * conv1a: 9 taps gather into a [P, 16] im2col via aligned
    minor-insert FMAs (16 lanes, not 64 -> 4x less VPU work), then ONE
    [P, 16] x [16, 64] MXU matmul;
  * conv1b: the [P, 64] activation slides by ``dy*pitch + dx`` ROW
    offsets (sublane shifts are free), 9 [P, 64] x [64, 64] MXU
    contractions accumulate in f32;
  * pool: 2x1 row pool + adjacent-column max in-kernel; the final
    stride-2 column decimation happens in XLA on the [H/2, W_pitch]
    output (a cheap strided slice — Mosaic has no lane decimation).

Only ~2x the pooled output (~20 MB/image bf16) ever touches HBM vs
~470 MB of activation traffic on the XLA path. Matches the XLA bf16
compute path to bf16 rounding; parity pinned by
tests/test_pallas_ops.py (interpret mode) and the TPU golden pins.

Reference role: the stem is the bulk of the SuperPoint backbone the
reference runs under TensorRT (d2frontend/src/CNN/
superpoint_tensorrt.cpp); this is its TPU-native replacement.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 16          # output rows per grid step (pre-pool): small
#                  tiles bound Mosaic's scoped-VMEM liveness (32-row
#                  tiles peaked 74 MB); the whole-image input block is
#                  NOT re-DMA'd per tile (same block index across t)
PAD = 2          # top/left zero padding baked into the padded input


def _stem_kernel(xp_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                 out1_ref, *, width: int, hlimit: int):
    """One (image, row-tile) grid instance.

    xp_ref:  [1, 3, H+8, Wp] bf16 — dx-pre-shifted padded image planes:
             plane dx at (r, c) holds base(r, c+dx) where base(r, c) =
             orig(r-2, c-3)
    w1_ref:  [16, 64] conv1a taps at rows dy*3+dx (9 used)
    w2_ref:  [3, 192, 64] conv1b taps, dx-concatenated per dy
    b*_ref:  [1, 64]
    out_ref: [1, TH//2, W1, 64] row-pooled + adjacent-col-max tile
             (caller decimates columns with a stride-2 XLA slice)
    out1_ref: [P1, 64] bf16 VMEM scratch for the conv1a activation —
             a REF, so conv1b's 9 shifted reads don't pin 9 live
             register copies (the unrolled-value variant peaked 69 MB
             of scoped VMEM)
    """
    t = pl.program_id(1)
    r0 = t * TH
    W1 = width + 16           # out1 pitch: 16-aligned so the dy*W1
    #                           scratch reads stay bf16-tile-aligned
    H1 = TH + 3               # out1 rows (1 slack row for the 2-D shifts)
    P1 = H1 * W1
    P2 = TH * W1

    # ---- conv1a as im2col (16 lanes) + one MXU matmul ----------------
    # load each plane ONCE at the 32-aligned row offset (VMEM loads
    # need provably 8-aligned starts); the dy shifts are in-register
    # sublane slices, which carry no alignment constraint
    planes = [
        xp_ref[0, dx, pl.ds(pl.multiple_of(r0, TH), TH + 8), 0:W1]
        .astype(jnp.float32)  # minor-dim inserts are 32-bit-only
        for dx in range(3)
    ]
    # xcol[p, tap] = input value under tap (dy, dx) at out1 pixel p:
    # out1 pixel (i, j) = orig (r0-1+i, j-2); tap (dy, dx) reads
    # orig(r0+i+dy-2, j+dx-3) = plane[dx][r0+i+dy, j]. Built as a
    # one-hot where-CHAIN: each step is a fused [H1, W1, 16] select
    # (an expand_dims+concat build materialized 9 lane-padded
    # [H1, W1, 1] temps — ~28 M VMEM slots/tile, 3.5 ms of pure VPU
    # shuffling at quad scale)
    eye = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 16), 2)
    xcol = jnp.zeros((H1, W1, 16), jnp.float32)
    k = 0
    for dy in range(3):
        for dx in range(3):
            patch = planes[dx][dy:dy + H1, :]
            xcol = jnp.where(eye == k, patch[:, :, None], xcol)
            k += 1
    a1 = jnp.dot(xcol.reshape(P1, 16).astype(jnp.bfloat16), w1_ref[:, :],
                 preferred_element_type=jnp.float32)
    # conv1b must see SAME-padding ZEROS outside the image: the
    # extended conv1a values at orig col -1 / col W / row -1 / row H
    # are nonzero (they read real border pixels) and would leak in
    p = jax.lax.broadcasted_iota(jnp.int32, (P1, 1), 0)
    i, j = p // W1, p % W1
    orig_row = r0 - 1 + i                 # out1 row i = orig row r0-1+i
    valid = ((j >= 2) & (j <= width + 1)
             & (orig_row >= 0) & (orig_row <= hlimit - 1))
    out1_ref[:, :] = jnp.where(
        valid,
        jnp.maximum(a1 + b1_ref[0][None, :].astype(jnp.float32), 0.0),
        0.0,
    ).astype(jnp.bfloat16)                                  # [P1, 64]

    # ---- conv1b: 9 row-shifted MXU contractions ----------------------
    # (a K=192 lane-concat of the three dx windows would be 1.5x MXU
    # depth, but Mosaic refuses to concat vectors whose sublane
    # offsets differ: "offset mismatch on non-concat dimension")
    acc2 = jnp.zeros((P2, 64), jnp.float32)
    for dy in range(3):
        # aligned window read (dy*W1 is a multiple of 16); dx rides as
        # an in-register sublane offset
        win = out1_ref[pl.ds(dy * W1, P2 + 16), :]
        for dx in range(3):
            acc2 = acc2 + jnp.dot(
                win[dx:dx + P2, :], w2_ref[dy, pl.ds(dx * 64, 64), :],
                preferred_element_type=jnp.float32,
            )
    out2 = jnp.maximum(
        acc2 + b2_ref[0][None, :].astype(jnp.float32), 0.0
    )

    # ---- 2x1 row pool + adjacent-column max (f32: Mosaic rotates
    # 32-bit data only) ------------------------------------------------
    x3 = out2.reshape(TH // 2, 2, W1, 64)
    rp = jnp.max(x3, axis=1)                                # [TH/2, W1, 64]
    m = jnp.maximum(rp, pltpu.roll(rp, W1 - 1, axis=1))     # col j vs j+1
    out_ref[0] = m.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def superpoint_stem(img, p1, p2, interpret: bool = False):
    """Fused stem for a BATCH of images.

    img: [B, H, W] float32 in [0, 1] (H % 32 == 0, W % 2 == 0)
    p1/p2: {"w": [3,3,1/64,64], "b": [64]} conv1a / conv1b params
    Returns [B, H//2, W//2, 64] bf16 == maxpool2(relu(conv1b(
    relu(conv1a(img))))) under the bf16 compute path.
    """
    B, H, W = img.shape
    assert H % TH == 0 and W % 2 == 0, (H, W)
    W1 = W + 16
    Wp = W + 18
    # base(r, c) = orig(r-2, c-3); bottom rows padded 6 so the last
    # tile's aligned 40-row window load stays in bounds
    base = jnp.zeros((B, H + 8, W + 20), jnp.bfloat16)
    base = base.at[:, 2:2 + H, 3:3 + W].set(img.astype(jnp.bfloat16))
    # dx-pre-shifted planes (lane-aligned slices are free in-kernel;
    # lane-OFFSET slices are not — so shift once here in XLA)
    xp3 = jnp.stack([base[:, :, dx:dx + Wp] for dx in range(3)], axis=1)

    w1 = jnp.zeros((16, 64), jnp.bfloat16)
    w1 = w1.at[:9].set(p1["w"].reshape(9, 64).astype(jnp.bfloat16))
    b1 = p1["b"].reshape(1, 64).astype(jnp.bfloat16)
    w2 = (p2["w"].reshape(3, 3, 64, 64).transpose(0, 1, 2, 3)
          .reshape(3, 192, 64).astype(jnp.bfloat16))
    b2 = p2["b"].reshape(1, 64).astype(jnp.bfloat16)

    grid = (B, H // TH)
    kernel = functools.partial(_stem_kernel, width=W, hlimit=H)
    pooled = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, H + 8, Wp), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 64), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 192, 64), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH // 2, W1, 64), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W1, 64), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # TH=8 peaks ~18 MB scoped (input block double-buffer +
            # conv temporaries); the default 16 MB cap is conservative
            vmem_limit_bytes=40 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 64 * (16 + 64 * 9),
            bytes_accessed=B * (3 * H * W * 2 + (H // 2) * W1 * 64 * 2),
            transcendentals=0,
        ),
        scratch_shapes=[
            pltpu.VMEM(((TH + 3) * (W + 16), 64), jnp.bfloat16),
        ],
        interpret=interpret,
    )(xp3, w1, b1, w2, b2)
    # stride-2 column decimation: out2 pitch col j holds orig col j-1
    # and the adjacent-col max pairs (j, j+1), so the pool cell over
    # orig (2jo, 2jo+1) lives at pitch col 2jo+1
    return pooled[:, :, 1:1 + W:2, :]


def stem_reference(img, p1, p2):
    """XLA reference for parity tests: the exact ops superpoint_raw
    runs for the stem under compute_dtype=bfloat16."""
    x = img[..., None].astype(jnp.bfloat16)

    def conv(x, p):
        return jax.lax.conv_general_dilated(
            x, p["w"].astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"].astype(jnp.bfloat16)

    x = jax.nn.relu(conv(x, p1))
    x = jax.nn.relu(conv(x, p2))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
