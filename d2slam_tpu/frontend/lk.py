"""Pyramidal Lucas-Kanade optical flow, batched over points.

TPU-native replacement for the reference's CUDA SparsePyrLKOpticalFlow
path with forward-backward checking (reference:
d2frontend/src/opticaltrack_utils.cpp:44-170 opticalflowTrackPyr,
pyramid caching via LKImageInfoGPU). All points iterate in lockstep as
one vmapped batch per pyramid level — static shapes, jit-compiled once.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def build_pyramid(img: jax.Array, levels: int = 3) -> List[jax.Array]:
    """[H, W] float image -> list of ``levels+1`` images, halving each
    level (2x2 average pooling)."""
    img = jnp.asarray(img)  # accept host numpy (tracker keeps np images)
    pyr = [img]
    x = img
    for _ in range(levels):
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (2, 2), (2, 2), "VALID"
        ) * 0.25
        pyr.append(x)
    return pyr


def _bilinear(img, x, y):
    H, W = img.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    wx = jnp.clip(x - x0, 0.0, 1.0)
    wy = jnp.clip(y - y0, 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def _lk_level(prev, nxt, pts_prev, guess, win: int, iters: int):
    """One pyramid level of LK for all points.

    pts_prev: [N, 2] locations in ``prev`` at this level's scale.
    guess: [N, 2] current flow estimates (displacement).
    Returns (new_guess [N, 2], good [N]).
    """
    r = win // 2
    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-r, r + 1, dtype=prev.dtype),
            jnp.arange(-r, r + 1, dtype=prev.dtype),
            indexing="xy",
        ),
        axis=-1,
    ).reshape(-1, 2)  # [win*win, 2]

    def track_one(pt, g):
        px = pt[0] + offs[:, 0]
        py = pt[1] + offs[:, 1]
        I = _bilinear(prev, px, py)
        # spatial gradients of the template (central differences)
        Ix = 0.5 * (_bilinear(prev, px + 1, py) - _bilinear(prev, px - 1, py))
        Iy = 0.5 * (_bilinear(prev, px, py + 1) - _bilinear(prev, px, py - 1))
        A11 = jnp.sum(Ix * Ix)
        A12 = jnp.sum(Ix * Iy)
        A22 = jnp.sum(Iy * Iy)
        det = A11 * A22 - A12 * A12
        good = det > 1e-6

        def step(_, g):
            J = _bilinear(nxt, px + g[0], py + g[1])
            err = J - I
            b1 = jnp.sum(err * Ix)
            b2 = jnp.sum(err * Iy)
            inv_det = 1.0 / jnp.maximum(det, 1e-9)
            dx = -(A22 * b1 - A12 * b2) * inv_det
            dy = -(-A12 * b1 + A11 * b2) * inv_det
            return g + jnp.stack([dx, dy])

        g = jax.lax.fori_loop(0, iters, step, g)
        return g, good

    return jax.vmap(track_one)(pts_prev, guess)


import functools


@functools.partial(jax.jit, static_argnames=("win", "iters", "fb_thresh"))
def lk_track_pyramidal(
    pyr_prev: List[jax.Array],
    pyr_next: List[jax.Array],
    pts: jax.Array,           # [N, 2] pixel coords in full-res prev
    valid: jax.Array,         # [N] bool
    win: int = 21,
    iters: int = 10,
    fb_thresh: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Track points prev->next with a coarse-to-fine pyramid and
    forward-backward consistency check (reference 0.5 px gate).

    Returns (new_pts [N, 2], ok [N] bool). Jitted as ONE program per
    (pyramid shapes, point count) — eager per-level dispatch costs
    hundreds of small launches on a remote backend.
    """
    def run(pyr_a, pyr_b, p0):
        L = len(pyr_a) - 1
        guess = jnp.zeros_like(p0)
        good = jnp.ones(p0.shape[0], bool)
        for lvl in range(L, -1, -1):
            scale = 2.0 ** lvl
            g, ok = _lk_level(
                pyr_a[lvl], pyr_b[lvl], p0 / scale, guess / scale, win, iters
            )
            guess = g * scale
            good &= ok
        return p0 + guess, good

    fwd, ok_f = run(pyr_prev, pyr_next, pts)
    back, ok_b = run(pyr_next, pyr_prev, fwd)
    fb_err = jnp.linalg.norm(back - pts, axis=-1)
    H, W = pyr_prev[0].shape
    inb = (
        (fwd[:, 0] >= 1) & (fwd[:, 0] < W - 1)
        & (fwd[:, 1] >= 1) & (fwd[:, 1] < H - 1)
    )
    ok = valid & ok_f & ok_b & (fb_err < fb_thresh) & inb
    return fwd, ok


# ---------------------------------------------------------------------------
# Native host-path LK (the reference's OpenCV SparsePyrLKOpticalFlow role)
# ---------------------------------------------------------------------------

_NATIVE = None
_NATIVE_TRIED = False


def _load_native():
    """ctypes binding of frontend/native/lk.cpp, compiled on demand
    (same pattern as runtime/pipeline.py). Returns None if the
    toolchain is unavailable — callers fall back to the jitted path."""
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    import ctypes
    import os
    import subprocess

    here = os.path.dirname(__file__)
    src = os.path.join(here, "native", "lk.cpp")
    so = os.path.join(here, "native", "liblk.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-o", so, src,
                 "-lpthread"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.lk_pyr_track.restype = ctypes.c_int
        lib.lk_pyr_track.argtypes = [
            f32p, f32p, ctypes.c_int, ctypes.c_int, f32p, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, f32p, u8p,
        ]
        _NATIVE = lib
    except (OSError, subprocess.CalledProcessError):
        _NATIVE = None
    return _NATIVE


def lk_track_images(
    img_prev,
    img_next,
    pts,
    valid,
    levels: int = 3,
    win: int = 21,
    iters: int = 10,
    fb_thresh: float = 0.5,
):
    """Track ``pts`` from ``img_prev`` to ``img_next`` (full-res [H, W]
    float images). Same semantics and return contract as
    ``lk_track_pyramidal`` but takes raw images: prefers the native C++
    kernel (frontend/native/lk.cpp — the gather-per-point inner loop is
    pathological for XLA:CPU, ~200 ms/frame vs ~10 ms native on a
    2-core host), falling back to the jitted pyramid path."""
    import os

    import numpy as np

    lib = _load_native()
    if lib is not None:
        import ctypes

        a = np.ascontiguousarray(img_prev, np.float32)
        b = np.ascontiguousarray(img_next, np.float32)
        p = np.ascontiguousarray(pts, np.float32)
        v = np.ascontiguousarray(
            np.asarray(valid, bool).astype(np.uint8))
        n = p.shape[0]
        out_p = np.empty((n, 2), np.float32)
        out_ok = np.empty(n, np.uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        rc = lib.lk_pyr_track(
            a.ctypes.data_as(f32p), b.ctypes.data_as(f32p),
            a.shape[0], a.shape[1],
            p.ctypes.data_as(f32p), v.ctypes.data_as(u8p), n,
            levels, win, iters, fb_thresh,
            min(os.cpu_count() or 1, 4),
            out_p.ctypes.data_as(f32p), out_ok.ctypes.data_as(u8p),
        )
        if rc == 0:
            return out_p, out_ok.astype(bool)
    pa = build_pyramid(jnp.asarray(img_prev, jnp.float32), levels)
    pb = build_pyramid(jnp.asarray(img_next, jnp.float32), levels)
    new_pts, ok = lk_track_pyramidal(
        pa, pb, jnp.asarray(pts, jnp.float32),
        jnp.asarray(np.asarray(valid, bool)),
        win=win, iters=iters, fb_thresh=fb_thresh,
    )
    import numpy as _np

    return _np.asarray(new_pts), _np.asarray(ok)
