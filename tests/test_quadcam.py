"""Quadcam pipeline integration: 4 rendered fisheye views of a textured
cylinder wall -> virtual stereo -> disparity -> point cloud depths."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d2slam_tpu.depth.quadcam import (
    QuadcamConfig,
    build_virtual_stereo,
    quadcam_depth,
)
from d2slam_tpu.geometry.cameras import KBParams, kb_lift
from d2slam_tpu.geometry.lie import so3_exp
from d2slam_tpu.utils import np_lie

R_WALL = 5.0
HF, WF = 480, 640


def make_fisheye_rig(baseline=0.15):
    """4 KB fisheye cameras at 90° yaw steps around the body center."""
    fisheyes = [
        KBParams.make(190.0, 190.0, WF / 2, HF / 2, k2=0.005,
                      dtype=jnp.float32)
        for _ in range(4)
    ]
    ext = np.zeros((4, 7))
    for i in range(4):
        yaw = np.deg2rad(90.0 * i)
        # camera frame: z forward, y down; yaw about camera/body y
        R = np.asarray(so3_exp(jnp.asarray([0.0, yaw, 0.0], jnp.float64)))
        q = np_lie.rotmat_to_quat(R)
        # center offset along the camera's own forward direction
        ext[i] = np.concatenate([R @ [baseline / 2, 0, baseline / 2], q])
    return fisheyes, ext


def render_fisheye(fisheye, T_body_cam, seed=0):
    """Render the cylinder wall (axis along body y) by ray casting."""
    rng = np.random.default_rng(seed)
    tex = rng.uniform(0, 1, (64, 512))
    # smooth texture
    from numpy.lib.stride_tricks import sliding_window_view

    pad = np.pad(tex, 2, mode="wrap")
    tex = (sliding_window_view(pad, (5, 5)) / 25).sum(axis=(2, 3))

    ys, xs = np.meshgrid(np.arange(HF), np.arange(WF), indexing="ij")
    uv = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2), jnp.float32)
    rays_cam = np.asarray(kb_lift(uv, fisheye))
    R = np_lie.quat_to_rotmat(T_body_cam[3:])
    rays_b = rays_cam @ R.T
    c = T_body_cam[:3]
    # intersect x^2 + z^2 = R_WALL^2 (cylinder axis = body y)
    dx, dz = rays_b[:, 0], rays_b[:, 2]
    cx_, cz_ = c[0], c[2]
    a = dx * dx + dz * dz
    b = 2 * (cx_ * dx + cz_ * dz)
    cc = cx_ * cx_ + cz_ * cz_ - R_WALL * R_WALL
    disc = np.maximum(b * b - 4 * a * cc, 0.0)
    t = (-b + np.sqrt(disc)) / np.maximum(2 * a, 1e-9)
    pts = c + rays_b * t[:, None]
    theta = np.arctan2(pts[:, 0], pts[:, 2])
    h = pts[:, 1]
    ui = ((theta + np.pi) / (2 * np.pi) * 512).astype(int) % 512
    vi = np.clip(((h + 2.0) / 4.0 * 64).astype(int), 0, 63)
    img = tex[vi, ui].reshape(HF, WF)
    return img.astype(np.float32)


@pytest.mark.slow
def test_quadcam_pipeline_recovers_wall_depth():
    fisheyes, ext = make_fisheye_rig()
    cfg = QuadcamConfig(out_hw=(120, 160), max_disp=32, block=9,
                        min_z=1.0, max_z=20.0)
    pairs = build_virtual_stereo(fisheyes, ext, cfg)
    assert len(pairs) == 4
    assert all(p.baseline > 0.05 for p in pairs)

    imgs = [
        jnp.asarray(render_fisheye(fisheyes[i], ext[i])) for i in range(4)
    ]
    results = quadcam_depth(imgs, pairs, cfg)
    ok_any = False
    for k, (pts, ok) in enumerate(results):
        ok = np.asarray(ok)
        if ok.mean() < 0.05:
            continue
        z = np.asarray(pts)[..., 2][ok]
        med = np.median(z)
        # wall at 5 m from the body center; virtual cams near center
        assert 3.0 < med < 7.5, f"pair {k}: median depth {med}"
        ok_any = True
    assert ok_any, "no pair produced valid depth"
