"""Fisheye-to-virtual-pinhole undistortion as precomputed gather maps.

TPU-native equivalent of the reference FisheyeUndist
(reference: d2common/include/d2common/fisheye_undistort.h:30-200 —
remap tables from any camodocal model to virtual pinhole views, CUDA
remap path): the map is built once (host/device) by lifting each
output pixel through the ideal virtual pinhole, rotating into the
fisheye camera, and projecting through the fisheye model; application
is a batched bilinear gather (XLA) — the quadcam's 4 views remap as
one batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from d2slam_tpu.geometry import cameras as _cam
from d2slam_tpu.geometry.cameras import KBParams, kb_project

_PROJECT_OF = {
    _cam.KBParams: _cam.kb_project,
    _cam.MEIParams: _cam.mei_project,
    _cam.PinholeParams: _cam.pinhole_project,
    _cam.PinholeFullParams: _cam.pinhole_full_project,
    _cam.CylindricalParams: _cam.cylindrical_project,
    _cam.ScaramuzzaParams: _cam.scaramuzza_project,
    _cam.PolyFisheyeParams: _cam.polyfisheye_project,
}


def _project(camera, rays):
    """Dispatch rays -> (uv, valid) for any camera parameter struct or
    an object with a .project method (geometry.kalibr.KalibrCamera) —
    the reference builds remap tables 'from any camodocal model'
    (fisheye_undistort.h:30-200)."""
    if hasattr(camera, "project"):
        return camera.project(rays)
    return _PROJECT_OF[type(camera)](rays, camera)


def build_undistort_map(
    fisheye,                        # camera param struct or KalibrCamera
    R_fisheye_virtual: jax.Array,   # [3, 3] rotation virtual->fisheye cam
    out_hw,                         # (H, W) of the virtual pinhole image
    virtual_fov_deg: float = 90.0,
):
    """Returns (map_xy [H, W, 2], virtual_focal). Source pixel for each
    output pixel; out-of-image samples map to (-1, -1)."""
    H, W = out_hw
    f = (W / 2.0) / jnp.tan(jnp.deg2rad(virtual_fov_deg / 2.0))
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    rays = jnp.stack(
        [(xs - W / 2.0) / f, (ys - H / 2.0) / f, jnp.ones_like(xs)], axis=-1
    )
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    rays_fish = rays @ R_fisheye_virtual.T
    uv, valid = _project(fisheye, rays_fish)
    uv = jnp.where(valid[..., None], uv, -1.0)
    return uv, f


def _rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])


def _rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, 0, s], [0, 1.0, 0], [-s, 0, c]])


def build_pinhole5_maps(
    fisheye,
    out_hw,
    side_angle_deg: float = 90.0,
    virtual_fov_deg: float = 90.0,
):
    """Center + 4 side virtual-pinhole remap targets (reference
    FisheyeUndist Pinhole5 mode, fisheye_undistort.h:30-200: one
    forward view plus up/down/left/right views rotated by
    ``side_angle_deg``, jointly covering the fisheye FOV).

    Returns (maps [5, H, W, 2], virtual_focal) with view order
    [center, left, up, right, down] (the reference's photo order)."""
    a = jnp.deg2rad(side_angle_deg)
    Rs = [
        jnp.eye(3),
        _rot_y(-a),   # left:  forward ray -> [-sin a, 0, cos a]
        _rot_x(a),    # up:    forward ray -> [0, -sin a, cos a]
        _rot_y(a),    # right: forward ray -> [ sin a, 0, cos a]
        _rot_x(-a),   # down:  forward ray -> [0,  sin a, cos a]
    ]
    maps = []
    f = None
    for R in Rs:
        m, f = build_undistort_map(fisheye, R, out_hw, virtual_fov_deg)
        maps.append(m)
    return jnp.stack(maps), f


def build_cylindrical_map(
    fisheye,
    out_hw,
    fov_deg: float = 180.0,
    v_range: float = 1.0,
    R_fisheye_virtual: jax.Array | None = None,
):
    """Cylindrical-panorama remap target (reference FisheyeUndist
    cylindrical mode). Output pixel (u, v) lifts through the repo's
    cylindrical camera convention (geometry.cameras.cylindrical_lift:
    u -> azimuth, v -> height on the unit cylinder), rotates into the
    fisheye frame, and projects through the fisheye model.

    Returns (map_xy [H, W, 2], CylindricalParams of the virtual
    camera). ``fov_deg`` is the horizontal azimuth span; ``v_range``
    the vertical half-extent in cylinder-height units."""
    from d2slam_tpu.geometry.cameras import CylindricalParams, cylindrical_lift

    H, W = out_hw
    fx = W / jnp.deg2rad(fov_deg)          # pixels per radian of azimuth
    fy = (H / 2.0) / v_range
    params = CylindricalParams.make(fx, fy, W / 2.0, H / 2.0)
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    rays = cylindrical_lift(jnp.stack([xs, ys], axis=-1), params)
    if R_fisheye_virtual is not None:
        rays = rays @ R_fisheye_virtual.T
    uv, valid = _project(fisheye, rays)
    uv = jnp.where(valid[..., None], uv, -1.0)
    return uv, params


def remap_bilinear(img: jax.Array, map_xy: jax.Array,
                   photometric: jax.Array | None = None) -> jax.Array:
    """Sample ``img`` [H, W] at ``map_xy`` [Ho, Wo, 2]; out-of-range
    positions produce 0. ``photometric`` is an optional [H, W] gain map
    (vignette correction from tools.calibrate_vignette) applied to the
    source image before sampling — the reference FisheyeUndist's
    photometric-correction path (fisheye_undistort.h photometric inverse
    vignette multiply)."""
    if photometric is not None:
        img = img * photometric
    H, W = img.shape
    x, y = map_xy[..., 0], map_xy[..., 1]
    inb = (x >= 0) & (x <= W - 1.001) & (y >= 0) & (y <= H - 1.001)
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = x - x0
    wy = y - y0
    v = (
        img[y0, x0] * (1 - wx) * (1 - wy)
        + img[y0, x0 + 1] * wx * (1 - wy)
        + img[y0 + 1, x0] * (1 - wx) * wy
        + img[y0 + 1, x0 + 1] * wx * wy
    )
    return jnp.where(inb, v, 0.0)
