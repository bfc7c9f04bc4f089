"""Camera models with batched project (space->plane) and lift
(plane->ray) operations.

TPU-native equivalent of the reference's camodocal fork
(reference: camera_models/include/camodocal/camera_models/*.h —
PinholeCamera, EquidistantCamera (Kannala-Brandt), CataCamera (MEI)):
pure functions over [..., 2]/[..., 3] arrays, fully vmap/jit-friendly.
Iterative inversions (distortion, KB theta) use fixed-iteration Newton
loops (static control flow).

Conventions: camera frame z forward; pixel coords (u, v); intrinsics
(fx, fy, cx, cy).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PinholeParams(NamedTuple):
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    # radial/tangential distortion (plumb bob): k1, k2, p1, p2
    k1: jax.Array = 0.0
    k2: jax.Array = 0.0
    p1: jax.Array = 0.0
    p2: jax.Array = 0.0

    @staticmethod
    def make(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, dtype=jnp.float32):
        return PinholeParams(*[jnp.asarray(v, dtype) for v in
                               (fx, fy, cx, cy, k1, k2, p1, p2)])


def _distort(p, params: PinholeParams):
    x, y = p[..., 0], p[..., 1]
    r2 = x * x + y * y
    rad = params.k1 * r2 + params.k2 * r2 * r2
    dx = x * rad + 2 * params.p1 * x * y + params.p2 * (r2 + 2 * x * x)
    dy = y * rad + params.p1 * (r2 + 2 * y * y) + 2 * params.p2 * x * y
    return jnp.stack([x + dx, y + dy], axis=-1)


def pinhole_project(pts3, params: PinholeParams):
    """[..., 3] camera-frame points -> ([..., 2] pixels, [...] valid)."""
    z = pts3[..., 2]
    valid = z > 1e-6
    zs = jnp.where(valid, z, 1.0)
    p = pts3[..., :2] / zs[..., None]
    pd = _distort(p, params)
    u = params.fx * pd[..., 0] + params.cx
    v = params.fy * pd[..., 1] + params.cy
    return jnp.stack([u, v], axis=-1), valid


def pinhole_lift(uv, params: PinholeParams, iters: int = 20):
    """[..., 2] pixels -> [..., 3] unit rays (undistorts iteratively,
    reference PinholeCamera::liftProjective)."""
    mx = (uv[..., 0] - params.cx) / params.fx
    my = (uv[..., 1] - params.cy) / params.fy
    target = jnp.stack([mx, my], axis=-1)

    def body(_, p):
        d = _distort(p, params) - p
        return target - d

    p = jax.lax.fori_loop(0, iters, body, target)
    ray = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Kannala-Brandt equidistant fisheye (reference EquidistantCamera)
# ---------------------------------------------------------------------------


class KBParams(NamedTuple):
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k2: jax.Array  # theta^3 coefficient (camodocal naming k2..k5)
    k3: jax.Array
    k4: jax.Array
    k5: jax.Array

    @staticmethod
    def make(fx, fy, cx, cy, k2=0.0, k3=0.0, k4=0.0, k5=0.0, dtype=jnp.float32):
        return KBParams(*[jnp.asarray(v, dtype) for v in
                          (fx, fy, cx, cy, k2, k3, k4, k5)])


def _kb_theta_poly(theta, p: KBParams):
    t2 = theta * theta
    return theta * (1 + t2 * (p.k2 + t2 * (p.k3 + t2 * (p.k4 + t2 * p.k5))))


def kb_project(pts3, params: KBParams):
    x, y, z = pts3[..., 0], pts3[..., 1], pts3[..., 2]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(r, z)
    d = _kb_theta_poly(theta, params)
    safe_r = jnp.maximum(r, 1e-9)
    u = params.fx * d * x / safe_r + params.cx
    v = params.fy * d * y / safe_r + params.cy
    # valid everywhere except points at the optical center behind camera
    valid = ~((r < 1e-9) & (z <= 0))
    return jnp.stack([u, v], axis=-1), valid


def kb_lift(uv, params: KBParams, iters: int = 10):
    """Invert the theta polynomial by Newton iterations
    (reference EquidistantCamera::backprojectSymmetric)."""
    mx = (uv[..., 0] - params.cx) / params.fx
    my = (uv[..., 1] - params.cy) / params.fy
    d = jnp.sqrt(mx * mx + my * my)

    def body(_, theta):
        t2 = theta * theta
        f = _kb_theta_poly(theta, params) - d
        df = 1 + t2 * (3 * params.k2 + t2 * (5 * params.k3 + t2 * (
            7 * params.k4 + t2 * 9 * params.k5)))
        return theta - f / jnp.maximum(df, 1e-9)

    theta = jax.lax.fori_loop(0, iters, body, d)
    safe_d = jnp.maximum(d, 1e-9)
    sin_t = jnp.sin(theta)
    ray = jnp.stack(
        [sin_t * mx / safe_d, sin_t * my / safe_d, jnp.cos(theta)], axis=-1
    )
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# MEI / unified catadioptric model (reference CataCamera)
# ---------------------------------------------------------------------------


class MEIParams(NamedTuple):
    xi: jax.Array  # mirror parameter
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k1: jax.Array = 0.0
    k2: jax.Array = 0.0
    p1: jax.Array = 0.0
    p2: jax.Array = 0.0

    @staticmethod
    def make(xi, fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0,
             dtype=jnp.float32):
        return MEIParams(*[jnp.asarray(v, dtype) for v in
                           (xi, fx, fy, cx, cy, k1, k2, p1, p2)])


def mei_project(pts3, params: MEIParams):
    """Unified sphere projection + distortion (reference
    CataCamera::spaceToPlane)."""
    norm = jnp.linalg.norm(pts3, axis=-1)
    z = pts3[..., 2] + params.xi * norm
    valid = z > 1e-6
    zs = jnp.where(valid, z, 1.0)
    p = pts3[..., :2] / zs[..., None]
    pp = PinholeParams(params.fx, params.fy, params.cx, params.cy,
                       params.k1, params.k2, params.p1, params.p2)
    pd = _distort(p, pp)
    u = params.fx * pd[..., 0] + params.cx
    v = params.fy * pd[..., 1] + params.cy
    return jnp.stack([u, v], axis=-1), valid


# ---------------------------------------------------------------------------
# PinholeFull (8-parameter plumb bob: k1..k6, p1, p2 — reference
# PinholeFullCamera)
# ---------------------------------------------------------------------------


class PinholeFullParams(NamedTuple):
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k1: jax.Array = 0.0
    k2: jax.Array = 0.0
    p1: jax.Array = 0.0
    p2: jax.Array = 0.0
    k3: jax.Array = 0.0
    k4: jax.Array = 0.0
    k5: jax.Array = 0.0
    k6: jax.Array = 0.0

    @staticmethod
    def make(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0,
             k3=0.0, k4=0.0, k5=0.0, k6=0.0, dtype=jnp.float32):
        return PinholeFullParams(*[jnp.asarray(v, dtype) for v in
                                   (fx, fy, cx, cy, k1, k2, p1, p2,
                                    k3, k4, k5, k6)])


def _distort_full(p, c: PinholeFullParams):
    x, y = p[..., 0], p[..., 1]
    r2 = x * x + y * y
    num = 1 + r2 * (c.k1 + r2 * (c.k2 + r2 * c.k3))
    den = 1 + r2 * (c.k4 + r2 * (c.k5 + r2 * c.k6))
    rad = num / den
    xd = x * rad + 2 * c.p1 * x * y + c.p2 * (r2 + 2 * x * x)
    yd = y * rad + c.p1 * (r2 + 2 * y * y) + 2 * c.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def pinhole_full_project(pts3, params: PinholeFullParams):
    z = pts3[..., 2]
    valid = z > 1e-6
    zs = jnp.where(valid, z, 1.0)
    p = pts3[..., :2] / zs[..., None]
    pd = _distort_full(p, params)
    u = params.fx * pd[..., 0] + params.cx
    v = params.fy * pd[..., 1] + params.cy
    return jnp.stack([u, v], axis=-1), valid


def pinhole_full_lift(uv, params: PinholeFullParams, iters: int = 25):
    mx = (uv[..., 0] - params.cx) / params.fx
    my = (uv[..., 1] - params.cy) / params.fy
    target = jnp.stack([mx, my], axis=-1)

    def body(_, p):
        return target - (_distort_full(p, params) - p)

    p = jax.lax.fori_loop(0, iters, body, target)
    ray = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Cylindrical projection (reference CylindricalCamera — used for the
# fisheye-undistorted panoramic virtual view)
# ---------------------------------------------------------------------------


class CylindricalParams(NamedTuple):
    fx: jax.Array  # radians->px horizontally
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array

    @staticmethod
    def make(fx, fy, cx, cy, dtype=jnp.float32):
        return CylindricalParams(*[jnp.asarray(v, dtype) for v in
                                   (fx, fy, cx, cy)])


def cylindrical_project(pts3, params: CylindricalParams):
    """u = fx * atan2(x, z); v = fy * y / sqrt(x^2 + z^2)."""
    x, y, z = pts3[..., 0], pts3[..., 1], pts3[..., 2]
    rho = jnp.sqrt(x * x + z * z)
    u = params.fx * jnp.arctan2(x, z) + params.cx
    v = params.fy * y / jnp.maximum(rho, 1e-9) + params.cy
    valid = rho > 1e-9
    return jnp.stack([u, v], axis=-1), valid


def cylindrical_lift(uv, params: CylindricalParams):
    theta = (uv[..., 0] - params.cx) / params.fx
    h = (uv[..., 1] - params.cy) / params.fy
    ray = jnp.stack([jnp.sin(theta), h, jnp.cos(theta)], axis=-1)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Scaramuzza omnidirectional polynomial model (reference
# ScaramuzzaCamera / OCamCalib convention)
# ---------------------------------------------------------------------------


class ScaramuzzaParams(NamedTuple):
    """Backward poly (lift): z = a0 + a2 rho^2 + a3 rho^3 + a4 rho^4
    with the OCam sign convention; affine [c d; e 1] + center."""

    a0: jax.Array
    a2: jax.Array
    a3: jax.Array
    a4: jax.Array
    c: jax.Array
    d: jax.Array
    e: jax.Array
    cx: jax.Array
    cy: jax.Array

    @staticmethod
    def make(a0, a2, a3, a4, cx, cy, c=1.0, d=0.0, e=0.0,
             dtype=jnp.float32):
        return ScaramuzzaParams(*[jnp.asarray(v, dtype) for v in
                                  (a0, a2, a3, a4, c, d, e, cx, cy)])


def scaramuzza_lift(uv, params: ScaramuzzaParams):
    """OCamCalib cam2world: invert affine, evaluate the poly."""
    up = uv[..., 0] - params.cx
    vp = uv[..., 1] - params.cy
    det = params.c - params.d * params.e
    xs = (up - params.d * vp) / det
    ys = (-params.e * up + params.c * vp) / det
    rho = jnp.sqrt(xs * xs + ys * ys)
    z = params.a0 + rho * rho * (
        params.a2 + rho * (params.a3 + rho * params.a4)
    )
    ray = jnp.stack([xs, ys, -z], axis=-1)  # OCam z-axis convention
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


def scaramuzza_project(pts3, params: ScaramuzzaParams, iters: int = 30):
    """world2cam by Newton inversion of rho(theta) (no stored forward
    poly needed)."""
    x, y, z = pts3[..., 0], pts3[..., 1], pts3[..., 2]
    r = jnp.sqrt(x * x + y * y)
    # solve a0 + a2 rho^2 + a3 rho^3 + a4 rho^4 = -z/r * rho  for rho
    m = -z / jnp.maximum(r, 1e-9)

    def body(_, rho):
        f = (params.a0 + rho * rho * (params.a2 + rho * (params.a3
             + rho * params.a4))) - m * rho
        df = (2 * params.a2 * rho + 3 * params.a3 * rho * rho
              + 4 * params.a4 * rho**3) - m
        return jnp.clip(rho - f / jnp.where(jnp.abs(df) < 1e-9, 1e-9, df),
                        0.0, 2000.0)

    rho0 = jnp.full_like(m, 100.0)
    rho = jax.lax.fori_loop(0, iters, body, rho0)
    xs = x / jnp.maximum(r, 1e-9) * rho
    ys = y / jnp.maximum(r, 1e-9) * rho
    u = xs * params.c + ys * params.d + params.cx
    v = xs * params.e + ys + params.cy
    valid = r > 1e-9
    return jnp.stack([u, v], axis=-1), valid


def mei_lift(uv, params: MEIParams, iters: int = 20):
    """reference CataCamera::liftProjective: undistort then invert the
    sphere projection."""
    mx = (uv[..., 0] - params.cx) / params.fx
    my = (uv[..., 1] - params.cy) / params.fy
    target = jnp.stack([mx, my], axis=-1)
    pp = PinholeParams(params.fx, params.fy, params.cx, params.cy,
                       params.k1, params.k2, params.p1, params.p2)

    def body(_, p):
        return target - (_distort(p, pp) - p)

    p = jax.lax.fori_loop(0, iters, body, target)
    mx, my = p[..., 0], p[..., 1]
    rho2 = mx * mx + my * my
    xi = params.xi
    # z for the unit-sphere point (camodocal formula)
    disc = 1.0 + (1.0 - xi * xi) * rho2
    disc = jnp.maximum(disc, 0.0)
    factor = (xi + jnp.sqrt(disc)) / (1.0 + rho2)
    ray = jnp.stack([factor * mx, factor * my, factor - xi], axis=-1)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


class PolyFisheyeParams(NamedTuple):
    """Forward polynomial fisheye (reference camodocal
    PolyFisheyeCamera: r(theta) = theta + k2 theta^2 + ... + k7 theta^7,
    pixel = [A11 A12; 0 A22] r(theta)[cos phi, sin phi] + [u0, v0],
    camera_models/src/camera_models/PolyFisheyeCamera.cc:93-137)."""

    k2: jax.Array
    k3: jax.Array
    k4: jax.Array
    k5: jax.Array
    k6: jax.Array
    k7: jax.Array
    p1: jax.Array     # tangential (kept for parity; reference rarely uses)
    p2: jax.Array
    A11: jax.Array
    A12: jax.Array
    A22: jax.Array
    u0: jax.Array
    v0: jax.Array

    @staticmethod
    def make(A11, A22, u0, v0, k2=0.0, k3=0.0, k4=0.0, k5=0.0, k6=0.0,
             k7=0.0, p1=0.0, p2=0.0, A12=0.0, dtype=jnp.float32):
        return PolyFisheyeParams(*[jnp.asarray(v, dtype) for v in
                                   (k2, k3, k4, k5, k6, k7, p1, p2,
                                    A11, A12, A22, u0, v0)])


def _polyfish_r(theta, p: PolyFisheyeParams):
    """r(theta) with coeff0=0, coeff1=1 (PolyFisheyeCamera.cc:24-25)."""
    return theta * (1.0 + theta * (p.k2 + theta * (p.k3 + theta * (
        p.k4 + theta * (p.k5 + theta * (p.k6 + theta * p.k7))))))


def _polyfish_dr(theta, p: PolyFisheyeParams):
    return (1.0 + theta * (2 * p.k2 + theta * (3 * p.k3 + theta * (
        4 * p.k4 + theta * (5 * p.k5 + theta * (6 * p.k6
        + theta * 7 * p.k7))))))


def polyfisheye_project(pts3, params: PolyFisheyeParams):
    """spaceToPlane: theta = acos(z/|P|), phi = atan2(y, x)."""
    x, y, z = pts3[..., 0], pts3[..., 1], pts3[..., 2]
    n = jnp.sqrt(x * x + y * y + z * z)
    theta = jnp.arccos(jnp.clip(z / jnp.maximum(n, 1e-12), -1.0, 1.0))
    phi = jnp.arctan2(y, x)
    r = _polyfish_r(theta, params)
    xd = r * jnp.cos(phi)
    yd = r * jnp.sin(phi)
    u = params.A11 * xd + params.A12 * yd + params.u0
    v = params.A22 * yd + params.v0
    valid = theta < jnp.pi / 2 * 1.1
    return jnp.stack([u, v], axis=-1), valid


def polyfisheye_lift(uv, params: PolyFisheyeParams, iters: int = 12):
    """liftProjective: invert the affine then Newton-solve
    r(theta) = r_meas (the reference uses a backward poly / lookup
    table, FastCalcTABLE; a fixed-iteration Newton is the XLA-friendly
    equivalent)."""
    vd = (uv[..., 1] - params.v0) / params.A22
    xd = (uv[..., 0] - params.u0 - params.A12 * vd) / params.A11
    r_meas = jnp.sqrt(xd * xd + vd * vd)
    phi = jnp.arctan2(vd, xd)

    def body(_, theta):
        f = _polyfish_r(theta, params) - r_meas
        df = _polyfish_dr(theta, params)
        return jnp.clip(
            theta - f / jnp.where(jnp.abs(df) < 1e-9, 1e-9, df),
            0.0, jnp.pi,
        )

    theta = jax.lax.fori_loop(0, iters, body, jnp.clip(r_meas, 0.0, jnp.pi))
    st = jnp.sin(theta)
    ray = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi),
                     jnp.cos(theta)], axis=-1)
    return ray
