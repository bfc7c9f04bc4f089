"""Camera model project/lift round trips."""
import jax
import jax.numpy as jnp
import numpy as np

from d2slam_tpu.geometry.cameras import (
    KBParams,
    MEIParams,
    PinholeParams,
    kb_lift,
    kb_project,
    mei_lift,
    mei_project,
    pinhole_lift,
    pinhole_project,
)


def rand_points(n=200, fov=0.7, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.uniform(1.0, 20.0, n)
    # points within a cone around +z
    xy = rng.uniform(-fov, fov, (n, 2))
    pts = np.concatenate([xy * d[:, None], d[:, None]], axis=1)
    return jnp.asarray(pts, jnp.float64)


def roundtrip(project, lift, params, pts):
    uv, valid = project(pts, params)
    rays = lift(uv, params)
    gt_rays = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    err = np.linalg.norm(np.asarray(rays - gt_rays), axis=-1)
    return err[np.asarray(valid)]


def test_pinhole_roundtrip():
    params = PinholeParams.make(
        460.0, 459.0, 320.0, 240.0, k1=-0.28, k2=0.07, p1=2e-4, p2=-2e-5,
        dtype=jnp.float64,
    )
    err = roundtrip(pinhole_project, pinhole_lift, params, rand_points())
    assert err.max() < 1e-7, err.max()


def test_kb_roundtrip():
    params = KBParams.make(
        380.0, 379.0, 320.0, 240.0, k2=0.01, k3=-0.002, k4=0.0005, k5=-1e-4,
        dtype=jnp.float64,
    )
    # fisheye sees a wide cone
    err = roundtrip(kb_project, kb_lift, params, rand_points(fov=1.5))
    assert err.max() < 1e-7, err.max()


def test_mei_roundtrip():
    params = MEIParams.make(
        1.2, 600.0, 600.0, 320.0, 240.0, k1=-0.1, k2=0.02, dtype=jnp.float64
    )
    err = roundtrip(mei_project, mei_lift, params, rand_points(fov=1.2, seed=2))
    assert err.max() < 1e-8, err.max()


def test_jit_vmap():
    params = PinholeParams.make(460.0, 460.0, 320.0, 240.0, dtype=jnp.float64)
    f = jax.jit(lambda p: pinhole_project(p, params))
    uv, valid = f(rand_points())
    assert uv.shape == (200, 2)
    # behind-camera points flagged invalid
    pts = jnp.asarray([[0.0, 0, -1.0], [0.1, 0.1, 2.0]], jnp.float64)
    _, v = pinhole_project(pts, params)
    assert not bool(v[0]) and bool(v[1])


def test_pinhole_full_roundtrip():
    from d2slam_tpu.geometry.cameras import (
        PinholeFullParams,
        pinhole_full_lift,
        pinhole_full_project,
    )

    params = PinholeFullParams.make(
        460.0, 459.0, 320.0, 240.0, k1=-0.3, k2=0.09, p1=1e-4, p2=-2e-4,
        k3=-0.01, k4=-0.05, k5=0.01, k6=0.0, dtype=jnp.float64,
    )
    err = roundtrip(pinhole_full_project, pinhole_full_lift, params,
                    rand_points(fov=0.6))
    assert err.max() < 1e-6, err.max()


def test_cylindrical_roundtrip():
    from d2slam_tpu.geometry.cameras import (
        CylindricalParams,
        cylindrical_lift,
        cylindrical_project,
    )

    params = CylindricalParams.make(200.0, 200.0, 320.0, 120.0,
                                    dtype=jnp.float64)
    # cylindrical sees all azimuths
    pts = rand_points(fov=2.5, seed=3)
    err = roundtrip(cylindrical_project, cylindrical_lift, params, pts)
    assert err.max() < 1e-9, err.max()


def test_scaramuzza_roundtrip():
    from d2slam_tpu.geometry.cameras import (
        ScaramuzzaParams,
        scaramuzza_lift,
        scaramuzza_project,
    )

    # typical OCam backward poly for a fisheye (z negative toward scene)
    params = ScaramuzzaParams.make(
        a0=-250.0, a2=1.2e-3, a3=-2e-7, a4=6e-10, cx=320.0, cy=240.0,
        dtype=jnp.float64,
    )
    pts = rand_points(fov=1.0, seed=4)
    uv, valid = scaramuzza_project(pts, params)
    rays = scaramuzza_lift(uv, params)
    gt = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    err = np.linalg.norm(np.asarray(rays - gt), axis=-1)[np.asarray(valid)]
    assert np.median(err) < 1e-6, np.median(err)


def test_polyfisheye_roundtrip():
    from d2slam_tpu.geometry.cameras import (
        PolyFisheyeParams, polyfisheye_lift, polyfisheye_project,
    )

    p = PolyFisheyeParams.make(
        A11=320.0, A22=318.0, u0=320.0, v0=240.0,
        k2=-0.02, k3=0.004, k4=-0.0008, A12=0.5,
    )
    rng = np.random.RandomState(0)
    rays = rng.randn(200, 3)
    rays[:, 2] = np.abs(rays[:, 2]) + 0.5  # in front, within ~60 deg
    rays /= np.linalg.norm(rays, axis=1, keepdims=True)
    rays = jnp.asarray(rays, jnp.float64)
    uv, valid = polyfisheye_project(rays, p)
    back = polyfisheye_lift(uv, p)
    err = np.linalg.norm(np.asarray(back - rays), axis=1)
    assert np.all(err[np.asarray(valid)] < 1e-8)
