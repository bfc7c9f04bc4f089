"""FisheyeUndist output modes beyond virtual-pinhole stereo halves:
cylindrical panorama and Pinhole5 (center + 4 sides) remap targets
(reference d2common/include/d2common/fisheye_undistort.h:30-200), and
the config-driven SuperGlue matcher wiring (reference
enable_superglue_local/remote)."""
import jax.numpy as jnp
import numpy as np

from d2slam_tpu.depth.fisheye_undist import (
    build_cylindrical_map,
    build_pinhole5_maps,
    build_undistort_map,
    remap_bilinear,
)
from d2slam_tpu.geometry.cameras import (
    KBParams,
    cylindrical_lift,
    kb_project,
)

HF, WF = 480, 640
FISHEYE = KBParams.make(190.0, 190.0, WF / 2, HF / 2, k2=0.005, k3=-0.002)


def test_cylindrical_map_consistency():
    """Each output pixel's source position must equal: lift through the
    virtual cylindrical camera -> project through the fisheye."""
    map_xy, params = build_cylindrical_map(FISHEYE, (120, 360),
                                           fov_deg=180.0)
    map_xy = np.asarray(map_xy)
    rng = np.random.default_rng(0)
    for _ in range(50):
        v = rng.integers(30, 90)
        u = rng.integers(60, 300)
        if map_xy[v, u, 0] < 0:
            continue
        ray = cylindrical_lift(jnp.asarray([u, v], jnp.float32), params)
        uv, ok = kb_project(ray, FISHEYE)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(uv), map_xy[v, u], atol=1e-3)


def test_cylindrical_remap_samples_source():
    """Remapping a smooth gradient image reproduces the bilinear sample
    of the source at each map position."""
    ys, xs = np.mgrid[0:HF, 0:WF]
    img = jnp.asarray((xs * 0.7 + ys * 0.3) / (WF + HF), jnp.float32)
    map_xy, _ = build_cylindrical_map(FISHEYE, (60, 180), fov_deg=160.0)
    out = np.asarray(remap_bilinear(img, map_xy))
    m = np.asarray(map_xy)
    valid = m[..., 0] >= 0
    assert valid.mean() > 0.5
    expect = (m[..., 0] * 0.7 + m[..., 1] * 0.3) / (WF + HF)
    np.testing.assert_allclose(out[valid], expect[valid], atol=1e-3)


def test_pinhole5_maps():
    """Center view looks straight ahead (image center samples the
    fisheye center); each side view's center pixel samples the fisheye
    at the projection of the rotated forward ray."""
    H, W = 100, 100
    maps, f = build_pinhole5_maps(FISHEYE, (H, W), side_angle_deg=60.0,
                                  virtual_fov_deg=90.0)
    maps = np.asarray(maps)
    assert maps.shape == (5, H, W, 2)
    # center view, center pixel -> fisheye principal point
    np.testing.assert_allclose(
        maps[0, H // 2, W // 2], [WF / 2, HF / 2], atol=1.0
    )
    a = np.deg2rad(60.0)
    fwd = {
        1: np.array([-np.sin(a), 0, np.cos(a)]),   # left
        2: np.array([0, -np.sin(a), np.cos(a)]),   # up
        3: np.array([np.sin(a), 0, np.cos(a)]),    # right
        4: np.array([0, np.sin(a), np.cos(a)]),    # down
    }
    for k, ray in fwd.items():
        uv, ok = kb_project(jnp.asarray(ray, jnp.float32), FISHEYE)
        assert bool(ok)
        np.testing.assert_allclose(maps[k, H // 2, W // 2],
                                   np.asarray(uv), atol=1.0)
    # side views cover DIFFERENT fisheye regions than the center
    assert np.abs(maps[1, H // 2, W // 2, 0] - WF / 2) > 50


def test_superglue_from_config():
    """enable_superglue_local/remote in SystemConfig constructs the
    learned matchers without explicit matcher_fn args (reference YAML
    keys enable_superglue_local/enable_superglue_remote)."""
    from d2slam_tpu.config import D2Config
    from d2slam_tpu.frontend.superglue import SuperGlueConfig
    from d2slam_tpu.runtime.system import D2SLAMSystem, SystemConfig
    from d2slam_tpu.utils.sim import default_extrinsics

    cfg = D2Config()
    sys_cfg = SystemConfig(
        drone_id=0, enable_superglue_local=True,
        enable_superglue_remote=True, superglue_img_hw=(48, 64),
    )
    tiny = SuperGlueConfig(desc_dim=16, num_layers=1, num_heads=2,
                           sinkhorn_iters=5)
    system = D2SLAMSystem(
        cfg, sys_cfg, default_extrinsics(0.1), cameras=None,
        extract_fn=lambda img, cam: None,
        superglue_cfg=tiny,
    )
    assert system.tracker.matcher_fn is not None
    assert system.detector.matcher_fn is not None
    # the constructed matcher runs end to end on tiny inputs
    rng = np.random.default_rng(0)
    desc = rng.normal(0, 1, (8, 16)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    pts = rng.uniform(0, 40, (8, 2)).astype(np.float32)
    valid = np.ones(8, bool)
    idx, ok = system.tracker.matcher_fn(desc, pts, valid, desc, pts, valid)
    assert np.asarray(idx).shape == (8,)
    assert np.asarray(ok).dtype == bool
