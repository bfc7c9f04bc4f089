"""Dense depth: undistort map correctness, block-matching disparity on
a synthetic rectified pair, point-cloud assembly, HitNet shapes."""
import jax
import jax.numpy as jnp
import numpy as np

from d2slam_tpu.depth import (
    HitNetConfig,
    block_match_disparity,
    build_undistort_map,
    hitnet_apply,
    hitnet_init,
    points_from_disparity,
    remap_bilinear,
)
from d2slam_tpu.geometry.cameras import KBParams, kb_lift, kb_project
from d2slam_tpu.geometry.lie import so3_exp


def test_undistort_map_consistency():
    fisheye = KBParams.make(
        200.0, 200.0, 320.0, 240.0, k2=0.008, k3=-0.001, dtype=jnp.float64
    )
    R = so3_exp(jnp.asarray([0.0, 0.6, 0.0], jnp.float64))  # side view
    map_xy, f = build_undistort_map(fisheye, R, (100, 120), 90.0)
    # pick some output pixels; verify map equals project(R @ pinhole_ray)
    H, W = 100, 120
    for (y, x) in [(10, 10), (50, 60), (90, 110), (50, 5)]:
        ray = jnp.asarray(
            [(x - W / 2) / f, (y - H / 2) / f, 1.0], jnp.float64
        )
        ray = ray / jnp.linalg.norm(ray)
        uv, valid = kb_project(R @ ray, fisheye)
        expect = np.asarray(uv) if bool(valid) else np.array([-1.0, -1.0])
        np.testing.assert_allclose(
            np.asarray(map_xy)[y, x], expect, atol=1e-6
        )


def test_remap_identity():
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (40, 50)))
    ys, xs = jnp.meshgrid(jnp.arange(40.0), jnp.arange(50.0), indexing="ij")
    ident = jnp.stack([xs, ys], axis=-1)
    out = remap_bilinear(img, ident)
    np.testing.assert_allclose(np.asarray(out)[:39, :49],
                               np.asarray(img)[:39, :49], atol=1e-9)


def test_block_matching_known_disparity():
    # NOTE convention: left(x) corresponds to right(x - d). So build
    # right(x) = left(x + d)?? No: right(x-d)=left(x) -> right(y)=left(y+d).
    d_true = 12.0
    H, W = 96, 160
    rng = np.random.default_rng(1)
    base = rng.uniform(0, 1, (H, W + 32))
    from numpy.lib.stride_tricks import sliding_window_view

    pad = np.pad(base, 1, mode="edge")
    base = (sliding_window_view(pad, (3, 3)) / 9).sum(axis=(2, 3))
    left = base[:, 16 : 16 + W]
    right = base[:, 16 + int(d_true) : 16 + int(d_true) + W]
    # check: right(x - d) = base[16 + d + x - d] = base[16 + x] = left(x) ✓
    disp, valid = block_match_disparity(
        jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32),
        max_disp=32, block=7,
    )
    disp, valid = np.asarray(disp), np.asarray(valid)
    assert valid.mean() > 0.4
    err = np.abs(disp[valid] - d_true)
    assert np.median(err) < 0.3, f"median disparity err {np.median(err)}"

    pts, ok = points_from_disparity(
        jnp.asarray(disp), jnp.asarray(valid), fx=200.0, baseline=0.2,
        cx=W / 2, cy=H / 2,
    )
    z = np.asarray(pts)[..., 2][np.asarray(ok)]
    z_expect = 200.0 * 0.2 / d_true
    assert abs(np.median(z) - z_expect) < 0.15


def test_hitnet_shapes():
    cfg = HitNetConfig(max_disp=32, feat_ch=8, levels=2)
    params = hitnet_init(jax.random.PRNGKey(0), cfg)
    L = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 96, 1), jnp.float32)
    R = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 96, 1), jnp.float32)
    d = jax.jit(lambda a, b: hitnet_apply(params, a, b, cfg))(L, R)
    assert d.shape == (1, 64, 96)
    assert bool(jnp.isfinite(d).all())
    assert float(d.min()) >= 0.0


def test_remap_photometric_correction():
    """Vignette gain map applied before remapping (reference
    FisheyeUndist photometric path)."""
    import jax.numpy as jnp
    import numpy as np

    from d2slam_tpu.depth.fisheye_undist import remap_bilinear

    img = jnp.ones((16, 16), jnp.float32) * 0.5
    # identity map
    ys, xs = jnp.meshgrid(jnp.arange(16.0), jnp.arange(16.0), indexing="ij")
    m = jnp.stack([xs, ys], -1)
    gain = jnp.full((16, 16), 2.0, jnp.float32)
    out = remap_bilinear(img, m, photometric=gain)
    np.testing.assert_allclose(np.asarray(out[:15, :15]), 1.0, atol=1e-6)
    out_plain = remap_bilinear(img, m)
    np.testing.assert_allclose(np.asarray(out_plain[:15, :15]), 0.5, atol=1e-6)


def test_undistort_map_omni_camera():
    """build_undistort_map accepts any camera model (reference
    FisheyeUndist works on any camodocal camera): an omni/MEI camera's
    remap positions must lift back to the virtual pinhole rays."""
    import jax.numpy as jnp
    import numpy as np

    from d2slam_tpu.depth.fisheye_undist import build_undistort_map
    from d2slam_tpu.geometry.cameras import MEIParams, mei_lift

    mei = MEIParams.make(1.8, 530.0, 530.0, 256.0, 256.0,
                         k1=-0.06, k2=0.17, dtype=jnp.float32)
    R = jnp.eye(3, dtype=jnp.float32)
    map_xy, f = build_undistort_map(mei, R, (64, 64), virtual_fov_deg=80.0)
    m = np.asarray(map_xy)
    ok = (m[..., 0] >= 0)
    assert ok.mean() > 0.9
    # lift sampled fisheye pixels back: must match the virtual rays
    ys, xs = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    rays_v = np.stack([(xs - 32.0) / float(f), (ys - 32.0) / float(f),
                       np.ones_like(xs, np.float64)], axis=-1)
    rays_v /= np.linalg.norm(rays_v, axis=-1, keepdims=True)
    lifted = np.asarray(mei_lift(jnp.asarray(m[ok], jnp.float32), mei))
    assert np.abs(lifted - rays_v[ok]).max() < 1e-3
