"""In-container frontend training (reference ships trained
SuperPoint/MobileNetVLAD; here they are TRAINED on synthetic data —
MagicPoint-style corners + homography pairs, NT-Xent place
recognition)."""
import numpy as np
import pytest

from d2slam_tpu.frontend.netvlad import NetVLADConfig
from d2slam_tpu.frontend.superpoint import SuperPointConfig
from d2slam_tpu.frontend.train_frontend import (
    cell_labels,
    load_weights,
    make_batch,
    random_homography,
    save_weights,
    synth_corners_image,
    train_netvlad,
    train_superpoint,
    warp_image,
)


def test_synth_corners_have_labels():
    rng = np.random.default_rng(0)
    img, corners = synth_corners_image(rng, 120, 160)
    assert img.shape == (120, 160) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert len(corners) >= 4
    lab = cell_labels(corners, 120, 160)
    assert lab.shape == (15, 20)
    assert (lab != 64).sum() >= 3      # some corner cells
    assert (lab == 64).sum() > 100     # mostly dustbin


def test_warp_image_identity_and_shift():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (40, 48)).astype(np.float32)
    out = np.asarray(warp_image(jnp.asarray(img), jnp.eye(3)))
    # bilinear in-bounds gate excludes the last row/col (x0+1 sample)
    np.testing.assert_allclose(out[:-1, :-1], img[:-1, :-1], atol=1e-5)
    # dest->src map shifting +3 px in x: out[y, x] = img[y, x+3]
    Hm = np.eye(3, dtype=np.float32)
    Hm[0, 2] = 3.0
    out = np.asarray(warp_image(jnp.asarray(img), jnp.asarray(Hm)))
    np.testing.assert_allclose(out[:-1, :-4], img[:-1, 3:-1], atol=1e-5)


@pytest.mark.slow
def test_superpoint_training_reduces_loss():
    params, losses = train_superpoint(
        steps=30, batch=8, hw=(80, 96), log_every=0, seed=3)
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < 0.8 * first, f"no learning: {first:.3f} -> {last:.3f}"


@pytest.mark.slow
def test_netvlad_training_reduces_loss():
    cfg = NetVLADConfig(num_clusters=8, output_dim=512)
    params, losses = train_netvlad(
        steps=40, batch=8, hw=(80, 96), log_every=0, netvlad_cfg=cfg,
        seed=4)
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first, f"no learning: {first:.3f} -> {last:.3f}"


def test_weight_io_roundtrip(tmp_path):
    import jax

    from d2slam_tpu.frontend.superpoint import superpoint_init

    p = superpoint_init(jax.random.PRNGKey(0),
                        SuperPointConfig(max_keypoints=32))
    path = str(tmp_path / "sp.npz")
    save_weights(path, p)
    q = load_weights(path)
    la, lb = jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(q)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_system_loads_trained_weights(tmp_path):
    """superpoint_weights / netvlad_weights config keys wire trained
    npz files into the system node (reference superpoint_model_path /
    netvlad_model_path)."""
    import jax

    from d2slam_tpu.config import D2Config
    from d2slam_tpu.frontend.netvlad import netvlad_init
    from d2slam_tpu.frontend.superpoint import superpoint_init
    from d2slam_tpu.runtime.system import D2SLAMSystem, SystemConfig
    from d2slam_tpu.utils.sim import default_extrinsics

    sp = superpoint_init(jax.random.PRNGKey(0), SuperPointConfig())
    nv_cfg = NetVLADConfig(num_clusters=16, output_dim=1024)
    nv = netvlad_init(jax.random.PRNGKey(1), nv_cfg)
    sp_path = str(tmp_path / "sp.npz")
    nv_path = str(tmp_path / "nv.npz")
    save_weights(sp_path, sp)
    save_weights(nv_path, nv)

    cfg = D2Config()
    sys_cfg = SystemConfig(drone_id=0, superpoint_weights=sp_path,
                           netvlad_weights=nv_path, gdesc_dim=1024)
    from d2slam_tpu.geometry.cameras import PinholeParams

    cams = [PinholeParams.make(220.0, 220.0, 80, 60) for _ in range(2)]
    system = D2SLAMSystem(cfg, sys_cfg, default_extrinsics(0.1), cams)
    # the learned embedding is in force: unit-norm 1024-d vector
    img = np.random.default_rng(2).uniform(0, 1, (120, 160))
    g = system.gdesc_fn(img)
    assert g.shape == (1024,)
    np.testing.assert_allclose(np.linalg.norm(g), 1.0, atol=1e-3)
    # SuperPoint weights flowed into the tracker
    assert system.tracker.sp_params is not None
