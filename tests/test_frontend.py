"""Frontend components: SuperPoint pipeline semantics, NMS,
descriptor sampling, matching, retrieval, and LK optical flow on
synthetic imagery."""
import jax
import jax.numpy as jnp
import numpy as np

from d2slam_tpu.frontend import (
    NetVLADConfig,
    SuperPointConfig,
    build_pyramid,
    lk_track_pyramidal,
    match_descriptors,
    match_descriptors_radius,
    netvlad_apply,
    netvlad_init,
    superpoint_apply,
    superpoint_extract,
    superpoint_init,
)
from d2slam_tpu.frontend.matching import retrieval_topk
from d2slam_tpu.frontend.netvlad import (
    dequantize_descriptor_int8,
    quantize_descriptor_int8,
)
from d2slam_tpu.frontend.superpoint import sample_descriptors, simple_nms


def test_superpoint_shapes_and_extract():
    cfg = SuperPointConfig(max_keypoints=64, threshold=0.0)
    params = superpoint_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    img = jax.random.uniform(jax.random.PRNGKey(1), (120, 160), jnp.float32)
    scores, desc = superpoint_apply(params, img[None, :, :, None])
    assert scores.shape == (1, 120, 160)
    assert desc.shape == (1, 15, 20, 256)
    out = superpoint_extract(params, img, cfg)
    assert out.kpts.shape == (64, 2)
    assert out.desc.shape == (64, 256)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.desc), axis=1), 1.0, atol=1e-5
    )
    # scores sorted descending
    s = np.asarray(out.scores)
    assert (np.diff(s) <= 1e-7).all()


def test_simple_nms():
    s = jnp.zeros((1, 32, 32))
    s = s.at[0, 10, 10].set(1.0).at[0, 10, 12].set(0.8).at[0, 25, 25].set(0.5)
    out = np.asarray(simple_nms(s, 4))
    assert out[0, 10, 10] == 1.0
    assert out[0, 10, 12] == 0.0  # suppressed by stronger neighbor
    assert out[0, 25, 25] == 0.5


def test_sample_descriptors_interpolates():
    Hc, Wc, D = 4, 4, 8
    rng = np.random.default_rng(0)
    dc = jnp.asarray(rng.normal(0, 1, (Hc, Wc, D)), jnp.float32)
    # at a cell center (pixel 8k+3.5) the sample equals that cell's desc
    kpts = jnp.asarray([[3.5 + 8 * 2, 3.5 + 8 * 1]], jnp.float32)  # cell (1,2)
    d = np.asarray(sample_descriptors(dc, kpts, (32, 32)))[0]
    expect = np.asarray(dc[1, 2])
    expect = expect / np.linalg.norm(expect)
    np.testing.assert_allclose(d, expect, atol=1e-6)


def test_matching_ratio_and_crosscheck():
    rng = np.random.default_rng(0)
    D = 32
    base = rng.normal(0, 1, (20, D))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # b = permuted a with small noise
    perm = rng.permutation(20)
    noisy = base[perm] + rng.normal(0, 0.05, (20, D))
    noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
    idx, ok = match_descriptors(
        jnp.asarray(base), jnp.asarray(noisy),
        jnp.ones(20, bool), jnp.ones(20, bool),
    )
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert ok.sum() >= 18
    # matched pairs are correct under the permutation
    for a_i in np.flatnonzero(ok):
        assert perm[idx[a_i]] == a_i


def test_matching_radius_gate():
    rng = np.random.default_rng(1)
    D = 16
    a = rng.normal(0, 1, (10, D))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    pts_a = jnp.asarray(rng.uniform(0, 100, (10, 2)), jnp.float32)
    pts_b_near = pts_a + 2.0
    idx, ok = match_descriptors_radius(
        jnp.asarray(a), jnp.asarray(a), pts_a, pts_b_near,
        jnp.ones(10, bool), jnp.ones(10, bool), radius=5.0,
    )
    assert np.asarray(ok).all()
    # push all candidates far outside the gate (beyond any pair distance)
    _, ok2 = match_descriptors_radius(
        jnp.asarray(a), jnp.asarray(a), pts_a, pts_b_near + 500.0,
        jnp.ones(10, bool), jnp.ones(10, bool), radius=5.0,
    )
    assert not np.asarray(ok2).any()


def test_retrieval_topk():
    rng = np.random.default_rng(2)
    db = rng.normal(0, 1, (50, 64))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[17:18] + rng.normal(0, 0.01, (1, 64))
    scores, idx = retrieval_topk(
        jnp.asarray(q), jnp.asarray(db), jnp.ones(50, bool), k=3
    )
    assert int(idx[0, 0]) == 17
    assert float(scores[0, 0]) > 0.99


def test_netvlad_output():
    cfg = NetVLADConfig(pca_dim=0)
    params = netvlad_init(jax.random.PRNGKey(0), cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 128, 1), jnp.float32)
    v = netvlad_apply(params, img, cfg)
    assert v.shape == (1, 4096)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v)), 1.0, atol=1e-5)
    # int8 wire quantization roundtrip keeps direction
    q, s = quantize_descriptor_int8(v)
    v2 = dequantize_descriptor_int8(q, s)
    assert float(jnp.sum(v * v2)) > 0.999


def make_texture(H=120, W=160, seed=0):
    """Smooth random texture with good gradients."""
    rng = np.random.default_rng(seed)
    img = rng.normal(0, 1, (H // 4, W // 4))
    img = np.kron(img, np.ones((4, 4)))
    # blur
    k = np.ones((5, 5)) / 25.0
    from numpy.lib.stride_tricks import sliding_window_view

    pad = np.pad(img, 2, mode="edge")
    img = (sliding_window_view(pad, (5, 5)) * k).sum(axis=(2, 3))
    return (img - img.min()) / (img.max() - img.min())


def test_lk_tracks_known_shift():
    img0 = make_texture()
    shift = (3.0, -2.0)  # (dx, dy): next = prev shifted
    H, W = img0.shape
    # generate shifted image by bilinear sampling
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    from scipy.ndimage import map_coordinates

    img1 = map_coordinates(
        img0, [yy - shift[1], xx - shift[0]], order=1, mode="nearest"
    )
    pts = jnp.asarray(
        np.stack(np.meshgrid(np.arange(30, 130, 20), np.arange(30, 90, 20)),
                 -1).reshape(-1, 2),
        jnp.float32,
    )
    pyr0 = build_pyramid(jnp.asarray(img0, jnp.float32), 2)
    pyr1 = build_pyramid(jnp.asarray(img1, jnp.float32), 2)
    new_pts, ok = lk_track_pyramidal(
        pyr0, pyr1, pts, jnp.ones(len(pts), bool), win=15, iters=15
    )
    ok = np.asarray(ok)
    flow = np.asarray(new_pts - pts)[ok]
    assert ok.sum() >= len(pts) * 0.7
    np.testing.assert_allclose(
        flow.mean(axis=0), shift, atol=0.15
    )
