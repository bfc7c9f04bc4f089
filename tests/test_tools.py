"""Tooling: descriptor PCA fitting and the swarm traffic spy."""
import sys

import numpy as np

sys.path.insert(0, "tests")


def test_pca_fit_recovers_subspace():
    from d2slam_tpu.tools.pca import (
        explained_variance_ratio, fit_pca, load_pca, pca_params, save_pca,
    )

    rng = np.random.RandomState(0)
    # descriptors living (noisily) in a 8-dim subspace of 64
    basis = np.linalg.qr(rng.randn(64, 8))[0]
    X = rng.randn(500, 8) @ basis.T * 3.0 + rng.randn(500, 64) * 0.05 + 1.0
    mean, proj = fit_pca(X, 8)
    assert mean.shape == (64,) and proj.shape == (64, 8)
    assert explained_variance_ratio(X, 8) > 0.99
    # projection preserves pairwise distances of the signal part
    Y = (X - mean) @ proj
    d_full = np.linalg.norm(X[:50, None] - X[None, :50], axis=-1)
    d_proj = np.linalg.norm(Y[:50, None] - Y[None, :50], axis=-1)
    np.testing.assert_allclose(d_proj, d_full, rtol=0.05, atol=0.2)

    p = pca_params(X, 8)
    assert set(p) == {"mean", "proj"}


def test_pca_save_load_roundtrip(tmp_path):
    from d2slam_tpu.tools.pca import fit_pca, load_pca, save_pca

    rng = np.random.RandomState(1)
    X = rng.randn(100, 32)
    mean, proj = fit_pca(X, 4)
    f = str(tmp_path / "pca.npz")
    save_pca(f, mean, proj)
    out = load_pca(f)
    np.testing.assert_array_equal(out["mean"], mean)
    np.testing.assert_array_equal(out["proj"], proj)


def test_pca_plugs_into_superpoint_extract():
    import jax
    import jax.numpy as jnp

    from d2slam_tpu.frontend.superpoint import (
        SuperPointConfig, superpoint_extract, superpoint_init,
    )
    from d2slam_tpu.tools.pca import pca_params

    cfg = SuperPointConfig(max_keypoints=16, threshold=-1.0)
    params = superpoint_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(2)
    samples = rng.randn(300, 256)
    params["pca"] = {k: jnp.asarray(v)
                     for k, v in pca_params(samples, 64).items()}
    img = jnp.asarray(rng.rand(64, 96), jnp.float32)
    out = superpoint_extract(params, img, cfg)
    assert out.desc.shape == (16, 64)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.desc), axis=-1), 1.0, atol=1e-4)


def test_spy_ingest_and_report():
    from test_comm import make_packet

    from d2slam_tpu.comm.codec import encode_keyframe
    from d2slam_tpu.comm.transport import CH_SYNC_SIGNAL, CH_VIOKF_LANDMARKS
    from d2slam_tpu.tools.spy import SpyStats

    stats = SpyStats()
    pkt = make_packet(n=12)
    buf = encode_keyframe(pkt)
    stats.ingest(CH_VIOKF_LANDMARKS, 3, buf, now=1.0)
    stats.ingest(CH_VIOKF_LANDMARKS, 3, buf, now=1.5)
    stats.ingest(CH_SYNC_SIGNAL, 1, b"\x00" * 16, now=2.0)
    assert stats.by_channel[CH_VIOKF_LANDMARKS].packets == 2
    assert stats.by_sender[3].bytes == 2 * len(buf)
    assert len(stats.keyframes) == 2
    assert stats.keyframes[-1] == (3, pkt.frame_id, 12)
    rep = stats.report()
    assert "VIOKF_LANDMARKS" in rep and "SYNC_SIGNAL" in rep
    assert "keyframes decoded: 2" in rep


def test_spy_pump_over_loopback():
    """Drive the spy off the real UDP multicast transport."""
    import pytest

    from test_comm import make_packet

    from d2slam_tpu.comm.codec import encode_keyframe
    from d2slam_tpu.comm.transport import (
        CH_VIOKF_LANDMARKS, UDPMulticastTransport,
    )
    from d2slam_tpu.tools.spy import SpyStats

    try:
        sender = UDPMulticastTransport(1, port=7690)
        spy = UDPMulticastTransport(9999, port=7690)
    except Exception:
        pytest.skip("multicast unavailable in sandbox")
    try:
        buf = encode_keyframe(make_packet(n=5))
        stats = SpyStats()
        import threading

        def _send():
            import time

            for _ in range(3):
                sender.send(CH_VIOKF_LANDMARKS, buf)
                time.sleep(0.05)

        th = threading.Thread(target=_send)
        th.start()
        stats.pump(spy, seconds=0.6)
        th.join()
        assert stats.by_channel[CH_VIOKF_LANDMARKS].packets >= 1
        assert len(stats.keyframes) >= 1
    finally:
        sender.close()
        spy.close()
