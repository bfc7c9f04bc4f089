"""Retrieval precision under perceptual aliasing + PCM false-loop
rejection (round-3 verdict item 5: a high-recall low-precision
retriever poisons PGO; nothing measured that)."""
import os

import numpy as np
import pytest

WDIR = os.path.join(os.path.dirname(__file__), "..", "weights")
NV_W = os.path.join(WDIR, "netvlad_synth.npz")


@pytest.mark.skipif(not os.path.exists(NV_W),
                    reason="trained NetVLAD weights not present")
def test_retrieval_precision_under_aliasing():
    from d2slam_tpu.frontend.netvlad import netvlad_cfg_from_params
    from d2slam_tpu.frontend.train_frontend import load_weights
    from d2slam_tpu.utils.evaluation import retrieval_pr_aliasing

    nv = load_weights(NV_W)
    cfg = netvlad_cfg_from_params(nv)
    r = retrieval_pr_aliasing(nv, cfg)
    print(f"aliasing P@0.8 {r['precision_at_0p8']:.2f} "
          f"R@0.8 {r['recall_at_0p8']:.2f}; best-F1 op: thres "
          f"{r['op_threshold']:.2f} P {r['op_precision']:.2f} "
          f"R {r['op_recall']:.2f}")
    # high precision against aliased clones at the reference's fixed
    # 0.8 gate, and a usable self-calibrated operating point (the
    # detector's auto_thres plays that role at runtime)
    assert r["precision_at_0p8"] >= 0.75, r["precision_at_0p8"]
    assert r["op_precision"] >= 0.75, r["op_precision"]
    assert r["op_recall"] >= 0.6, r["op_recall"]


def test_pcm_rejects_aliased_false_loops():
    """False loop edges (as produced by an aliased retrieval hit: a
    plausible-looking relative pose to the WRONG place) are rejected by
    the PCM consistency gate while true loops survive (reference
    OutlierRejectionLoopEdges, swarm_outlier_rejection.cpp:199-201)."""
    from d2slam_tpu.pgo.pcm import pcm_filter
    from d2slam_tpu.utils import np_lie

    rng = np.random.default_rng(4)
    # a circle trajectory of poses
    N = 40
    th = 2 * np.pi * np.arange(N) / N
    poses = np.zeros((N, 7))
    poses[:, 0] = 10 * np.cos(th)
    poses[:, 1] = 10 * np.sin(th)
    poses[:, 5] = np.sin(th / 2)
    poses[:, 6] = np.cos(th / 2)

    ia = rng.integers(0, N, 12)
    ib = (ia + rng.integers(10, 30, 12)) % N
    rels, pa, pb, is_true = [], [], [], []
    for k, (a, b) in enumerate(zip(ia, ib)):
        true_rel = np_lie.pose_compose(
            np_lie.pose_inverse(poses[a]), poses[b])
        if k < 8:   # true loops (small measurement noise)
            d = np.concatenate(
                [rng.normal(0, 0.02, 3), rng.normal(0, 0.01, 3), [1.0]])
            d[3:] /= np.linalg.norm(d[3:])
            rels.append(np_lie.pose_compose(true_rel, d))
            is_true.append(True)
        else:       # aliased: the pose of a DIFFERENT place entirely
            # (diametrically across the course — what retrieving a
            # repeated-structure lookalike produces)
            wrong = (b + N // 2 + rng.integers(-3, 4)) % N
            rels.append(np_lie.pose_compose(
                np_lie.pose_inverse(poses[a]), poses[wrong]))
            is_true.append(False)
        pa.append(poses[a])
        pb.append(poses[b])
    keep = pcm_filter(np.stack(rels), np.stack(pa), np.stack(pb),
                      thres=1.5)
    is_true = np.asarray(is_true)
    kept_false = int(np.sum(keep & ~is_true))
    kept_true = int(np.sum(keep & is_true))
    print(f"PCM: kept {kept_true}/8 true, {kept_false}/4 false")
    assert kept_true >= 6, f"PCM rejected true loops: {kept_true}/8"
    assert kept_false == 0, f"PCM passed {kept_false} aliased loops"
