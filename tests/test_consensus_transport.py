"""Consensus ADMM between two robot endpoints over the REAL UDP
multicast transport (the reference's DISTRIB_VINS_DATA path), each
running its own local LM solves. Shared poses are matched by frame id
on the wire (reference VINSConsenusSolver.cpp:60-92)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d2slam_tpu.comm.consensus_transport import (
    TransportConsensus,
    average_keyed_poses,
    decode_pose_msg,
    encode_pose_msg,
)
from d2slam_tpu.comm.transport import LocalBus, UDPMulticastTransport
from d2slam_tpu.geometry.lie import pose_boxminus, pose_boxplus
from d2slam_tpu.solver import VIOLayout, lm_solve_vio
from d2slam_tpu.solver.marginalization import make_pose_prior
from d2slam_tpu.utils.synthetic import default_col_free, make_circle_scene

LAYOUT = VIOLayout(W=6, C=2, L=64, M=512, N_IMU_SAMPLES=128)
PSI = 460.0 / 1.5


def test_pose_msg_roundtrip():
    keys = np.array([7, (3 << 40) + 9, 11], np.int64)
    poses = np.random.default_rng(0).normal(size=(3, 7)).astype(np.float32)
    cam_ids = np.array([0, 1], np.int32)
    cam_poses = np.random.default_rng(1).normal(size=(2, 7)).astype(np.float32)
    buf = encode_pose_msg(4, 17, keys, poses, cam_ids, cam_poses,
                          ref_frame_id=2)
    rid, tok, k2, p2, c2, cp2, ref = decode_pose_msg(buf)
    assert (rid, tok, ref) == (4, 17, 2)
    np.testing.assert_array_equal(k2, keys)
    np.testing.assert_allclose(p2, poses)
    np.testing.assert_array_equal(c2, cam_ids)
    np.testing.assert_allclose(cp2, cam_poses)


def test_keyed_average_divergent_windows():
    """Robots whose windows diverged average only genuinely shared
    frames — never positionally by slot (the round-1 latent bug)."""
    ident = np.array([0, 0, 0, 0, 0, 0, 1.0])
    shifted = np.array([1, 0, 0, 0, 0, 0, 1.0])
    # ours: frames {10, 11, 12}; peer has {11, 12, 13} (dropped 10,
    # gained 13) at DIFFERENT slots, with a shifted estimate of 11
    keys = np.array([10, 11, 12], np.int64)
    poses = np.tile(ident, (3, 1))
    peer = (np.array([13, 11, 12], np.int64),
            np.stack([ident + [9, 0, 0, 0, 0, 0, 0], shifted, ident]))
    gp, counts = average_keyed_poses(keys, poses, {2: peer})
    np.testing.assert_array_equal(counts, [1, 2, 2])
    np.testing.assert_allclose(gp[0], ident)          # only we have 10
    np.testing.assert_allclose(gp[1, 0], 0.5)         # 11 averaged
    np.testing.assert_allclose(gp[2], ident, atol=1e-12)


def test_transport_consensus_two_robots():
    try:
        ta = UDPMulticastTransport(self_id=1, port=17669)
        tb = UDPMulticastTransport(self_id=2, port=17669)
    except OSError:
        pytest.skip("multicast unavailable")

    scene = make_circle_scene(LAYOUT, n_frames=6, n_landmarks=40, seed=6)
    gt = scene["gt_state"]
    g = scene["gravity"]
    prior = make_pose_prior(LAYOUT, gt, frame=0)
    col_free = default_col_free(LAYOUT, gt, fix_first_pose=False)
    keys = np.arange(100, 100 + LAYOUT.W, dtype=np.int64)  # shared frames
    mask = np.asarray(gt.frame_valid)

    rng = np.random.default_rng(4)
    robots = []
    for rid, t in ((1, ta), (2, tb)):
        dpose = np.zeros((LAYOUT.W, 6))
        dpose[1:] = rng.normal(0, 0.03, (LAYOUT.W - 1, 6))
        state = gt._replace(
            poses=jax.vmap(pose_boxplus)(gt.poses, jnp.asarray(dpose)),
            inv_dep=gt.inv_dep * jnp.asarray(1 + rng.normal(0, 0.05, LAYOUT.L)),
        )
        robots.append(dict(
            tc=TransportConsensus(t, rid),
            state=state,
            tilde={},
        ))

    solve = jax.jit(
        lambda s, cons: lm_solve_vio(
            LAYOUT, s, scene["imu"], scene["proj"], prior,
            gravity=g, col_free=col_free, proj_sqrt_info=PSI,
            max_iters=3, consensus=cons,
        )
    )

    rho = 1e4
    for token in range(4):
        # both robots do the exchange sub-step (interleaved, single
        # process: robot A's exchange completes against B's broadcast
        # from the PREVIOUS half-step, so run the exchange phase first
        # for both, then the solves)
        for r in robots:
            r["poses_np"] = np.asarray(r["state"].poses, np.float64)
            r["tc"].send_poses(token, keys, r["poses_np"])
        updates = []
        for r in robots:
            gp, tilde_arr, n_peers, _ = r["tc"].consensus_step(
                token, keys, r["poses_np"], r["tilde"], expected_peers=1,
                timeout_ms=500, send=False,
            )
            updates.append((gp, tilde_arr, n_peers))
        for r, (gp, tilde_arr, n_peers) in zip(robots, updates):
            assert n_peers == 1, "peer missed the exchange"
            cons = (
                jnp.asarray(gp, jnp.float64),
                jnp.asarray(tilde_arr, jnp.float64),
                jnp.asarray(mask),
                rho, rho,
            )
            new_state, _ = solve(r["state"], cons)
            r["state"] = new_state

    pa = np.asarray(robots[0]["state"].poses)
    pb = np.asarray(robots[1]["state"].poses)
    d = np.asarray(
        jax.vmap(pose_boxminus)(jnp.asarray(pa), jnp.asarray(pb))
    )[mask]
    assert np.abs(d).max() < 2e-2, f"disagreement {np.abs(d).max()}"
    dgt = np.asarray(
        jax.vmap(pose_boxminus)(jnp.asarray(pa), gt.poses)
    )[mask]
    assert np.abs(dgt).max() < 8e-2, f"gt err {np.abs(dgt).max()}"  # 4 ADMM rounds
    ta.close()
    tb.close()


def test_consensus_tolerates_silent_peer():
    """Reference lossy-link semantics: a peer that misses the timeout
    simply drops out of the round's average (waitForSync timeout,
    VINSConsenusSolver.cpp:101-109) — the solve proceeds."""
    bus = LocalBus()
    tc = TransportConsensus(bus.endpoint(1), 1)
    W = 4
    keys = np.arange(W, dtype=np.int64)
    poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (W, 1)).astype(np.float64)
    tilde = {}
    gp, tilde_arr, n_peers, counts = tc.consensus_step(
        0, keys, poses, tilde, expected_peers=2, timeout_ms=50
    )
    assert n_peers == 0  # nobody answered
    np.testing.assert_array_equal(counts, 1)
    # global average degrades gracefully to our own estimate
    np.testing.assert_allclose(gp, poses, atol=1e-6)
    np.testing.assert_allclose(tilde_arr, 0, atol=1e-6)
