"""Consensus ADMM between two robot endpoints over the REAL UDP
multicast transport (the reference's DISTRIB_VINS_DATA path), each
running its own local LM solves."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d2slam_tpu.comm.consensus_transport import TransportConsensus
from d2slam_tpu.comm.transport import UDPMulticastTransport
from d2slam_tpu.geometry.lie import pose_boxminus, pose_boxplus
from d2slam_tpu.solver import VIOLayout, lm_solve_vio
from d2slam_tpu.solver.marginalization import make_pose_prior
from d2slam_tpu.utils.synthetic import default_col_free, make_circle_scene

LAYOUT = VIOLayout(W=6, C=2, L=64, M=512, N_IMU_SAMPLES=128)
PSI = 460.0 / 1.5


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
            tilde=np.zeros((LAYOUT.W, 6)),
        ))

    mask = np.asarray(gt.frame_valid)
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
            r["poses_np"] = np.asarray(r["state"].poses, np.float32)
            r["tc"].send_poses(token, r["poses_np"], mask)
        updates = []
        for r in robots:
            gp, new_tilde, n_peers = r["tc"].consensus_step(
                token, r["poses_np"], mask, r["tilde"], expected_peers=1,
                timeout_ms=500, send=False,
            )
            updates.append((gp, new_tilde, n_peers))
        for r, (gp, new_tilde, n_peers) in zip(robots, updates):
            assert n_peers == 1, "peer missed the exchange"
            r["tilde"] = new_tilde
            cons = (
                jnp.asarray(gp, jnp.float64),
                jnp.asarray(new_tilde, jnp.float64),
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
    try:
        ta = UDPMulticastTransport(self_id=1, port=17675)
    except OSError:
        pytest.skip("multicast unavailable")
    tc = TransportConsensus(ta, 1)
    W = 4
    poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (W, 1)).astype(np.float32)
    mask = np.ones(W, bool)
    tilde = np.zeros((W, 6))
    gp, new_tilde, n_peers = tc.consensus_step(
        0, poses, mask, tilde, expected_peers=2, timeout_ms=150
    )
    assert n_peers == 0  # nobody answered
    # global average degrades gracefully to our own estimate
    np.testing.assert_allclose(gp, poses, atol=1e-6)
    np.testing.assert_allclose(new_tilde, 0, atol=1e-6)
    ta.close()
