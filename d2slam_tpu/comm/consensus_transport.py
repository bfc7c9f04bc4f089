"""Distributed consensus over the real network transport.

The reference's D2VINSNet path (reference: d2vins/src/network/
d2vins_net.cpp — channels DISTRIB_VINS_DATA + SYNC_SIGNAL with a
token/iteration-matched `waitForSync`, timeout 50-100 ms,
VINSConsenusSolver.cpp:93-120): each robot broadcasts its shared pose
estimates + iteration token, collects peers' copies until the timeout,
then performs the same averaging/dual update the mesh path uses
(parallel/consensus.py) — robots that stayed silent are simply absent
from the average, which is the reference's lossy-link tolerance.

Use this when robots are separate processes on a real network; use
`parallel.consensus` when they are shards of one TPU mesh.
"""
from __future__ import annotations

import struct
from typing import Dict, Optional, Tuple

import numpy as np

from d2slam_tpu.comm.transport import CH_DISTRIB_VINS, UDPMulticastTransport
from d2slam_tpu.utils import np_lie

_HDR = struct.Struct("<HIH")  # robot_id, token, n_poses


def encode_pose_msg(robot_id: int, token: int, poses: np.ndarray,
                    mask: np.ndarray) -> bytes:
    n = len(poses)
    return (
        _HDR.pack(robot_id, token, n)
        + np.asarray(poses, np.float32).tobytes()
        + np.asarray(mask, np.uint8).tobytes()
    )


def decode_pose_msg(buf: bytes):
    rid, token, n = _HDR.unpack_from(buf, 0)
    off = _HDR.size
    poses = np.frombuffer(buf, np.float32, n * 7, off).reshape(n, 7).copy()
    off += n * 28
    mask = np.frombuffer(buf, np.uint8, n, off).astype(bool).copy()
    return rid, token, poses, mask


def average_pose_copies(copies, masks):
    """Host-side consensus averaging over collected copies (the
    non-collective twin of parallel.consensus.consensus_average).

    copies: [R, W, 7]; masks: [R, W] bool. Returns [W, 7]."""
    import jax.numpy as jnp

    from d2slam_tpu.geometry.lie import quat_average

    R, W, _ = copies.shape
    out = copies[0].copy()
    for w in range(W):
        sel = masks[:, w]
        if not sel.any():
            continue
        out[w, :3] = copies[sel, w, :3].mean(axis=0)
        qs = jnp.asarray(copies[sel, w, 3:])
        out[w, 3:] = np.asarray(
            quat_average(qs, jnp.ones(int(sel.sum())))
        )
    return out


class TransportConsensus:
    """One robot's endpoint for transport-based consensus ADMM."""

    def __init__(self, transport: UDPMulticastTransport, self_id: int):
        self.t = transport
        self.self_id = self_id
        self._stash: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]] = {}

    def send_poses(self, token: int, poses: np.ndarray,
                   mask: np.ndarray) -> None:
        """Broadcast this robot's estimates for an iteration token
        (reference broadcastData, VINSConsenusSolver.cpp:11-44)."""
        self.t.send(
            CH_DISTRIB_VINS, encode_pose_msg(self.self_id, token, poses, mask)
        )

    def collect(self, token: int, poses, mask, expected_peers: int,
                timeout_ms: int = 100):
        """Gather peers' copies for this token (reference waitForSync).

        Returns (copies [R<=expected+1, W, 7], masks) — always includes
        our own copy; peers that miss the timeout are skipped."""
        got: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        # drain stashed messages for this token (arrived early)
        for (rid, tok) in list(self._stash.keys()):
            if tok == token:
                got[rid] = self._stash.pop((rid, tok))
        import time

        deadline = time.monotonic() + timeout_ms / 1000.0
        while len(got) < expected_peers and time.monotonic() < deadline:
            msg = self.t.recv(timeout_ms=20)
            if msg is None:
                continue
            ch, sender, payload = msg
            if ch != CH_DISTRIB_VINS:
                continue
            rid, tok, p, m = decode_pose_msg(payload)
            if tok == token:
                got[rid] = (p, m)
            elif tok > token:
                self._stash[(rid, tok)] = (p, m)
        copies = [poses] + [p for (p, _) in got.values()]
        masks = [mask] + [m for (_, m) in got.values()]
        return np.stack(copies), np.stack(masks)

    def consensus_step(self, token, poses, mask, tilde, expected_peers,
                       timeout_ms: int = 100, eta: float = 1.0,
                       send: bool = True):
        """Full reference-style sub-step: broadcast -> collect ->
        average -> dual update. Set ``send=False`` when
        :meth:`send_poses` was already called (e.g. phase-split
        single-process simulation). Returns (global_poses [W,7],
        new_tilde [W,6], n_peers)."""
        if send:
            self.send_poses(token, poses, mask)
        copies, masks = self.collect(
            token, poses, mask, expected_peers, timeout_ms
        )
        global_poses = average_pose_copies(copies, masks)
        new_tilde = tilde.copy()
        for w in range(len(poses)):
            if not mask[w]:
                continue
            gp, lp = global_poses[w], poses[w]
            q_ref = gp[3:] / np.linalg.norm(gp[3:])
            dt_ref = np_lie.quat_rotate(np_lie.quat_conj(q_ref),
                                        lp[:3] - gp[:3])
            q_err = np_lie.quat_mul(np_lie.quat_conj(q_ref),
                                    lp[3:] / np.linalg.norm(lp[3:]))
            # hemisphere correction — must match consensus_pose_residual
            # (same convention as parallel/consensus.py::dual_update)
            if q_err[3] < 0:
                q_err = -q_err
            d = np.concatenate([dt_ref, 2.0 * q_err[:3]])
            new_tilde[w] = tilde[w] + eta * d
        return global_poses, new_tilde, len(copies) - 1
