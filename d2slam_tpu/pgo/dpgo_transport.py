"""Transport-based distributed pose-graph optimization — the real
multi-process DPGO path (the reference's d2comm relay).

The reference exchanges ``DPGOData`` — per-frame poses + dual vectors —
between robot processes: ``ARockPGO::broadcastData``
(reference: d2pgo/src/ARockPGO.cpp:72-104) publishes one message per
neighbor over ROS → d2comm → LCM channel ``PGO_Sync_Data``
(d2comm/src/d2comm.cpp:3-47); ``processPGOData`` (:13-60) matches
incoming duals to frames BY FRAME ID and updates the per-(neighbor,
frame) dual-state pairs of the ARock asynchronous ADMM
(d2common/src/solver/ARock.cpp). This module is the TPU-native
equivalent over our UDP/in-memory transports: the host runs the ARock
protocol (duals, skip-if-stale, eta_k relaxation); each local solve is
one jitted fixed-shape LM program whose consensus penalty rows anchor
remote-owned poses at the neighbor-communicated duals
(ARock.cpp:256-314 setDualStateFactors — ConsenusPoseFactor with zero
tilde).

ARock semantics preserved (ARock.cpp:140-190 solve_arock):
  * receive → if nothing new, skip the step (up to ``max_wait_steps``);
  * local solve with dual-anchor factors;
  * dual update with eta_k relaxation (ARock.cpp:24-84):
      avg        = pose_average(dual_local, dual_remote)
      err        = log(cur_est⁻¹ ∘ avg)
      dual_local ← dual_local ∘ exp(−eta_k · err)
  * broadcast one DPGOData per neighbor (our duals of their frames).

Use :mod:`d2slam_tpu.pgo.distributed` when the robots are shards of one
TPU mesh; this module when they are separate processes on a network.
"""
from __future__ import annotations

import dataclasses
import struct
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

from d2slam_tpu.comm.transport import CH_PGO_DATA
from d2slam_tpu.utils import np_lie

# DPGODataType (reference d2pgo_types.h:8-13)
DPGO_POSE_DUAL = 0
DPGO_ROT_MAT_DUAL = 1
DPGO_DELTA_POSE_DUAL = 2
# out-of-band signal message (reference sendSignal -> swarm_msgs
# DPGOSignal topic -> inputDPGOsignal, d2pgo.cpp:124-129); the signal
# code rides in the ``iteration`` header field, payload is empty
DPGO_SIGNAL = 3
SIGNAL_ROT_INIT_FINISH = 1

_HDR = struct.Struct("<BHhiBdiH")  # ver, drone, target, ref_frame, type,
#                                    stamp, iteration, n_frames
_WIRE_VERSION = 1


class DPGOData(NamedTuple):
    """Wire payload of one ARock exchange (reference DPGOData,
    d2pgo_types.h:15-31: drone_id, target_id, reference_frame_id, type,
    frame_poses, frame_duals)."""

    drone_id: int
    target_id: int          # the neighbor these duals talk about (-1 = all)
    ref_frame_id: int
    msg_type: int
    stamp: float
    iteration: int
    keys: np.ndarray        # [n] int64 global frame ids
    poses: np.ndarray       # [n, 7] sender's current estimates
    duals: np.ndarray       # [n, 7] sender's local dual poses


def encode_dpgo(d: DPGOData) -> bytes:
    n = len(d.keys)
    return b"".join([
        _HDR.pack(_WIRE_VERSION, d.drone_id, d.target_id, d.ref_frame_id,
                  d.msg_type, d.stamp, d.iteration, n),
        np.asarray(d.keys, np.int64).tobytes(),
        np.asarray(d.poses, np.float32).tobytes(),
        np.asarray(d.duals, np.float32).tobytes(),
    ])


def decode_dpgo(buf: bytes) -> Optional[DPGOData]:
    if len(buf) < _HDR.size:
        return None
    ver, drone, target, ref, typ, stamp, it, n = _HDR.unpack_from(buf, 0)
    if ver != _WIRE_VERSION:
        return None
    off = _HDR.size
    keys = np.frombuffer(buf, np.int64, n, off).copy(); off += 8 * n
    poses = np.frombuffer(buf, np.float32, n * 7, off).reshape(n, 7).copy()
    off += 28 * n
    duals = np.frombuffer(buf, np.float32, n * 7, off).reshape(n, 7).copy()
    return DPGOData(drone, target, ref, typ, stamp, it, keys, poses, duals)


# ---------------------------------------------------------------------------
# jitted local solve with dual anchors
# ---------------------------------------------------------------------------


def solve_pgo_anchored(
    layout,
    state,
    edges,
    fixed_mask,
    anchor_idx,      # [K] int32 pose slots
    anchor_pose,     # [K, 7] dual poses to anchor at
    anchor_active,   # [K] bool
    *,
    rho_T: float = 0.1,
    rho_theta: float = 2.0,
    max_iters: int = 6,
    huber_delta: float = 1.0,
):
    """solve_pgo plus consensus anchor rows: every active anchor adds a
    penalty pulling pose[idx] toward its dual pose (reference
    setDualStateFactors, ARock.cpp:256-314 — ConsenusPoseFactor with
    zero tilde for 6-DoF layouts, ConsenusPoseFactor4D for the 4-DoF
    x/y/z/yaw mode the reference defaults to, d2pgo_node.cpp:182-187
    is_4dof=true)."""
    import jax
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    from d2slam_tpu.factors.residuals import consensus_pose_residual
    from d2slam_tpu.geometry.lie import (
        pose4d_boxplus,
        pose_boxplus,
        yaw_from_quat,
    )
    from d2slam_tpu.pgo.pose_graph import _build_rows
    from d2slam_tpu.solver.vio_assembly import place_block

    dof = layout.pose_dof
    assert dof in (4, 6)
    dtype = state.poses.dtype
    D = layout.D_pad

    col_free = jnp.zeros((D,), dtype)
    per_pose = (state.valid & ~fixed_mask).astype(dtype)
    col_free = col_free.at[: layout.D].set(jnp.repeat(per_pose, dof))

    z6 = jnp.zeros((3,), dtype)
    boxplus = pose_boxplus if dof == 6 else pose4d_boxplus
    sT = jnp.asarray(np.sqrt(rho_T), dtype)
    sth = jnp.asarray(np.sqrt(rho_theta), dtype)

    def anchor_resid(pose, ref):
        if dof == 6:
            return consensus_pose_residual(pose, ref, z6, z6, rho_T,
                                           rho_theta)
        dyaw = yaw_from_quat(pose[3:]) - yaw_from_quat(ref[3:])
        dyaw = jnp.arctan2(jnp.sin(dyaw), jnp.cos(dyaw))
        return jnp.concatenate(
            [sT * (pose[:3] - ref[:3]), sth * dyaw[None]]
        )

    def anchor_rows(s):
        def one(idx, ref, act):
            pose = s.poses[idx]

            def f(d):
                return anchor_resid(boxplus(pose, d), ref)

            z = jnp.zeros((dof,), dtype)
            r = f(z)
            J = jax.jacfwd(f)(z)
            row = place_block(J, dof * idx, D)
            w = act.astype(dtype) * s.valid[idx].astype(dtype)
            return r * w, row * w

        r, rows = jax.vmap(one)(anchor_idx, anchor_pose, anchor_active)
        K = anchor_idx.shape[0]
        return rows.reshape(K * dof, D), r.reshape(-1)

    def build(s):
        J1, r1, cost1 = _build_rows(layout, s, edges, huber_delta)
        J2, r2 = anchor_rows(s)
        J = jnp.concatenate([J1, J2], axis=0)
        r = jnp.concatenate([r1, r2])
        return J, r, jnp.sum(cost1) + 0.5 * jnp.sum(r2 * r2)

    def apply_delta(s, dx):
        d = dx[: layout.D].reshape(layout.N, dof)
        return s._replace(poses=jax.vmap(boxplus)(s.poses, d))

    def iteration(carry, _):
        s, cost, lam = carry
        J, r, _ = build(s)
        J = J * col_free[None, :]
        H = J.T @ J
        g = J.T @ r
        H = H + lam * jnp.diag(jnp.diag(H)) + jnp.diag(1.0 - col_free) \
            + 1e-9 * jnp.eye(D, dtype=dtype)
        dx = -jsl.cho_solve(jsl.cho_factor(H), g) * col_free
        cand = apply_delta(s, dx)
        _, _, cand_cost = build(cand)
        accept = cand_cost < cost
        s2 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), cand, s
        )
        return (
            s2, jnp.where(accept, cand_cost, cost),
            jnp.where(accept, lam * 0.25, lam * 10.0),
        ), accept

    _, _, cost0 = build(state)
    vzero = jnp.sum(state.poses) * 0.0
    (final, cost, _), accepts = jax.lax.scan(
        iteration, (state, cost0, jnp.asarray(1e-6, dtype) + vzero),
        None, length=max_iters,
    )
    return final, (cost0, cost, jnp.sum(accepts))


# ---------------------------------------------------------------------------
# the ARock endpoint
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DPGOTransportConfig:
    max_poses: int = 256
    max_edges: int = 1024
    max_anchors: int = 256
    # 6 = full SE(3); 4 = x/y/z/yaw with roll/pitch pinned to the VIO
    # gravity estimate — the reference's default for real swarms
    # (d2pgo_node.cpp:182-187, is_4dof=true)
    pose_dof: int = 6
    # reference defaults: pgo_rho_frame_T 0.01-0.1, pgo_rho_frame_theta
    # 2.0 (config/tum/tum_multi.yaml:141-142), eta_k 0.9
    rho_T: float = 0.1
    rho_theta: float = 2.0
    eta_k: float = 0.9
    max_steps: int = 1           # ARock sub-steps per solve() call
    max_wait_steps: int = 5      # skip-if-stale budget (ARock.cpp:146-162)
    iters_per_step: int = 6      # inner LM iterations
    huber_delta: float = 1.0
    # local-solve precision. The transport endpoint is the multi-process
    # host path (one robot = one CPU process, like the reference's
    # Ceres/f64 d2pgo_node); in float32 the per-round cost improvement
    # from slow ARock dual drift falls below the cost scalar's
    # resolution, the LM accept-gate rejects every step and the primal
    # freezes while duals drift — so float64 is the default. Use
    # float32 only where x64 is unavailable (on-TPU endpoints).
    solve_dtype: str = "float64"
    # chordal rotation initialization before the first ARock round
    # (reference solve_multi: RotInit -> waitForRotInitFinish -> ARock)
    rot_init: bool = True
    # ROT_INIT_FINISH barrier: after local rot-init, skip ARock rounds
    # until every robot in available_robots has signalled (reference
    # waitForRotInitFinish, d2pgo.cpp:130-153) or this many rounds have
    # been skipped (reference rot_init_timeout)
    rot_init_timeout_rounds: int = 20
    # per-frame attitude priors in the rot-init (reference
    # rotation_initialization_base.hpp:131-144; 0 disables)
    gravity_weight: float = 0.0
    # long-mission capacity: the graph GROWS (doubling, one recompile
    # per doubling) instead of silently refusing frames at max_poses —
    # the reference's Ceres graph is unbounded (d2pgo.cpp:15-44
    # addFrame). hard_max_* is the absolute memory ceiling.
    hard_max_poses: int = 32768
    hard_max_edges: int = 131072
    # past this many pose slots the anchored local solve routes to the
    # matrix-free PCG path (pgo/pcg.py::solve_pgo_pcg_anchored) — the
    # dense-Jacobian path is O(N*E) memory
    pcg_threshold: int = 2048
    cg_iters: int = 60


class TransportDPGO:
    """One robot's ARock DPGO endpoint over a real transport.

    Host-side graph bookkeeping (poses, edges, duals keyed by 64-bit
    frame ids); one jitted fixed-shape anchored-LM program for the local
    solves. Frames AND edges of ALL drones the robot has heard about
    live in its local problem — the reference builds each robot's PGO
    the same way (setupEgoMotionFactors iterates every drone's
    trajectory and every robot adds all loops it received,
    d2pgo.cpp:413-528); the edge replication is uniform across robots,
    so the implicit consensus objective is a constant multiple of the
    centralized one, and the ARock duals reconcile the copies.
    """

    def __init__(self, transport, self_id: int,
                 cfg: DPGOTransportConfig = DPGOTransportConfig(),
                 ref_frame_id: int = 0):
        # capacity growth (_grow_poses / add_edge) mutates cfg.max_*;
        # copy per instance so robots sharing one cfg object don't
        # inherit each other's grown capacities without reallocating
        cfg = dataclasses.replace(cfg)
        self.t = transport
        self.self_id = self_id
        self.cfg = cfg
        self.ref_frame_id = ref_frame_id
        # graph (host)
        self.keys: List[int] = []
        self.slot_of: Dict[int, int] = {}
        self.owner: Dict[int, int] = {}
        self.poses = np.zeros((cfg.max_poses, 7))
        self.poses[:, 6] = 1.0
        # body-frame gravity direction at insertion (third row of the
        # ego attitude) for the rot-init gravity priors
        self.grav_body = np.tile([0.0, 0.0, 1.0], (cfg.max_poses, 1))
        self._rot_inited = False
        self.edges: List[Tuple[int, int, np.ndarray, np.ndarray]] = []
        # ARock dual state, keyed (peer_drone, frame_key)
        self.dual_local: Dict[Tuple[int, int], np.ndarray] = {}
        self.dual_remote: Dict[Tuple[int, int], np.ndarray] = {}
        self.updated = True           # reference ARockBase::updated
        self.iteration = 0
        self._wait = 0
        self._solver = None
        self._inbox: List[DPGOData] = []
        self.last_report = None
        # ROT_INIT_FINISH barrier state (reference d2pgo.h:36,58 —
        # available_robots defaults to {self}; the multi-agent driver
        # widens it via setAvailableRobots)
        self.available_robots = {int(self_id)}
        self.rot_init_finished_robots: set = set()
        self._rot_barrier_waited = 0
        self._rot_barrier_passed = False

    # ---------------- graph building ----------------

    def _grow_poses(self) -> bool:
        """Double the pose capacity (up to hard_max_poses), reallocating
        the fixed-shape arrays and dropping the jitted solver so the
        next solve compiles at the new layout."""
        cfg = self.cfg
        new_cap = min(cfg.max_poses * 2, cfg.hard_max_poses)
        if new_cap <= cfg.max_poses:
            return False
        poses = np.zeros((new_cap, 7))
        poses[:, 6] = 1.0
        poses[: cfg.max_poses] = self.poses
        grav = np.tile([0.0, 0.0, 1.0], (new_cap, 1))
        grav[: cfg.max_poses] = self.grav_body
        self.poses, self.grav_body = poses, grav
        cfg.max_poses = new_cap
        cfg.max_anchors = max(cfg.max_anchors, new_cap)
        self._solver = None
        return True

    def add_frame(self, key: int, owner: int, pose: np.ndarray) -> bool:
        if key in self.slot_of:
            return True
        if len(self.keys) >= self.cfg.max_poses and not self._grow_poses():
            import warnings

            warnings.warn(
                f"TransportDPGO at hard_max_poses="
                f"{self.cfg.hard_max_poses}; dropping frame {key}"
            )
            return False
        slot = len(self.keys)
        self.keys.append(int(key))
        self.slot_of[int(key)] = slot
        self.owner[int(key)] = int(owner)
        self.poses[slot] = np.asarray(pose, np.float64)
        self.grav_body[slot] = np_lie.quat_to_rotmat(
            np.asarray(pose[3:], np.float64)
        )[2]
        self.updated = True
        return True

    def set_initial_pose(self, key: int, pose: np.ndarray) -> None:
        slot = self.slot_of.get(int(key))
        if slot is not None:
            self.poses[slot] = np.asarray(pose, np.float64)

    def add_edge(self, key_a: int, key_b: int, rel: np.ndarray,
                 sqrt_info: np.ndarray) -> bool:
        """Relative-pose edge (ego or loop) OWNED by this robot."""
        if len(self.edges) >= self.cfg.max_edges:
            new_cap = min(self.cfg.max_edges * 2, self.cfg.hard_max_edges)
            if new_cap <= self.cfg.max_edges:
                return False
            self.cfg.max_edges = new_cap
            self._solver = None
        if int(key_a) not in self.slot_of or int(key_b) not in self.slot_of:
            return False
        self.edges.append((int(key_a), int(key_b),
                           np.asarray(rel, np.float64),
                           np.asarray(sqrt_info, np.float64)))
        self.updated = True
        return True

    # ---------------- ARock protocol ----------------

    def _scan_duals(self) -> None:
        """Create dual pairs for remote-owned poses touched by our edges
        (reference scanAndCreateDualStates, ARock.cpp:192-208; init to
        the current estimate, dual_state_init_to_zero=false)."""
        for (ka, kb, _, _) in self.edges:
            for k in (ka, kb):
                own = self.owner.get(k, self.self_id)
                if own == self.self_id:
                    continue
                pair = (own, k)
                if pair not in self.dual_remote:
                    cur = self.poses[self.slot_of[k]].copy()
                    self.dual_remote[pair] = cur.copy()
                    self.dual_local[pair] = cur.copy()

    def receive_all(self, max_msgs: int = 256) -> int:
        """Drain CH_PGO_DATA (reference ARockPGO::receiveAll +
        processPGOData: accept duals about frames we know, if addressed
        to us or previously unseen)."""
        n = 0
        while n < max_msgs:
            m = self.t.recv(timeout_ms=0)
            if m is None:
                break
            ch, sender, payload = m
            if ch != CH_PGO_DATA:
                continue
            d = decode_dpgo(payload)
            if d is None or d.drone_id == self.self_id:
                continue
            if d.ref_frame_id != self.ref_frame_id:
                continue
            self._apply(d)
            n += 1
        return n

    def input_data(self, d: DPGOData) -> None:
        """Direct injection (single-process simulations/tests)."""
        self._apply(d)

    def set_available_robots(self, ids) -> None:
        """Robots whose ROT_INIT_FINISH signal gates the first ARock
        round (reference setAvailableRobots, d2pgo.h:73-75)."""
        self.available_robots = {int(i) for i in ids} | {self.self_id}

    def _apply(self, d: DPGOData) -> None:
        if d.msg_type == DPGO_SIGNAL:
            if d.iteration == SIGNAL_ROT_INIT_FINISH:
                self.rot_init_finished_robots.add(int(d.drone_id))
                # a signal is new information: without this, a robot
                # held at the barrier whose peers are also held (so no
                # dual data flows) would never re-evaluate the barrier
                # and the whole swarm would deadlock pre-ARock
                self.updated = True
            return
        for i, k in enumerate(d.keys):
            k = int(k)
            if k not in self.slot_of:
                continue
            pair = (d.drone_id, k)
            fresh = pair not in self.dual_remote
            if d.target_id != self.self_id and not fresh:
                continue  # reference: target check OR first discovery
            self.dual_remote[pair] = d.duals[i].astype(np.float64)
            if fresh:
                self.dual_local[pair] = d.duals[i].astype(np.float64)
            self.updated = True

    def _broadcast(self, stamp: float) -> None:
        """One DPGOData per neighbor: our local duals of the frames we
        share with them + our current estimates (reference
        ARockPGO::broadcastData)."""
        by_peer: Dict[int, List[int]] = {}
        for (peer, k) in self.dual_local:
            by_peer.setdefault(peer, []).append(k)
        for peer, allk in by_peer.items():
            poses = np.stack([self.poses[self.slot_of[k]] for k in allk])
            duals = np.stack([self.dual_local[(peer, k)] for k in allk])
            msg = DPGOData(
                drone_id=self.self_id, target_id=peer,
                ref_frame_id=self.ref_frame_id,
                msg_type=DPGO_DELTA_POSE_DUAL, stamp=stamp,
                iteration=self.iteration,
                keys=np.asarray(allk, np.int64),
                poses=poses.astype(np.float32),
                duals=duals.astype(np.float32),
            )
            self.t.send(CH_PGO_DATA, encode_dpgo(msg))

    def _update_duals(self) -> None:
        """eta_k-relaxed dual update (reference updateDualStates,
        ARock.cpp:24-84; the 4-DoF branch mirrors the IsPose4D vector
        path: elementwise x/y/z average + circular yaw average, linear
        relaxation, yaw renormalized)."""
        eta = self.cfg.eta_k
        for pair, dl in self.dual_local.items():
            dr = self.dual_remote[pair]
            _, k = pair
            cur = self.poses[self.slot_of[k]]
            if self.cfg.pose_dof == 4:
                yl, yr = np_lie.yaw_of(dl[3:]), np_lie.yaw_of(dr[3:])
                avg_p = 0.5 * (dl[:3] + dr[:3])
                avg_y = np.arctan2(0.5 * (np.sin(yl) + np.sin(yr)),
                                   0.5 * (np.cos(yl) + np.cos(yr)))
                d_p = eta * (avg_p - cur[:3])
                d_y = eta * np_lie.wrap_angle(avg_y - np_lie.yaw_of(cur[3:]))
                new_y = np_lie.wrap_angle(yl - d_y)
                self.dual_local[pair] = np.concatenate(
                    [dl[:3] - d_p, np_lie.quat_from_yaw(new_y)]
                )
                continue
            avg = np_lie.pose_average(np.stack([dl, dr]))
            err = np_lie.pose_log(
                np_lie.pose_compose(np_lie.pose_inverse(cur), avg)
            )
            self.dual_local[pair] = np_lie.pose_compose(
                dl, np_lie.pose_exp(-eta * err)
            )

    # ---------------- the solve ----------------

    def _maybe_rot_init(self) -> None:
        """Chordal attitude + linear position initialization on the
        local graph BEFORE the first ARock round — and before any dual
        states are created, so duals (ours and the first values we
        broadcast to peers) initialize at post-init estimates, matching
        the reference's ordering (solve_multi: RotInit →
        waitForRotInitFinish barrier → ARock, d2pgo.cpp:155-328)."""
        cfg = self.cfg
        if not cfg.rot_init or self._rot_inited or len(self.edges) < 3:
            return
        import jax.numpy as jnp

        from d2slam_tpu.geometry.lie import quat_normalize
        from d2slam_tpu.pgo.rot_init import (
            chordal_rotation_init,
            linear_translation_init,
        )

        n = len(self.keys)
        valid = np.zeros(cfg.max_poses, bool)
        valid[:n] = True
        E = cfg.max_edges
        ei = np.zeros(E, np.int32)
        ej = np.zeros(E, np.int32)
        rel = np.tile([0, 0, 0, 0, 0, 0, 1.0], (E, 1))
        ev = np.zeros(E, bool)
        for x, (ka, kb, r, _) in enumerate(self.edges[:E]):
            ei[x], ej[x], rel[x], ev[x] = (
                self.slot_of[ka], self.slot_of[kb], r, True
            )
        # the init runs before any ARock duals exist, so unlike the
        # ARock gauge (main robot only, d2pgo.cpp:602-614) EVERY robot
        # must anchor its local init — an unanchored chordal LS
        # collapses to the trivial zero solution. Anchor at the main
        # (lowest-owner) robot's first frame so the local gauges agree
        # across the swarm; the reference gets the same effect from the
        # rot-init's exchanged ROT_MAT duals
        # (rotation_initialization_arock.hpp).
        init_fixed = np.zeros(cfg.max_poses, bool)
        owners = set(self.owner.values())
        main = min(owners) if owners else self.self_id
        for slot, k in enumerate(self.keys):
            if self.owner[k] == main:
                init_fixed[slot] = True
                break

        p = chordal_rotation_init(
            jnp.asarray(self.poses), jnp.asarray(valid),
            jnp.asarray(ei), jnp.asarray(ej),
            quat_normalize(jnp.asarray(rel[:, 3:])),
            jnp.asarray(ev), jnp.asarray(init_fixed),
            gravity_body=jnp.asarray(self.grav_body),
            gravity_weight=cfg.gravity_weight,
        )
        p = linear_translation_init(
            p, jnp.asarray(valid), jnp.asarray(ei), jnp.asarray(ej),
            jnp.asarray(rel[:, :3]), jnp.asarray(ev),
            jnp.asarray(init_fixed),
        )
        self.poses[:n] = np.asarray(p, np.float64)[:n]
        self._rot_inited = True

    def _send_signal(self, code: int, stamp: float = 0.0) -> None:
        msg = DPGOData(
            drone_id=self.self_id, target_id=-1,
            ref_frame_id=self.ref_frame_id, msg_type=DPGO_SIGNAL,
            stamp=stamp, iteration=code,
            keys=np.zeros(0, np.int64),
            poses=np.zeros((0, 7), np.float32),
            duals=np.zeros((0, 7), np.float32),
        )
        self.t.send(CH_PGO_DATA, encode_dpgo(msg))

    def _rot_init_barrier_ok(self, stamp: float) -> bool:
        """True when ARock rounds may run. After our local rot-init we
        (re)announce ROT_INIT_FINISH and hold until every robot in
        ``available_robots`` has announced too, or the round budget
        runs out (reference waitForRotInitFinish, d2pgo.cpp:130-153:
        spin + periodic re-send + rot_init_timeout)."""
        if not self.cfg.rot_init or not self._rot_inited:
            return True
        if self._rot_barrier_passed:
            return True
        self.rot_init_finished_robots.add(self.self_id)
        self._send_signal(SIGNAL_ROT_INIT_FINISH, stamp)
        if (self.available_robots <= self.rot_init_finished_robots
                or self._rot_barrier_waited >= self.cfg.rot_init_timeout_rounds):
            self._rot_barrier_passed = True
            return True
        self._rot_barrier_waited += 1
        return False

    def _local_solve(self) -> None:
        import functools

        import jax
        import jax.numpy as jnp

        from d2slam_tpu.pgo.pose_graph import PGOEdges, PGOLayout, PGOState

        cfg = self.cfg
        layout = PGOLayout(cfg.max_poses, cfg.max_edges, cfg.pose_dof)
        if self._solver is None:
            if cfg.max_poses > cfg.pcg_threshold:
                # long-mission scale: matrix-free anchored PCG (dense
                # anchored LM is O(N*E) memory)
                from d2slam_tpu.pgo.pcg import solve_pgo_pcg_anchored

                self._solver = functools.partial(
                    solve_pgo_pcg_anchored, layout,
                    rho_T=cfg.rho_T, rho_theta=cfg.rho_theta,
                    max_iters=cfg.iters_per_step,
                    cg_iters=cfg.cg_iters,
                    huber_delta=cfg.huber_delta,
                )
            else:
                self._solver = jax.jit(functools.partial(
                    solve_pgo_anchored, layout,
                    rho_T=cfg.rho_T, rho_theta=cfg.rho_theta,
                    max_iters=cfg.iters_per_step,
                    huber_delta=cfg.huber_delta,
                ))
        n = len(self.keys)
        valid = np.zeros(cfg.max_poses, bool)
        valid[:n] = True
        # gauge: the main robot (lowest known owner id) hard-fixes the
        # first frame it owns (reference setStateProperties,
        # d2pgo.cpp:602-614). Non-main robots must NOT hard-fix their
        # local estimate of that frame — it may be wrong (drifted VIO
        # ingest) and the ARock duals are what correct it — but with
        # nothing fixed their local problem floats in its 6-DoF gauge
        # null space, so they get a SOFT self-anchor on the main frame
        # below (added to the dual-anchor rows).
        fixed = np.zeros(cfg.max_poses, bool)
        owners = set(self.owner.values())
        main = min(owners) if owners else self.self_id
        main_slot = -1
        for slot, k in enumerate(self.keys):
            if self.owner[k] == main:
                main_slot = slot
                break
        if self.self_id == main and main_slot >= 0:
            fixed[main_slot] = True

        E = cfg.max_edges
        dof = cfg.pose_dof
        ei = np.zeros(E, np.int32)
        ej = np.zeros(E, np.int32)
        rel = np.tile([0, 0, 0, 0, 0, 0, 1.0], (E, 1))
        si = np.tile(np.eye(dof), (E, 1, 1))
        sel4 = np.ix_([0, 1, 2, 5], [0, 1, 2, 5])  # x,y,z,yaw of a 6x6
        for x, (ka, kb, r, s) in enumerate(self.edges[:E]):
            if dof == 4 and s.shape == (6, 6):
                s = s[sel4]
            ei[x], ej[x], rel[x], si[x] = (
                self.slot_of[ka], self.slot_of[kb], r, s
            )
        ev = np.zeros(E, bool)
        ev[: min(len(self.edges), E)] = True

        K = cfg.max_anchors
        ai = np.zeros(K, np.int32)
        ap = np.tile([0, 0, 0, 0, 0, 0, 1.0], (K, 1))
        aa = np.zeros(K, bool)
        x = 0
        for pair, dr in self.dual_remote.items():
            if x >= K:
                break
            ai[x], ap[x], aa[x] = self.slot_of[pair[1]], dr, True
            x += 1
        if self.self_id != main and main_slot >= 0 and x < K:
            # soft gauge anchor: the main frame at the robot's CURRENT
            # estimate. Zero force at the current point — it only adds
            # curvature that pins the otherwise-zero-stiffness gauge
            # null space; the regular dual anchors remain free to move
            # the frame across rounds.
            ai[x] = main_slot
            ap[x] = self.poses[main_slot]
            aa[x] = True

        dt = jnp.dtype(cfg.solve_dtype)
        state = PGOState(
            poses=jnp.asarray(self.poses, dt),
            valid=jnp.asarray(valid),
        )
        edges = PGOEdges(
            i=jnp.asarray(ei), j=jnp.asarray(ej),
            rel=jnp.asarray(rel, dt),
            sqrt_info=jnp.asarray(si, dt),
            valid=jnp.asarray(ev),
        )
        out, report = self._solver(
            state, edges, jnp.asarray(fixed), jnp.asarray(ai),
            jnp.asarray(ap, dt), jnp.asarray(aa),
        )
        opt = np.array(out.poses, np.float64)  # copy: jax arrays are read-only views
        opt[:n, 3:] /= np.linalg.norm(opt[:n, 3:], axis=1, keepdims=True)
        self.poses[:n] = opt[:n]
        self.last_report = report

    def solve(self, stamp: float = 0.0) -> int:
        """One ARock round (reference solve_arock, ARock.cpp:140-190):
        receive → skip-if-stale → solve → dual update → broadcast.
        Returns the number of sub-steps actually executed."""
        done = 0
        total = 0
        while done < self.cfg.max_steps:
            self.receive_all()
            if not self.updated:
                total += 1
                if total > self.cfg.max_wait_steps + self.cfg.max_steps:
                    break  # exceeded max_wait_steps — give up this round
                continue
            self._maybe_rot_init()
            if not self._rot_init_barrier_ok(stamp):
                break  # hold ARock until peers finish rot-init
            self._scan_duals()
            self._local_solve()
            self.updated = False
            self._update_duals()
            self._broadcast(stamp)
            self.iteration += 1
            done += 1
            total += 1
        return done

    # ---------------- outputs ----------------

    def optimized_pose(self, key: int) -> Optional[np.ndarray]:
        slot = self.slot_of.get(int(key))
        return None if slot is None else self.poses[slot].copy()

    def trajectory(self, owner: int) -> np.ndarray:
        slots = [self.slot_of[k] for k in self.keys if self.owner[k] == owner]
        return self.poses[slots].copy()
