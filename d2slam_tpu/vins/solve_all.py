"""SOLVE_ALL / SERVER estimation modes: one estimator, every drone.

TPU-native re-design of the reference's centralized estimation modes
(reference: d2common/include/d2common/d2basetypes.h ESTIMATION_MODE
{SOLVE_ALL_MODE, SERVER_MODE}; d2vins/src/estimator/d2estimator.cpp
:224-293 addFrameRemote, :301-320 inputRemoteImage, :700-736
setupImuFactors over remote windows; d2vinsstate.cpp:379-394
updateSldwin). Every drone's sliding window lives in ONE flat slot pool
and the joint problem — IMU chains per drone, projection factors across
drones through unified landmark ids, one dense prior — is solved by the
same jitted LM/marginalization kernels as the single-robot estimator.

TPU-first consequences of the pooled design:
  * the normal-equation GEMM covers all drones at once (one MXU matmul
    instead of per-drone solves + consensus rounds), which is exactly
    what SOLVE_ALL means in the reference;
  * per-drone IMU chains are just extra (frame_i, frame_j) pairs in the
    same vmapped preintegration batch — topology is data, not code;
  * remote window membership arrives in the wire packet
    (``sld_win`` of :class:`d2slam_tpu.comm.codec.RemoteKeyframePacket`)
    and is enforced by marginalizing departed frames into the prior.

SERVER mode is the same class fed only remote packets (the server
contributes no own frames): pass ``server_mode=True`` and skip
``input_frame``; call :meth:`solve_remote_only` on a cadence instead.

Limitation vs the reference: camera extrinsics are shared across drones
(one homogeneous rig per swarm, the common deployment); per-drone
extrinsic columns are a layout extension, not a redesign.
"""
from __future__ import annotations

import copy
from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from d2slam_tpu.comm.codec import RemoteKeyframePacket
from d2slam_tpu.config import D2Config
from d2slam_tpu.imu.buffer import IMUBuffer
from d2slam_tpu.solver.marginalization import add_gauge_rows, make_pose_prior
from d2slam_tpu.utils import np_lie
from d2slam_tpu.vins.estimator import D2Estimator, WindowFrame
from d2slam_tpu.vins.types import Odometry, global_frame_id as _gfid


class SolveAllEstimator(D2Estimator):
    def __init__(
        self,
        config: D2Config,
        extrinsics: np.ndarray,
        max_drones: int = 3,
        server_mode: bool = False,
        lm_id_map: Optional[Callable[[int, int], int]] = None,
    ):
        """``lm_id_map(drone_id, lm_id) -> global id`` unifies landmark
        ids across drones (wire a SwarmManager's ``unified_id`` here;
        default folds drone id into the key, i.e. no cross-drone
        landmark sharing until ids are unified upstream)."""
        self.W_per = config.estimator.max_sld_win_size
        self.max_drones = max_drones
        self.server_mode = server_mode
        self._lm_id_map = lm_id_map or (lambda d, l: _gfid(d, l))
        cfg = copy.deepcopy(config)
        cfg.estimator.max_sld_win_size = self.W_per * max_drones
        cfg.estimator.max_lm_slots = config.estimator.max_lm_slots * max_drones
        cfg.estimator.max_solve_cnt = config.estimator.max_solve_cnt * max_drones
        cfg.estimator.max_solve_measurements = (
            config.estimator.max_solve_measurements * max_drones
        )
        super().__init__(cfg, extrinsics)
        self.remote_bufs: Dict[int, IMUBuffer] = {}
        # drone -> (frame_id, ego pose [7], stamp) of last ingested frame
        self.remote_last_ego: Dict[int, Tuple[int, np.ndarray, float]] = {}
        self._gauge_done: set = set()
        self._pending: Dict[int, List[RemoteKeyframePacket]] = {}
        if server_mode:
            # the server never sees its own IMU/frames; its gauge is the
            # first remote drone's first frame (stiff prior below)
            self.initialized = True

    # ------------------------------------------------------------------
    # remote ingestion
    # ------------------------------------------------------------------

    def input_remote_frame(
        self,
        pkt: RemoteKeyframePacket,
        world_T_other: Optional[np.ndarray] = None,
    ) -> Optional[Odometry]:
        """Ingest one remote keyframe packet.

        ``world_T_other``: map alignment for this drone's ego frame
        (from SwarmManager.alignments); identity if the swarm shares a
        reference frame. Only used for the drone's FIRST frame — later
        frames chain by ego motion (reference addFrameRemote ego-motion
        chaining, d2estimator.cpp:254-270).
        """
        d = pkt.drone_id
        if (
            d not in self.remote_bufs
            and len(self.remote_bufs) >= self.max_drones - (0 if self.server_mode else 1)
        ):
            return None  # pool sized for max_drones; ignore extras
        buf = self.remote_bufs.setdefault(d, IMUBuffer())
        for k in range(len(pkt.imu_t)):
            buf.add(float(pkt.imu_t[k]), pkt.imu_acc[k], pkt.imu_gyr[k])

        if not self.initialized:
            # own window not yet bootstrapped; remember ego for chaining
            self.remote_last_ego[d] = (
                pkt.frame_id, pkt.pose.astype(np.float64), pkt.stamp
            )
            return None

        my_slots = self._drone_slots(d)
        ego = pkt.pose.astype(np.float64)
        if my_slots:
            prev_fid, prev_ego, _ = self.remote_last_ego[d]
            rel = np_lie.pose_compose(np_lie.pose_inverse(prev_ego), ego)
            prev_local = np.asarray(
                self.state.poses[my_slots[-1]], np.float64
            )
            new_pose = np_lie.pose_compose(prev_local, rel)
            R_align = np_lie.pose_compose(
                new_pose, np_lie.pose_inverse(ego)
            )
        else:
            align = (
                world_T_other
                if world_T_other is not None
                else np.array([0, 0, 0, 0, 0, 0, 1.0])
            )
            new_pose = np_lie.pose_compose(align, ego)
            R_align = align
        # velocity arrives in the remote drone's world frame; rotate it
        # into ours through the alignment attitude
        vel = np_lie.quat_rotate(R_align[3:], pkt.vel.astype(np.float64))

        if len(self.frames) >= self.layout.W:
            # pool exhausted (remote window sync will trim below; guard)
            self._trim_drone(d, self.W_per - 1)

        slot = len(self.frames)
        gid = _gfid(d, pkt.frame_id)
        self.frames.append(
            WindowFrame(gid, pkt.stamp, bool(pkt.is_keyframe), drone_id=d)
        )
        poses = np.asarray(self.state.poses).copy()
        sb = np.asarray(self.state.sb).copy()
        fv = np.asarray(self.state.frame_valid).copy()
        poses[slot] = new_pose
        sb[slot] = np.concatenate(
            [vel, pkt.ba.astype(np.float64), pkt.bg.astype(np.float64)]
        )
        fv[slot] = True
        self.state = self.state._replace(
            poses=jnp.asarray(poses, self.dtype),
            sb=jnp.asarray(sb, self.dtype),
            frame_valid=jnp.asarray(fv),
        )
        self.fej_poses[slot], self.fej_sb[slot] = poses[slot], sb[slot]
        self.remote_last_ego[d] = (pkt.frame_id, ego, pkt.stamp)
        self._meas_stale = True

        # gauge prior for this drone's first frame: 1/100 the main
        # drone's stiffness (reference d2vinsstate.cpp:503-555)
        if d not in self._gauge_done:
            if self.prior is None:
                self.prior = make_pose_prior(
                    self.layout, self.state, frame=slot,
                    pos_sqrt_info=100.0 if self.server_mode and not self._gauge_done else 1.0,
                    rot_sqrt_info=100.0 if self.server_mode and not self._gauge_done else 1.0,
                )
            else:
                self.prior = add_gauge_rows(
                    self.layout, self.prior, self.state, frame=slot,
                    pos_sqrt_info=1.0, rot_sqrt_info=1.0,
                )
            self._gauge_done.add(d)

        # landmark observations with unified ids
        for i in range(len(pkt.lm_ids)):
            self.lmanager.add_observation(
                self._lm_id_map(d, int(pkt.lm_ids[i])), gid,
                int(pkt.lm_cam[i]),
                pkt.lm_rays[i].astype(np.float64),
                pkt.lm_vels[i].astype(np.float64),
                -1.0,
            )

        self._sync_remote_window(d, pkt.sld_win)
        return Odometry(stamp=pkt.stamp, pose=new_pose, vel=vel)

    def solve_remote_only(self) -> None:
        """SERVER mode solve cadence (no own frames to trigger solves)."""
        n = sum(len(self._drone_slots(d)) for d in self.remote_bufs)
        if n >= self.cfg.estimator.min_solve_frames:
            self._solve_window()

    # ------------------------------------------------------------------
    # pooled window management
    # ------------------------------------------------------------------

    def _drone_slots(self, drone_id: int) -> List[int]:
        """Slots of one drone's frames, oldest first (list order is
        chronological per drone; the pool stays compacted)."""
        want = -1 if drone_id == self.cfg.self_id else drone_id
        return [
            w for w, f in enumerate(self.frames) if f.drone_id == want
        ]

    def drone_ids(self) -> List[int]:
        ids = {f.drone_id for f in self.frames}
        return sorted(self.cfg.self_id if i < 0 else i for i in ids)

    def _imu_chain(self):
        chain = []
        for w in range(len(self.frames)):
            f = self.frames[w]
            # find this drone's next frame in the pool
            for w2 in range(w + 1, len(self.frames)):
                if self.frames[w2].drone_id == f.drone_id:
                    buf = (
                        self.imubuf
                        if f.drone_id < 0
                        else self.remote_bufs.get(f.drone_id)
                    )
                    if buf is not None:
                        chain.append((w, w2, buf))
                    break
        return chain

    def _sync_remote_window(self, d: int, sld_win: np.ndarray) -> None:
        """Enforce the remote drone's own window membership (reference
        updateSldwin d2vinsstate.cpp:379-394): frames the sender dropped
        are marginalized here; independently cap at W_per."""
        if len(sld_win):
            keep = {_gfid(d, int(f)) for f in sld_win}
            slots = self._drone_slots(d)
            # never drop the only/last frame (the chaining anchor)
            for w in slots[:-1]:
                if self.frames[w].frame_id not in keep:
                    self._drop_frame(w, marginalize_it=True)
                    self._sync_remote_window(d, sld_win)  # slots moved
                    return
        self._trim_drone(d, self.W_per)

    def _trim_drone(self, d: int, cap: int) -> None:
        while len(self._drone_slots(d)) > cap:
            self._drop_frame(self._drone_slots(d)[0], marginalize_it=True)

    def _plan_marg_slot(self) -> int:
        # the pooled window trims per drone through _sync_remote_window
        # / _trim_drone — no single pre-known slot to fuse
        return -1

    def _manage_window(self) -> None:
        """Own-drone window policy (drop second-newest non-keyframe,
        else marginalize oldest — reference clearUselessFrames), applied
        to the self sub-window of the pool."""
        mine = self._drone_slots(self.cfg.self_id)
        if len(mine) < self.W_per:
            return
        second_newest = self.frames[mine[-2]]
        if not second_newest.is_keyframe:
            self._drop_frame(mine[-2], marginalize_it=False)
        else:
            self._drop_frame(mine[0], marginalize_it=True)

    # ------------------------------------------------------------------
    # outputs
    # ------------------------------------------------------------------

    def drone_odometry(self, drone_id: int) -> Optional[Odometry]:
        slots = self._drone_slots(drone_id)
        if not slots:
            return None
        w = slots[-1]
        return Odometry(
            stamp=self.frames[w].stamp,
            pose=np.asarray(self.state.poses[w]),
            vel=np.asarray(self.state.sb[w, :3]),
        )

    def drone_trajectory(self, drone_id: int) -> np.ndarray:
        """Current in-window poses of one drone, oldest first, [n, 7]."""
        slots = self._drone_slots(drone_id)
        return np.asarray(self.state.poses)[slots]
