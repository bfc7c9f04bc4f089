"""Full per-robot D2SLAM stack in one object.

The reference runs three processes per robot — ``d2vins_node`` (which
is-a D2Frontend: CNN frontend + feature tracking + VIO + keyframe
broadcast, reference d2vins/src/d2vins_node.cpp:29, 128-303),
``d2pgo_node`` (pose-graph backend consuming keyframes + loop edges,
d2pgo/src/d2pgo_node.cpp:15-230) and ``d2comm_node`` (LCM relay) —
wired by ROS topics. ``D2SLAMSystem`` is the TPU-native composition of
the same capabilities as one library object per robot:

    images + IMU ──► FeatureTracker (SuperPoint/LK) ──► D2Estimator
        │                                                   │ odometry
        ├─► global descriptor ─► LoopDetector ─► LoopEdge ──┤
        │                                                   ▼
        └─► LoopNet broadcast (UDP / in-memory)      pose-graph solve
                       ▲                              (solve_pgo, jit)
            remote keyframes ─► SwarmManager ─► inter-robot loops,
                                                map alignment

All device compute (CNN extraction, sliding-window BA, PGO LM
iterations) is jitted with static shapes; this class is the host-side
conductor — queues, id management, graph bookkeeping — exactly the
split SURVEY.md §7 prescribes.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from d2slam_tpu.comm.codec import RemoteKeyframePacket
from d2slam_tpu.config import D2Config
from d2slam_tpu.frontend.loop_detector import (
    KeyframeEntry,
    LoopDetector,
    LoopDetectorConfig,
    LoopEdge,
)
from d2slam_tpu.frontend.tracker import FeatureTracker, TrackerConfig
from d2slam_tpu.utils import np_lie
from d2slam_tpu.vins.estimator import D2Estimator
from d2slam_tpu.vins.swarm import SwarmManager
from d2slam_tpu.vins.types import FrontendFrame, Odometry


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SystemConfig:
    """Knobs of the integrated node (reference launch/YAML equivalents)."""

    drone_id: int = 0
    enable_loop_detection: bool = True   # reference enable_loop
    enable_pgo: bool = True
    pgo_every_n_kf: int = 5              # d2pgo solver_timer_freq analog
    pgo_max_poses: int = 256
    pgo_max_edges: int = 1024
    pgo_pose_dof: int = 6                # PGO_POSE_DOF {4, 6}
    pgo_iters: int = 10
    # dense | pcg | auto: auto picks the matrix-free PCG solver once the
    # pose budget outgrows the dense-Jacobian path (pgo/pcg.py)
    pgo_solver: str = "auto"
    pgo_pcg_threshold: int = 2048
    pgo_cg_iters: int = 100
    # ego-motion edge covariance, distance-scaled (reference
    # setupEgoMotionFactors, d2pgo.cpp:468-528)
    ego_pos_cov_per_m: float = 0.01
    ego_yaw_cov_per_m: float = 0.01
    ego_cov_min: float = 1e-4
    pcm_thres: float = 1.5               # PCM gate on inter-drone loops
    gdesc_dim: int = 1024
    lazy_broadcast: bool = False         # lazy_broadcast_keyframe
    broadcast: bool = True               # send keyframes when transport set


def image_embedding_gdesc(img: np.ndarray, dim: int = 1024) -> np.ndarray:
    """Weight-free global descriptor: L2-normalized, mean-removed
    downsample of the image. Stands in for MobileNetVLAD when no
    trained weights are available (zero-egress container); same
    retrieval contract (unit vector, dot-product similarity). Pass a
    NetVLAD ``gdesc_fn`` to D2SLAMSystem for the real thing."""
    H, W = img.shape[:2]
    side = int(np.sqrt(dim))
    ys = np.linspace(0, H - 1, side).astype(int)
    xs = np.linspace(0, W - 1, side).astype(int)
    v = np.asarray(img, np.float32)[np.ix_(ys, xs)].reshape(-1)
    out = np.zeros(dim, np.float32)
    out[: v.size] = v - v.mean()
    n = np.linalg.norm(out)
    return out / n if n > 1e-9 else out


# ---------------------------------------------------------------------------
# the node
# ---------------------------------------------------------------------------


class D2SLAMSystem:
    """One robot's full stack (frontend + VIO + loop closure + PGO).

    Parameters
    ----------
    cfg: estimator/backend config tree (``D2Config``).
    sys_cfg: integration knobs (``SystemConfig``).
    extrinsics: [C, 7] body_T_cam.
    cameras: list of PinholeParams (rectified models; the fisheye path
        goes through depth.fisheye_undist first, as in the reference).
    sp_params/sp_cfg: SuperPoint weights/config (random init works for
        smoke runs).
    extract_fn: optional override ``f(img, cam_id) -> SuperPointOutput``
        (tests inject oracle extractors).
    gdesc_fn: optional ``f(img) -> [G]`` global descriptor (NetVLAD);
        defaults to the weight-free embedding above.
    transport: optional comm transport (UDPMulticastTransport or
        in-memory fake); enables keyframe broadcast + remote ingestion.
    """

    def __init__(
        self,
        cfg: D2Config,
        sys_cfg: SystemConfig,
        extrinsics: np.ndarray,
        cameras,
        sp_params=None,
        sp_cfg=None,
        *,
        extract_fn=None,
        gdesc_fn=None,
        transport=None,
        tracker_cfg: Optional[TrackerConfig] = None,
        loop_cfg: Optional[LoopDetectorConfig] = None,
        frame_rate: float = 8.0,
    ):
        self.cfg = cfg
        self.sys = sys_cfg
        self.ext = np.asarray(extrinsics, np.float64)
        self.drone_id = sys_cfg.drone_id

        if sp_cfg is None:
            from d2slam_tpu.frontend.superpoint import SuperPointConfig

            sp_cfg = SuperPointConfig(max_keypoints=200, threshold=1e-4)
        self.tracker = FeatureTracker(
            sp_params, sp_cfg, cameras,
            tracker_cfg or TrackerConfig(), frame_rate=frame_rate,
            extract_fn=extract_fn,
        )
        self.estimator = D2Estimator(cfg, self.ext)
        self.gdesc_fn = gdesc_fn or (
            lambda img: image_embedding_gdesc(img, sys_cfg.gdesc_dim)
        )

        lc = loop_cfg or LoopDetectorConfig(gdesc_dim=sys_cfg.gdesc_dim)
        self.detector = LoopDetector(lc, self.ext)
        self.swarm = SwarmManager(self.drone_id, self.detector)

        self.loopnet = None
        if transport is not None:
            from d2slam_tpu.comm.loopnet import LoopNet

            self.loopnet = LoopNet(
                transport, self.drone_id, lazy=sys_cfg.lazy_broadcast
            )
            self.loopnet.on_keyframe = self._on_remote_keyframe

        # ---- PGO graph bookkeeping (host side) ----
        # (drone_id, frame_id) -> pose slot
        self._pgo_slot: Dict[Tuple[int, int], int] = {}
        # per slot: drone_id, frame_id, stamp, ego pose at insertion
        self._pgo_meta: List[Tuple[int, int, float, np.ndarray]] = []
        self._last_kf_of: Dict[int, int] = {}  # drone -> last slot
        self._ego_edges: List[Tuple[int, int, np.ndarray, float]] = []
        self.loop_edges: List[LoopEdge] = []
        self._pgo_poses: Optional[np.ndarray] = None  # optimized [N, 7]
        self._pgo_solver = None
        self._kf_since_pgo = 0
        self.pgo_solve_count = 0
        self._frame_id = 0

        # rolling outputs
        self.odometry: Optional[Odometry] = None
        self.last_loop: Optional[LoopEdge] = None
        self.last_pgo_report = None
        self._aligned_drones: set = set()

    # ------------------------------------------------------------------
    # inputs
    # ------------------------------------------------------------------

    def input_imu(self, t: float, acc, gyr) -> None:
        self.estimator.input_imu(t, acc, gyr)

    def input_stereo(self, t: float, img_left: np.ndarray,
                     img_right: np.ndarray) -> Optional[Odometry]:
        """Process one stereo pair. Returns VIO odometry on keyframes
        (the reference's processStereoframe → inputImage path)."""
        ff = self.tracker.process_stereo(t, self._frame_id, img_left,
                                         img_right)
        self._frame_id += 1
        if ff is None:
            return None
        od = self.estimator.input_frame(ff)
        if od is not None:
            self.odometry = od
            self._register_keyframe(ff, od, img_left)
        return od

    def input_frame(self, ff: FrontendFrame,
                    gdesc: Optional[np.ndarray] = None,
                    kf_entry: Optional[KeyframeEntry] = None
                    ) -> Optional[Odometry]:
        """Feature-level input (oracle frontends / replayed tracks)."""
        od = self.estimator.input_frame(ff)
        if od is not None:
            self.odometry = od
            self._register_keyframe(ff, od, None, gdesc=gdesc,
                                    entry=kf_entry)
        return od

    def poll_network(self, now: float, timeout_ms: int = 0) -> int:
        """Drain the transport (remote keyframes -> swarm manager)."""
        if self.loopnet is None:
            return 0
        return self.loopnet.poll(now, timeout_ms)

    # ------------------------------------------------------------------
    # keyframe fan-out: loop detection, PGO graph, broadcast
    # ------------------------------------------------------------------

    def _register_keyframe(self, ff: FrontendFrame, od: Odometry,
                           img: Optional[np.ndarray],
                           gdesc: Optional[np.ndarray] = None,
                           entry: Optional[KeyframeEntry] = None) -> None:
        pose = np.asarray(od.pose, np.float64)
        self._add_pgo_node(self.drone_id, ff.frame_id, ff.stamp, pose)

        if gdesc is None:
            gdesc = (self.gdesc_fn(img) if img is not None
                     else np.zeros(self.sys.gdesc_dim, np.float32))
        gdesc = np.asarray(gdesc, np.float32)

        if self.sys.enable_loop_detection:
            if entry is None:
                entry = self._make_entry(ff, pose)
            else:
                # refresh caller-provided entries with the post-solve
                # pose and current landmark estimates
                entry = entry._replace(
                    pose=pose,
                    lm_positions=self._lm_positions_of(ff),
                )
            if entry is not None:
                edge = self.detector.detect(entry, gdesc)
                self.swarm.add_local_keyframe(entry, gdesc, ff.stamp)
                if edge is not None:
                    self.add_loop_edge(edge)

        if self.loopnet is not None and self.sys.broadcast:
            pkt = self._make_packet(ff, pose, gdesc, entry)
            if pkt is not None:
                self.loopnet.broadcast_keyframe(pkt)

        self._kf_since_pgo += 1
        if (self.sys.enable_pgo
                and self._kf_since_pgo >= self.sys.pgo_every_n_kf
                and len(self._pgo_meta) >= 3):
            self.solve_pgo()

    def _make_entry(self, ff: FrontendFrame,
                    pose: np.ndarray) -> Optional[KeyframeEntry]:
        """Build a retrieval-DB entry from cam0 observations + current
        landmark estimates (the VisualImageDesc of this keyframe)."""
        kf = self.tracker.last_kf
        obs0 = next((o for o in ff.observations if o.cam_id == 0), None)
        if obs0 is None or len(obs0.landmark_ids) == 0:
            return None
        ids = np.asarray(obs0.landmark_ids)
        rays = np.asarray(obs0.rays, np.float64)
        if kf and "desc" in kf:
            desc_of = {lid: d for lid, d, v in
                       zip(kf["ids"], kf["desc"], kf["valid"]) if v}
            desc = np.stack([
                desc_of.get(lid, np.zeros(self.detector.cfg.desc_dim,
                                          np.float32))
                for lid in ids
            ])
        else:
            desc = np.zeros((len(ids), self.detector.cfg.desc_dim),
                            np.float32)
        lm_pos = self._lm_positions_of(ff)
        return KeyframeEntry(
            frame_id=ff.frame_id, drone_id=self.drone_id, stamp=ff.stamp,
            pose=pose, kpt_rays=rays,
            kpt_cam=np.zeros(len(ids), np.int32), kpt_desc=desc,
            kpt_valid=np.ones(len(ids), bool), lm_positions=lm_pos,
        )

    def _lm_positions_of(self, ff: FrontendFrame) -> np.ndarray:
        """World positions of this frame's cam0 landmarks from the
        estimator DB (nan where not yet estimated)."""
        obs0 = next((o for o in ff.observations if o.cam_id == 0), None)
        if obs0 is None:
            return np.zeros((0, 3))
        ids = np.asarray(obs0.landmark_ids)
        lm_pos = np.full((len(ids), 3), np.nan)
        for k, lid in enumerate(ids):
            lm = self.estimator.lmanager.db.get(int(lid))
            if lm is not None and lm.position is not None:
                lm_pos[k] = lm.position
        return lm_pos

    def _make_packet(self, ff: FrontendFrame, pose: np.ndarray,
                     gdesc: np.ndarray,
                     entry: Optional[KeyframeEntry]
                     ) -> Optional[RemoteKeyframePacket]:
        if entry is None:
            entry = self._make_entry(ff, pose)
        if entry is None:
            return None
        obs0 = next(o for o in ff.observations if o.cam_id == 0)
        return RemoteKeyframePacket(
            drone_id=self.drone_id, frame_id=ff.frame_id, stamp=ff.stamp,
            is_keyframe=True, pose=pose.astype(np.float32),
            gdesc=gdesc,
            lm_ids=np.asarray(obs0.landmark_ids, np.int64),
            lm_cam=np.zeros(len(obs0.landmark_ids), np.uint8),
            lm_rays=np.asarray(obs0.rays, np.float32),
            lm_vels=np.asarray(obs0.ray_vels, np.float32),
            lm_desc=entry.kpt_desc.astype(np.float32),
        )

    def _on_remote_keyframe(self, pkt: RemoteKeyframePacket) -> None:
        edge = self.swarm.on_remote_keyframe(pkt)
        # remote keyframes extend the pose graph in the remote drone's
        # ego frame, aligned once a map alignment exists
        pose = pkt.pose.astype(np.float64)
        aligned = self.swarm.transform_remote_pose(pkt.drone_id, pose)
        self._add_pgo_node(pkt.drone_id, pkt.frame_id, pkt.stamp,
                           pose, init_pose=aligned)
        if edge is not None:
            self.add_loop_edge(edge)
        # first alignment for this drone: re-seed its existing graph
        # nodes into our world frame (reference map merge moveAllPoses)
        a = self.swarm.alignments.get(pkt.drone_id)
        if a is not None and pkt.drone_id not in self._aligned_drones:
            self._aligned_drones.add(pkt.drone_id)
            for slot, (d, _, _, ego) in enumerate(self._pgo_meta):
                if d == pkt.drone_id:
                    self._pgo_poses[slot] = np_lie.pose_compose(
                        a.transform, ego
                    )

    # ------------------------------------------------------------------
    # pose-graph backend (the d2pgo_node role)
    # ------------------------------------------------------------------

    def _add_pgo_node(self, drone_id: int, frame_id: int, stamp: float,
                      ego_pose: np.ndarray,
                      init_pose: Optional[np.ndarray] = None) -> None:
        key = (drone_id, frame_id)
        if key in self._pgo_slot or len(self._pgo_meta) >= self.sys.pgo_max_poses:
            return
        slot = len(self._pgo_meta)
        self._pgo_slot[key] = slot
        self._pgo_meta.append((drone_id, frame_id, stamp,
                               np.asarray(ego_pose, np.float64)))
        if self._pgo_poses is None:
            self._pgo_poses = np.zeros((self.sys.pgo_max_poses, 7))
            self._pgo_poses[:, 6] = 1.0
        self._pgo_poses[slot] = (init_pose if init_pose is not None
                                 else ego_pose)
        prev = self._last_kf_of.get(drone_id)
        if prev is not None:
            # ego-motion edge with distance-scaled covariance
            pa = self._pgo_meta[prev][3]
            rel = np_lie.pose_compose(np_lie.pose_inverse(pa), ego_pose)
            dist = float(np.linalg.norm(rel[:3]))
            self._ego_edges.append((prev, slot, rel, dist))
        self._last_kf_of[drone_id] = slot

    def add_loop_edge(self, edge: LoopEdge) -> None:
        self.loop_edges.append(edge)
        self.last_loop = edge

    def _loop_slot(self, drone_id: int, frame_id: int) -> Optional[int]:
        return self._pgo_slot.get((drone_id, frame_id))

    def solve_pgo(self) -> Optional[np.ndarray]:
        """One PGO update over the accumulated graph (jitted LM, static
        layout → one compile). Returns optimized poses [N, 7]."""
        import jax
        import jax.numpy as jnp

        from d2slam_tpu.pgo import (
            PGOEdges,
            PGOLayout,
            PGOState,
            solve_pgo,
            solve_pgo_pcg,
        )

        self._kf_since_pgo = 0
        n = len(self._pgo_meta)
        if n < 3:
            return None
        layout = PGOLayout(self.sys.pgo_max_poses, self.sys.pgo_max_edges,
                           self.sys.pgo_pose_dof)

        # ---- assemble edges (ego + PCM-filtered loops) ----
        E = layout.E
        ei = np.zeros(E, np.int32)
        ej = np.zeros(E, np.int32)
        rel = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0]), (E, 1))
        si = np.tile(np.eye(6), (E, 1, 1))
        valid = np.zeros(E, bool)
        k = 0
        for (a, b, r, dist) in self._ego_edges:
            if k >= E:
                break
            cov_p = max(self.sys.ego_cov_min,
                        self.sys.ego_pos_cov_per_m * dist)
            cov_y = max(self.sys.ego_cov_min,
                        self.sys.ego_yaw_cov_per_m * dist)
            ei[k], ej[k], rel[k] = a, b, r
            si[k] = np.diag([1 / np.sqrt(cov_p)] * 3
                            + [1 / np.sqrt(cov_y)] * 3)
            valid[k] = True
            k += 1

        loops = self._usable_loops()
        if len(loops) > 1:
            mask = self._pcm_mask(loops)
        else:
            mask = np.ones(len(loops), bool)
        for keep, (sa, sb, e) in zip(mask, loops):
            if k >= E or not keep:
                continue
            ei[k], ej[k], rel[k] = sa, sb, e.rel_pose
            si[k] = np.diag([1 / np.sqrt(e.pos_cov)] * 3
                            + [1 / np.sqrt(e.yaw_cov)] * 3)
            valid[k] = True
            k += 1

        poses = np.array(self._pgo_poses)
        v = np.zeros(layout.N, bool)
        v[:n] = True
        fixed = np.zeros(layout.N, bool)
        fixed[0] = True  # gauge: first frame (reference main_id first kf)

        if self._pgo_solver is None:
            use_pcg = self.sys.pgo_solver == "pcg" or (
                self.sys.pgo_solver == "auto"
                and layout.N > self.sys.pgo_pcg_threshold
            )
            if use_pcg:
                self._pgo_solver = jax.jit(
                    lambda s, e, f: solve_pgo_pcg(
                        layout, s, e, f, max_iters=self.sys.pgo_iters,
                        cg_iters=self.sys.pgo_cg_iters,
                    )
                )
            else:
                self._pgo_solver = jax.jit(
                    lambda s, e, f: solve_pgo(layout, s, e, f,
                                              max_iters=self.sys.pgo_iters)
                )
        state = PGOState(poses=jnp.asarray(poses, jnp.float32),
                         valid=jnp.asarray(v))
        edges = PGOEdges(
            i=jnp.asarray(ei), j=jnp.asarray(ej),
            rel=jnp.asarray(rel, jnp.float32),
            sqrt_info=jnp.asarray(si, jnp.float32),
            valid=jnp.asarray(valid),
        )
        out, report = self._pgo_solver(state, edges, jnp.asarray(fixed))
        opt = np.asarray(out.poses, np.float64)
        opt[:, 3:] /= np.linalg.norm(opt[:, 3:], axis=1, keepdims=True)
        self._pgo_poses[:n] = opt[:n]
        self.pgo_solve_count += 1
        self.last_pgo_report = report
        return opt[:n]

    def _usable_loops(self) -> List[Tuple[int, int, LoopEdge]]:
        out = []
        for e in self.loop_edges:
            sa = self._loop_slot(e.drone_id_a, e.frame_id_a)
            sb = self._loop_slot(e.drone_id_b, e.frame_id_b)
            if sa is not None and sb is not None:
                out.append((sa, sb, e))
        return out

    def _pcm_mask(self, loops) -> np.ndarray:
        """PCM consistency gate on loop edges (reference
        OutlierRejectionLoopEdges; intra-robot edges pass through)."""
        from d2slam_tpu.pgo.pcm import pcm_filter

        rels = np.stack([e.rel_pose for (_, _, e) in loops])
        pa = np.stack([self._pgo_meta[sa][3] for (sa, _, _) in loops])
        pb = np.stack([self._pgo_meta[sb][3] for (_, sb, _) in loops])
        try:
            return pcm_filter(rels, pa, pb, thres=self.sys.pcm_thres)
        except Exception:
            return np.ones(len(loops), bool)

    # ------------------------------------------------------------------
    # outputs
    # ------------------------------------------------------------------

    def pgo_odometry(self) -> Optional[Odometry]:
        """PGO-corrected realtime pose: last optimized pose extrapolated
        by ego-motion since (reference getPredictedOdoms)."""
        if self.odometry is None:
            return None
        slot = self._last_kf_of.get(self.drone_id)
        if slot is None or self._pgo_poses is None or not self.pgo_solve_count:
            return self.odometry
        _, _, stamp, ego_at = self._pgo_meta[slot]
        opt = self._pgo_poses[slot]
        rel = np_lie.pose_compose(np_lie.pose_inverse(ego_at),
                                  np.asarray(self.odometry.pose, np.float64))
        return Odometry(self.odometry.stamp,
                        np_lie.pose_compose(opt, rel), self.odometry.vel)

    def trajectory(self, drone_id: Optional[int] = None,
                   optimized: bool = True):
        """(stamps, poses[7]) of a drone's keyframes from the pose
        graph (optimized) or raw ego poses."""
        did = self.drone_id if drone_id is None else drone_id
        stamps, poses = [], []
        for slot, (d, _, t, ego) in enumerate(self._pgo_meta):
            if d != did:
                continue
            stamps.append(t)
            if optimized and self._pgo_poses is not None \
                    and self.pgo_solve_count:
                poses.append(self._pgo_poses[slot].copy())
            else:
                poses.append(ego.copy())
        return np.asarray(stamps), np.asarray(poses)
