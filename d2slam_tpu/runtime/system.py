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
    pgo_max_poses: int = 256             # initial capacity (GROWS: the
    pgo_max_edges: int = 1024            # table doubles when full, up to
    pgo_hard_max_poses: int = 32768      # this absolute ceiling)
    # skip PGO keyframes closer than this to the drone's previous one
    # (graph-density gate for hovering/slow missions; 0 = keep all)
    pgo_min_kf_dist: float = 0.0
    # ignore loop edges with implausibly large relative translation
    # (reference loop_distance_threshold gate, d2pgo.cpp:46-52)
    loop_distance_threshold: float = 100.0
    pgo_pose_dof: int = 6                # PGO_POSE_DOF {4, 6}
    pgo_iters: int = 10
    # dense | pcg | auto: auto picks the matrix-free PCG solver once the
    # pose budget outgrows the dense-Jacobian path (pgo/pcg.py)
    pgo_solver: str = "auto"
    # run PGO updates on a background worker thread (the reference runs
    # PGO in its own process, d2pgo_node solverTimerCallback — PGO is a
    # background correction, never on the keyframe latency path). The
    # optimized poses land when the solve finishes; explicit
    # solve_pgo() calls remain synchronous.
    pgo_async: bool = False
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
    # ship the PNG-compressed camera view(s) with every keyframe
    # (reference send_img -> VIOKF_IMG_ARRAY; debug/visualization)
    send_img: bool = False
    # reference ESTIMATION_MODE (d2basetypes.h): "single" solves only
    # our own window; "distributed" is DISTRIBUTED_CAMERA_CONSENUS —
    # remote keyframes join our window (addFrameRemote) and every solve
    # runs consensus-ADMM sub-steps with the peers, shared poses
    # matched by frame id on the wire
    estimation_mode: str = "single"
    max_drones: int = 3
    consensus_timeout_ms: int = 100
    # ingest remote frames before a map alignment exists (true when the
    # swarm is launched with a shared world frame, e.g. common takeoff
    # calibration; otherwise frames wait for the first inter-drone loop)
    assume_common_world: bool = False
    # transport-based distributed PGO: ARock rounds over CH_PGO_DATA
    # (reference ARockPGO -> d2comm -> PGO_Sync_Data). When on,
    # solve_pgo runs the distributed path instead of the local solver.
    enable_dpgo: bool = False
    dpgo_rho_T: float = 0.1              # pgo_rho_frame_T
    dpgo_rho_theta: float = 2.0          # pgo_rho_frame_theta
    dpgo_eta_k: float = 0.9              # pgo_eta_k
    dpgo_iters: int = 6
    broadcast_loops: bool = True         # share loops on SWARM_LOOP_CONN
    # nearby-drone gate for lazy-mode full-frame escalation (reference
    # getNearbyDronesbyPGOData, d2estimator.cpp:931-976)
    nearby_distance: float = 5.0
    nearby_max_age: float = 10.0
    # device placement: run glue ops (LK, matching, lifts, pose
    # bookkeeping) on the LOCAL CPU backend and reserve the
    # accelerator for the heavy kernels with packed transfers — each
    # host<->device crossing on a remote/tunneled TPU costs tens of ms
    # (see utils/placement.py). No-op on CPU-only hosts.
    host_glue_on_cpu: bool = True
    # learned matcher (reference enable_superglue_local/remote,
    # "EXTREME SLOW but more robust"): route the tracker's local
    # matching and/or the loop detector's matching through SuperGlue.
    # Weights come from the ``superglue_params`` constructor arg
    # (random-init if enabled without weights — smoke/perf only).
    enable_superglue_local: bool = False
    enable_superglue_remote: bool = False
    superglue_img_hw: tuple = (480, 640)
    # trained frontend weights (npz from examples/train_frontend.py or
    # converted reference checkpoints): SuperPoint weights replace the
    # sp_params constructor arg; NetVLAD weights replace the weight-free
    # downsample global descriptor with the learned embedding
    # (reference: superpoint_model_path / netvlad_model_path YAML keys)
    superpoint_weights: str = ""
    netvlad_weights: str = ""
    # trained compact SuperGlue (examples/train_frontend.py --sg-steps);
    # without it, enabling SuperGlue warns and runs random-init
    superglue_weights: str = ""


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
        matcher_fn=None,
        loop_matcher_fn=None,
        superglue_params=None,
        superglue_cfg=None,
    ):
        self.cfg = cfg
        self.sys = sys_cfg
        if sys_cfg.host_glue_on_cpu:
            from d2slam_tpu.utils.placement import default_to_cpu

            default_to_cpu()  # glue local; accelerator use is explicit
        self.ext = np.asarray(extrinsics, np.float64)
        self.drone_id = sys_cfg.drone_id
        # the world frame our poses live in; starts as our own drone id
        # and merges toward the lowest id in the swarm (reference
        # D2State reference_frame_id + moveAllPoses map merge,
        # d2estimator.cpp:274-281)
        self.ref_frame_id = (
            0 if sys_cfg.assume_common_world else self.drone_id
        )

        if sp_cfg is None:
            from d2slam_tpu.frontend.superpoint import SuperPointConfig

            sp_cfg = SuperPointConfig(max_keypoints=200, threshold=1e-4)

        # trained weights from config (examples/train_frontend.py npz)
        if sys_cfg.superpoint_weights and sp_params is None:
            from d2slam_tpu.frontend.train_frontend import load_weights

            sp_params = load_weights(sys_cfg.superpoint_weights)
        aux_img_fn, aux_params = None, None
        if sys_cfg.netvlad_weights and gdesc_fn is None:
            import jax as _jax

            from d2slam_tpu.frontend.netvlad import (
                netvlad_apply,
                netvlad_cfg_from_params,
                netvlad_output_dim,
            )
            from d2slam_tpu.frontend.train_frontend import load_weights
            from d2slam_tpu.utils.placement import PackedAccelFn

            nv_params = load_weights(sys_cfg.netvlad_weights)
            nv_cfg = netvlad_cfg_from_params(nv_params)
            out_dim = netvlad_output_dim(nv_params)
            if out_dim != sys_cfg.gdesc_dim:
                # the descriptor dimensionality is a property of the
                # LOADED network (PCA dims + the gate-calibration
                # component), exactly as the reference reads it from
                # the ONNX model (mobilenetvlad_onnx.h output shape);
                # the wire codec carries the dim per packet, so adopt
                sys_cfg.gdesc_dim = out_dim
                self._nv_gdesc_dim = out_dim

            # FUSED into the tracker's extraction program (one packed
            # device call per frame: images upload once, SuperPoint +
            # NetVLAD both run; round-3 link accounting showed the
            # separate gdesc call re-uploading every image)
            def aux_img_fn(nv_p, imgs_u8):
                return netvlad_apply(
                    nv_p,
                    imgs_u8[:1].astype(_jax.numpy.float32)[..., None]
                    / 255.0, nv_cfg,
                )[0]

            aux_params = nv_params
            # standalone fallback for feature-level inputs (no images
            # through the tracker)
            nv_packed = PackedAccelFn(
                lambda p, img: netvlad_apply(
                    p, img.astype(_jax.numpy.float32)[None, ..., None]
                    / 255.0, nv_cfg,
                )[0],
                device_args=(nv_params,),
            )
            from d2slam_tpu.frontend.tracker import _img_u8

            gdesc_fn = lambda img: np.asarray(  # noqa: E731
                nv_packed(_img_u8(img)), np.float32
            )

        # config-driven SuperGlue matchers (reference
        # enable_superglue_local/remote; explicit matcher_fn args win)
        if sys_cfg.enable_superglue_local or sys_cfg.enable_superglue_remote:
            from d2slam_tpu.frontend.superglue import (
                SuperGlueConfig,
                make_loop_matcher,
                make_tracker_matcher,
                superglue_init,
            )

            if superglue_params is None and sys_cfg.superglue_weights:
                from d2slam_tpu.frontend.train_frontend import load_weights

                superglue_params = load_weights(sys_cfg.superglue_weights)
                if superglue_cfg is None:
                    # compact in-container recipe (train_superglue)
                    superglue_cfg = SuperGlueConfig(
                        num_layers=3, num_heads=4, sinkhorn_iters=20
                    )
            if superglue_cfg is None:
                superglue_cfg = SuperGlueConfig()
            if superglue_params is None:
                import warnings

                import jax as _jax

                warnings.warn(
                    "enable_superglue_local/remote is set but no "
                    "trained weights were given (superglue_params / "
                    "superglue_weights): running RANDOM-INIT SuperGlue "
                    "— matching quality will be WORSE than the default "
                    "kNN matcher; train with examples/train_frontend.py "
                    "--sg-steps or unset the flag"
                )
                superglue_params = superglue_init(
                    _jax.random.PRNGKey(0), superglue_cfg
                )
            if sys_cfg.enable_superglue_local and matcher_fn is None:
                matcher_fn = make_tracker_matcher(
                    superglue_params, tuple(sys_cfg.superglue_img_hw),
                    superglue_cfg,
                )
            if sys_cfg.enable_superglue_remote and loop_matcher_fn is None:
                loop_matcher_fn = make_loop_matcher(
                    superglue_params, superglue_cfg
                )
        self.tracker = FeatureTracker(
            sp_params, sp_cfg, cameras,
            tracker_cfg or TrackerConfig(), frame_rate=frame_rate,
            extract_fn=extract_fn, extrinsics=self.ext,
            matcher_fn=matcher_fn,
            aux_img_fn=aux_img_fn, aux_params=aux_params,
        )
        self.gdesc_fn = gdesc_fn or (
            lambda img: image_embedding_gdesc(img, sys_cfg.gdesc_dim)
        )

        lc = loop_cfg or LoopDetectorConfig(gdesc_dim=sys_cfg.gdesc_dim)
        nv_dim = getattr(self, "_nv_gdesc_dim", None)
        if nv_dim is not None and lc.gdesc_dim != nv_dim:
            # loaded NetVLAD weights define the true descriptor dim
            lc = dataclasses.replace(lc, gdesc_dim=nv_dim)
        # latest wire-reported position per REMOTE landmark: keeps loop
        # verification against remote keyframes supplied with fresh 3D
        # even when the entry predates the landmark's triangulation
        self._remote_lm_pos: Dict[Tuple[int, int], np.ndarray] = {}

        def lm_pos_fn(drone_id: int, lm_ids) -> np.ndarray:
            out = np.full((len(lm_ids), 3), np.nan)
            if drone_id == self.drone_id:
                db = self.estimator.lmanager.db
                for k, lid in enumerate(lm_ids):
                    lm = db.get(int(lid))
                    if lm is not None and lm.position is not None:
                        out[k] = lm.position
            else:
                for k, lid in enumerate(lm_ids):
                    p = self._remote_lm_pos.get((drone_id, int(lid)))
                    if p is not None:
                        out[k] = p
            return out

        def kf_pose_fn(drone_id: int, frame_id: int):
            # current best estimate of one of OUR keyframes: sliding
            # window first (most recent), then the optimized PGO table.
            # Remote entries return None — their landmark refreshes are
            # in the SENDER's frame, which the stale snapshot pose
            # already matches.
            if drone_id != self.drone_id:
                return None
            est = self.estimator
            for w, fr in enumerate(getattr(est, "frames", [])):
                if fr.frame_id == frame_id and fr.drone_id in (-1,
                                                               drone_id):
                    return np.asarray(est.state.poses[w], np.float64)
            slot = self._pgo_slot.get((drone_id, frame_id))
            if slot is not None and self.pgo_solve_count \
                    and self._pgo_poses is not None:
                with self._pgo_lock:
                    return self._pgo_poses[slot].copy()
            return None

        self.detector = LoopDetector(lc, self.ext,
                                     matcher_fn=loop_matcher_fn,
                                     lm_pos_fn=lm_pos_fn,
                                     kf_pose_fn=kf_pose_fn)
        self.swarm = SwarmManager(self.drone_id, self.detector)

        if sys_cfg.estimation_mode in ("distributed", "server"):
            from d2slam_tpu.vins.solve_all import SolveAllEstimator
            from d2slam_tpu.vins.types import global_frame_id

            cfg.self_id = self.drone_id

            self._lm_key_pin: Dict[int, int] = {}

            def lm_key(d: int, lid: int) -> int:
                orig = (lid if d == self.drone_id
                        else global_frame_id(d, lid))
                # key STABILITY: once a landmark's key is decided, the
                # decision is PINNED — re-testing live db membership
                # (the round-4 design) flips once the landmark is
                # marginalized out, re-keying the same track mid-
                # mission and splitting its observations across two
                # inconsistent tracks (measured 0.77 m server-mode
                # error when a swarm merge lands mid-stream)
                pinned = self._lm_key_pin.get(orig)
                if pinned is not None:
                    return pinned
                od, oid = self.swarm.unified_id(d, lid)
                # collapse to OUR raw id when unified with a local
                # landmark so own + remote observations fuse in the
                # pool (reference trackRemote landmark-ID unification)
                uni = (oid if od == self.drone_id
                       else global_frame_id(od, oid))
                # established pre-merge tracks keep their anchor key;
                # landmarks first seen AFTER the merge fuse unified
                key = (orig if uni != orig
                       and orig in self.estimator.lmanager.db else uni)
                self._lm_key_pin[orig] = key
                return key

            # "server" = the reference's ESTIMATION_MODE SERVER
            # (d2basetypes.h:38-44): a ground station estimating every
            # drone from codec-v2 packets alone, no local sensors —
            # the same pooled estimator fed only remote frames
            self.estimator = SolveAllEstimator(
                cfg, self.ext, max_drones=sys_cfg.max_drones,
                server_mode=(sys_cfg.estimation_mode == "server"),
                lm_id_map=lm_key,
            )
        elif sys_cfg.estimation_mode == "single":
            self.estimator = D2Estimator(cfg, self.ext)
        else:
            raise ValueError(
                f"unknown estimation_mode {sys_cfg.estimation_mode!r} "
                "(expected single | distributed | server)"
            )

        self.loopnet = None
        self.dpgo = None
        self._last_bcast_t: float = 0.0
        if transport is not None:
            from d2slam_tpu.comm.consensus_transport import TransportConsensus
            from d2slam_tpu.comm.loopnet import CH_KF_REQUEST, LoopNet
            from d2slam_tpu.comm.transport import (
                CH_DISTRIB_VINS,
                CH_PGO_DATA,
                CH_SWARM_LOOP,
                CH_VIOKF_HEADER,
                CH_VIOKF_LANDMARKS,
                ChannelRouter,
            )

            from d2slam_tpu.comm.transport import CH_VIOKF_IMG

            router = ChannelRouter(transport)
            self.loopnet = LoopNet(
                router.route(
                    {CH_VIOKF_HEADER, CH_VIOKF_LANDMARKS, CH_KF_REQUEST,
                     CH_SWARM_LOOP, CH_VIOKF_IMG}
                ),
                self.drone_id, lazy=sys_cfg.lazy_broadcast,
                send_img=sys_cfg.send_img,
            )
            self.loopnet.on_keyframe = self._on_remote_keyframe
            self.loopnet.on_loop_edge = self._on_loop_edge_msg
            # whole-image attachments from send_img peers, kept in a
            # small ring for debug/visualization (the reference shows
            # them in its spy/rviz tools; nothing in the estimation
            # path depends on them)
            self.remote_images: Dict[Tuple[int, int, int], np.ndarray] = {}
            self._remote_img_order: List[Tuple[int, int, int]] = []

            def _on_image(dec):
                did, fid, view, _n, im = dec
                key = (did, fid, view)
                if key not in self.remote_images:
                    self._remote_img_order.append(key)
                    if len(self._remote_img_order) > 64:
                        self.remote_images.pop(
                            self._remote_img_order.pop(0), None)
                self.remote_images[key] = im

            self.loopnet.on_image = _on_image
            # lazy-mode pull gate: request the full frame when the
            # header's global descriptor hits our retrieval DB
            # (reference matched-frame exchange: onImgDescHeaderRecevied
            # -> getMatchedPrevKeyframe NetVLAD gate)
            self.loopnet.want_full = lambda pkt: (
                self.detector.query_score(pkt.gdesc)
                > self.detector.effective_netvlad_thres()
            )
            if sys_cfg.enable_dpgo:
                from d2slam_tpu.pgo.dpgo_transport import (
                    DPGOTransportConfig,
                    TransportDPGO,
                )

                self.dpgo = TransportDPGO(
                    router.route({CH_PGO_DATA}), self.drone_id,
                    DPGOTransportConfig(
                        max_poses=sys_cfg.pgo_max_poses,
                        max_edges=sys_cfg.pgo_max_edges,
                        max_anchors=sys_cfg.pgo_max_poses,
                        rho_T=sys_cfg.dpgo_rho_T,
                        rho_theta=sys_cfg.dpgo_rho_theta,
                        eta_k=sys_cfg.dpgo_eta_k,
                        iters_per_step=sys_cfg.dpgo_iters,
                    ),
                    ref_frame_id=self.ref_frame_id,
                )
            if sys_cfg.estimation_mode == "distributed":
                self.estimator.attach_consensus(
                    TransportConsensus(
                        router.route({CH_DISTRIB_VINS}), self.drone_id,
                        ref_frame_id=self.ref_frame_id,
                    ),
                    expected_peers=sys_cfg.max_drones - 1,
                    timeout_ms=sys_cfg.consensus_timeout_ms,
                )

        # ---- PGO graph bookkeeping (host side) ----
        # (drone_id, frame_id) -> pose slot
        self._pgo_slot: Dict[Tuple[int, int], int] = {}
        # per slot: drone_id, frame_id, stamp, ego pose at insertion
        self._pgo_meta: List[Tuple[int, int, float, np.ndarray]] = []
        self._last_kf_of: Dict[int, int] = {}  # drone -> last slot
        self._ego_edges: List[Tuple[int, int, np.ndarray, float]] = []
        self.loop_edges: List[LoopEdge] = []
        self._loop_keys: set = set()          # dedup (a, b) loop pairs
        self._dpgo_ego_synced = 0             # ego edges pushed to dpgo
        self._dpgo_loops_added: set = set()   # loop pairs pushed to dpgo
        self._pgo_poses: Optional[np.ndarray] = None  # optimized [N, 7]
        self._pgo_capacity = sys_cfg.pgo_max_poses
        self._pgo_edge_capacity = sys_cfg.pgo_max_edges
        self._pgo_solver = None
        self._kf_since_pgo = 0
        self.pgo_solve_count = 0
        self._frame_id = 0
        # guards the PGO tables against the async solve worker: the
        # mutex protects snapshot/write-back; the epoch invalidates a
        # solve whose input poses were rewritten (reference-frame merge
        # or first-alignment re-seed) while it was in flight
        import threading as _threading
        self._pgo_lock = _threading.RLock()
        self._pgo_solve_lock = _threading.Lock()
        self._pgo_epoch = 0

        # rolling outputs
        self.odometry: Optional[Odometry] = None
        self.last_loop: Optional[LoopEdge] = None
        self.last_pgo_report = None
        self._aligned_drones: set = set()

    # ------------------------------------------------------------------
    # inputs
    # ------------------------------------------------------------------

    def input_imu(self, t: float, acc, gyr,
                  want_odometry: bool = False) -> Optional[Odometry]:
        """Feed one IMU sample. With ``want_odometry`` the call also
        returns IMU-rate propagated odometry (the reference publishes
        this on every IMU callback; here it is opt-in per call so the
        400 Hz feed does not pay a device launch per sample)."""
        self.estimator.input_imu(t, acc, gyr)
        if want_odometry:
            return self.estimator.predict_odometry(t)
        return None

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
            self._register_keyframe(ff, od, [img_left, img_right])
        return od

    def input_quadcam(self, t: float, imgs: List[np.ndarray]
                      ) -> Optional[Odometry]:
        """Process one 4-view (FOURCORNER_FISHEYE) frame. ``imgs`` are
        the undistorted virtual-pinhole views (run raw fisheyes through
        depth.fisheye_undist first, as the reference's FisheyeUndist
        does before tracking)."""
        ff = self.tracker.process_quadcam(t, self._frame_id, imgs)
        self._frame_id += 1
        if ff is None:
            return None
        od = self.estimator.input_frame(ff)
        if od is not None:
            self.odometry = od
            self._register_keyframe(ff, od, list(imgs))
        return od

    def input_rgbd(self, t: float, img: np.ndarray, depth: np.ndarray
                   ) -> Optional[Odometry]:
        """Process one mono image + aligned metric depth image (the
        reference's PINHOLE_DEPTH camera configuration, e.g. RealSense
        D435). Keypoints inside the accepted depth range carry a
        measured depth the estimator turns into depth residuals."""
        ff = self.tracker.process_rgbd(t, self._frame_id, img, depth)
        self._frame_id += 1
        if ff is None:
            return None
        od = self.estimator.input_frame(ff)
        if od is not None:
            self.odometry = od
            self._register_keyframe(ff, od, img)
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

    def solve_server(self) -> Dict[int, Odometry]:
        """SERVER-mode solve cadence: jointly optimize every ingested
        drone's window from packets alone and return each drone's
        latest fused odometry (reference SERVER solve path,
        d2estimator.cpp:700-736 setupImuFactors over remote windows;
        the reference triggers it from the solver timer). Call this
        periodically after ``poll_network``."""
        if self.sys.estimation_mode != "server":
            raise RuntimeError("solve_server needs estimation_mode=server")
        self.estimator.solve_remote_only()
        out: Dict[int, Odometry] = {}
        for d in self.estimator.drone_ids():
            od = self.estimator.drone_odometry(d)
            if od is not None:
                out[d] = od
        return out

    # ------------------------------------------------------------------
    # keyframe fan-out: loop detection, PGO graph, broadcast
    # ------------------------------------------------------------------

    def _register_keyframe(self, ff: FrontendFrame, od: Odometry,
                           img,  # one view, list of views, or None
                           gdesc: Optional[np.ndarray] = None,
                           entry: Optional[KeyframeEntry] = None) -> None:
        pose = np.asarray(od.pose, np.float64)
        self._add_pgo_node(self.drone_id, ff.frame_id, ff.stamp, pose)

        if gdesc is None:
            if getattr(self.tracker, "last_aux", None) is not None:
                # computed inside the tracker's fused extraction call
                # (one device round trip for SuperPoint + NetVLAD)
                gdesc = self.tracker.last_aux
            else:
                g_img = img[0] if isinstance(img, list) else img
                gdesc = (self.gdesc_fn(g_img) if g_img is not None
                         else np.zeros(self.sys.gdesc_dim, np.float32))
        gdesc = np.asarray(gdesc, np.float32)

        if self.sys.enable_loop_detection:
            if entry is None:
                entry = self._make_entry(ff, pose)
            else:
                # refresh caller-provided entries with the post-solve
                # pose and current landmark estimates (ids from the
                # entry when it carries them, else cam0 order)
                if len(entry.lm_ids) == len(entry.kpt_valid):
                    ids = [int(i) for i in entry.lm_ids]
                else:
                    obs0 = next(
                        (o for o in ff.observations if o.cam_id == 0), None
                    )
                    ids = ([int(i) for i in obs0.landmark_ids]
                           if obs0 is not None else [])
                entry = entry._replace(
                    pose=pose,
                    lm_positions=self._lm_positions_of(ff, ids),
                )
            if entry is not None:
                edge = self.detector.detect(entry, gdesc)
                self.swarm.add_local_keyframe(entry, gdesc, ff.stamp)
                if edge is not None:
                    self.add_loop_edge(edge)

        if self.loopnet is not None and self.sys.broadcast:
            pkt = self._make_packet(ff, pose, gdesc, entry)
            if pkt is not None:
                # lazy-mode escalation: drones the PGO graph says are
                # near get the full frame so their VIO can fuse it
                # (reference getNearbyDronesbyPGOData +
                # d2vins_node.cpp:177-199 broadcast logic)
                nearby = (self.nearby_drones(ff.stamp)
                          if self.sys.lazy_broadcast else None)
                imgs = None
                if self.sys.send_img and img is not None:
                    imgs = img if isinstance(img, list) else [img]
                self.loopnet.broadcast_keyframe(pkt, nearby_drones=nearby,
                                                images=imgs)

        self._kf_since_pgo += 1
        if (self.sys.enable_pgo
                and self._kf_since_pgo >= self.sys.pgo_every_n_kf
                and len(self._pgo_meta) >= 3):
            if self.sys.pgo_async:
                self._solve_pgo_background()
            else:
                self.solve_pgo()

    def _solve_pgo_background(self) -> None:
        """Kick a PGO update on the worker thread (reference d2pgo_node
        runs PGO in its own process on a timer; it is a background
        correction, not a keyframe-latency cost). If the previous
        update is still running, just reset the cadence counter — the
        running solve already covers most of the graph and the next
        cadence point will pick up the rest."""
        self._kf_since_pgo = 0
        fut = getattr(self, "_pgo_future", None)
        if fut is not None and not fut.done():
            return
        if fut is not None:
            fut.result()  # surface worker exceptions
        import concurrent.futures

        if getattr(self, "_pgo_executor", None) is None:
            self._pgo_executor = (
                concurrent.futures.ThreadPoolExecutor(
                    1, thread_name_prefix="pgo"
                )
            )
        self._pgo_future = self._pgo_executor.submit(self.solve_pgo)

    def wait_pgo(self) -> None:
        """Block until any in-flight background PGO update finishes."""
        fut = getattr(self, "_pgo_future", None)
        if fut is not None:
            fut.result()

    def _make_entry(self, ff: FrontendFrame,
                    pose: np.ndarray) -> Optional[KeyframeEntry]:
        """Build a retrieval-DB entry from ALL views' observations +
        current landmark estimates (the VisualImageDescArray of this
        keyframe; quadcam entries carry the camera index per keypoint
        for multi-direction matching)."""
        desc_of = {}
        for kf in ([self.tracker.last_kf] if self.tracker.last_kf
                   else list(self.tracker.last_kf_mv.values())):
            if kf and "desc" in kf:
                for lid, d, v in zip(kf["ids"], kf["desc"], kf["valid"]):
                    if v and lid >= 0:
                        desc_of.setdefault(int(lid), d)
        ids, cams, rays = [], [], []
        for o in ff.observations:
            ids.extend(int(i) for i in o.landmark_ids)
            cams.extend([o.cam_id] * len(o.landmark_ids))
            rays.extend(np.asarray(o.rays, np.float64))
        if not ids:
            return None
        D = self.detector.cfg.desc_dim
        desc = np.stack([
            desc_of.get(lid, np.zeros(D, np.float32)) for lid in ids
        ])
        lm_pos = self._lm_positions_of(ff, ids)
        return KeyframeEntry(
            frame_id=ff.frame_id, drone_id=self.drone_id, stamp=ff.stamp,
            pose=pose, kpt_rays=np.asarray(rays).reshape(-1, 3),
            kpt_cam=np.asarray(cams, np.int32), kpt_desc=desc,
            kpt_valid=np.ones(len(ids), bool), lm_positions=lm_pos,
            lm_ids=np.asarray(ids, np.int64),
        )

    def _lm_positions_of(self, ff: FrontendFrame, ids=None) -> np.ndarray:
        """World positions of this frame's landmarks from the estimator
        DB (nan where not yet estimated). ``ids`` defaults to every
        view's landmark ids in observation order."""
        if ids is None:
            ids = [int(i) for o in ff.observations for i in o.landmark_ids]
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
        est = self.estimator
        n_obs = sum(len(o.landmark_ids) for o in ff.observations)
        if len(entry.lm_ids) == len(entry.kpt_valid) == n_obs:
            # entry built from all views (quadcam/_make_entry path)
            lm_ids = np.asarray(entry.lm_ids, np.int64)
            lm_cam = np.asarray(entry.kpt_cam, np.uint8)
            lm_rays = np.asarray(entry.kpt_rays, np.float32)
            lm_desc = entry.kpt_desc.astype(np.float32)
            vels = np.concatenate([
                np.asarray(o.ray_vels, np.float32).reshape(-1, 3)
                for o in ff.observations
            ]) if ff.observations else np.zeros((0, 3), np.float32)
        else:
            # caller-provided cam0 entry (oracle-frontend tests)
            obs0 = next((o for o in ff.observations if o.cam_id == 0), None)
            if obs0 is None:
                return None
            lm_ids = np.asarray(obs0.landmark_ids, np.int64)
            lm_cam = np.zeros(len(lm_ids), np.uint8)
            lm_rays = np.asarray(obs0.rays, np.float32)
            lm_desc = entry.kpt_desc.astype(np.float32)
            vels = np.asarray(obs0.ray_vels, np.float32)
        # v2 state block (reference VisualImageDescArray imu_buf + Ba/Bg
        # + sld_win_status): peers in DISTRIBUTED/SOLVE_ALL modes ingest
        # this frame into their own windows
        imu_t, imu_acc, imu_gyr = est.imubuf.samples_between(
            self._last_bcast_t, ff.stamp + 1e-9
        )
        self._last_bcast_t = ff.stamp
        od = self.odometry
        w = est._last_self_slot()
        sb = np.asarray(est.state.sb[w], np.float64)
        win = np.asarray(
            [f.frame_id for f in est.frames if f.drone_id < 0], np.int64
        )
        return RemoteKeyframePacket(
            drone_id=self.drone_id, frame_id=ff.frame_id, stamp=ff.stamp,
            is_keyframe=True, pose=pose.astype(np.float32),
            gdesc=gdesc,
            # landmark 3D in OUR world (reference LandmarkPerFrame
            # pt3d): receivers verify loops by PnP against our geometry
            lm_pos3d=self._lm_positions_of(
                ff, [int(i) for i in lm_ids]).astype(np.float32),
            lm_ids=lm_ids,
            lm_cam=lm_cam,
            lm_rays=lm_rays,
            lm_vels=vels,
            lm_desc=lm_desc,
            ba=sb[3:6].astype(np.float32), bg=sb[6:9].astype(np.float32),
            vel=(od.vel if od is not None else sb[:3]).astype(np.float32),
            imu_t=imu_t, imu_acc=imu_acc.astype(np.float32),
            imu_gyr=imu_gyr.astype(np.float32),
            sld_win=win,
            ref_frame_id=self.ref_frame_id,
        )

    def _on_remote_keyframe(self, pkt: RemoteKeyframePacket) -> None:
        if len(pkt.lm_pos3d) == len(pkt.lm_ids):
            fin = np.isfinite(pkt.lm_pos3d).all(axis=1)
            for lid, p in zip(np.asarray(pkt.lm_ids)[fin],
                              np.asarray(pkt.lm_pos3d, np.float64)[fin]):
                self._remote_lm_pos[(pkt.drone_id, int(lid))] = p
        edge = self.swarm.on_remote_keyframe(pkt)
        # map merge toward the lower reference frame (reference
        # addFrameRemote, d2estimator.cpp:274-281: P_w_ki yaw-only,
        # moveAllPoses, adopt the remote reference_frame_id)
        a = self.swarm.alignments.get(pkt.drone_id)
        if a is not None and pkt.ref_frame_id < self.ref_frame_id:
            self._merge_reference_frame(
                pkt.ref_frame_id, np_lie.pose_inverse(a.transform)
            )
            a = self.swarm.alignments.get(pkt.drone_id)
        if (self.sys.estimation_mode in ("distributed", "server")
                and len(pkt.lm_ids)
                and pkt.ref_frame_id == self.ref_frame_id):
            # same reference frame -> wire poses are already in our
            # world (reference addFrameRemote uses pose_drone directly
            # when reference_frame_id matches)
            self.estimator.input_remote_frame(pkt)
        # remote keyframes extend the pose graph in the remote drone's
        # ego frame, aligned once a map alignment exists (packets in OUR
        # reference frame need no alignment)
        pose = pkt.pose.astype(np.float64)
        aligned = (
            pose.copy() if pkt.ref_frame_id == self.ref_frame_id
            else self.swarm.transform_remote_pose(pkt.drone_id, pose)
        )
        self._add_pgo_node(pkt.drone_id, pkt.frame_id, pkt.stamp,
                           pose, init_pose=aligned)
        if edge is not None:
            self.add_loop_edge(edge)
        # first alignment for this drone: re-seed its existing graph
        # nodes into our world frame (reference map merge moveAllPoses)
        a = self.swarm.alignments.get(pkt.drone_id)
        if a is not None and pkt.drone_id not in self._aligned_drones:
            self._aligned_drones.add(pkt.drone_id)
            with self._pgo_lock:
                self._pgo_epoch += 1
                for slot, (d, _, _, ego) in enumerate(self._pgo_meta):
                    if d == pkt.drone_id:
                        self._pgo_poses[slot] = np_lie.pose_compose(
                            a.transform, ego
                        )

    def _merge_reference_frame(self, new_ref: int, T: np.ndarray) -> None:
        """Shift this robot's whole world by the (yaw-only) transform
        ``T`` and adopt reference frame ``new_ref`` (reference
        moveAllPoses on map merge, d2estimator.cpp:274-281 +
        d2state.hpp). Everything expressed in our old world moves:
        estimator window + prior + landmarks, pose-graph nodes and our
        stored ego poses, retrieval-DB entries, alignments, odometry."""
        self.estimator.move_all_poses(T)
        self.ref_frame_id = new_ref
        cons = getattr(self.estimator, "_consensus", None)
        if cons is not None:
            cons.ref_frame_id = new_ref
            self.estimator._consensus_tilde.clear()

        with self._pgo_lock:
            self._pgo_epoch += 1
            for slot, (d, fid, stamp, ego) in enumerate(self._pgo_meta):
                if self._pgo_poses is not None:
                    self._pgo_poses[slot] = np_lie.pose_compose(
                        T, self._pgo_poses[slot]
                    )
                if d == self.drone_id:
                    self._pgo_meta[slot] = (
                        d, fid, stamp, np_lie.pose_compose(T, ego)
                    )
        self.detector.entries = [
            e._replace(
                pose=np_lie.pose_compose(T, e.pose),
                lm_positions=np.asarray(
                    [np_lie.pose_apply(T, p) if np.isfinite(p).all() else p
                     for p in e.lm_positions]
                ).reshape(-1, 3),
            ) if e.drone_id == self.drone_id else e
            for e in self.detector.entries
        ]
        for did, al in list(self.swarm.alignments.items()):
            self.swarm.alignments[did] = al._replace(
                transform=np_lie.pose_compose(T, al.transform)
            )
        if self.dpgo is not None:
            for slot in range(len(self.dpgo.keys)):
                self.dpgo.poses[slot] = np_lie.pose_compose(
                    T, self.dpgo.poses[slot]
                )
            self.dpgo.ref_frame_id = new_ref
            self.dpgo.dual_local.clear()
            self.dpgo.dual_remote.clear()
        if self.odometry is not None:
            self.odometry = self.estimator.latest_odometry()

    # ------------------------------------------------------------------
    # pose-graph backend (the d2pgo_node role)
    # ------------------------------------------------------------------

    def _grow_pgo_table(self) -> bool:
        """Double pose/edge capacity (up to ``pgo_hard_max_poses``) so
        long missions keep extending the graph — the reference's Ceres
        graph is unbounded (d2pgo.cpp:15-44 addFrame). One solver
        recompile per doubling; past ``pgo_pcg_threshold`` the "auto"
        solver routes to the matrix-free PCG path."""
        new_cap = min(self._pgo_capacity * 2, self.sys.pgo_hard_max_poses)
        if new_cap <= self._pgo_capacity:
            return False
        poses = np.zeros((new_cap, 7))
        poses[:, 6] = 1.0
        if self._pgo_poses is not None:
            poses[: self._pgo_capacity] = self._pgo_poses
        self._pgo_poses = poses
        self._pgo_capacity = new_cap
        self._pgo_edge_capacity = min(
            self._pgo_edge_capacity * 2, self.sys.pgo_hard_max_poses * 8
        )
        self._pgo_solver = None  # recompile at the new layout
        return True

    def _add_pgo_node(self, drone_id: int, frame_id: int, stamp: float,
                      ego_pose: np.ndarray,
                      init_pose: Optional[np.ndarray] = None) -> None:
        key = (drone_id, frame_id)
        if key in self._pgo_slot:
            return
        # optional density gate (reference keyframes are already sparse;
        # this bounds graph growth on slow/hovering missions)
        if self.sys.pgo_min_kf_dist > 0:
            prev = self._last_kf_of.get(drone_id)
            if prev is not None:
                pa = self._pgo_meta[prev][3]
                if (np.linalg.norm(np.asarray(ego_pose[:3]) - pa[:3])
                        < self.sys.pgo_min_kf_dist):
                    return  # next inserted node chains prev->it directly
        if len(self._pgo_meta) >= self._pgo_capacity \
                and not self._grow_pgo_table():
            import warnings

            warnings.warn(
                f"PGO graph at pgo_hard_max_poses="
                f"{self.sys.pgo_hard_max_poses}; dropping keyframe "
                f"({drone_id}, {frame_id})"
            )
            return
        slot = len(self._pgo_meta)
        self._pgo_slot[key] = slot
        self._pgo_meta.append((drone_id, frame_id, stamp,
                               np.asarray(ego_pose, np.float64)))
        if self._pgo_poses is None:
            self._pgo_poses = np.zeros((self._pgo_capacity, 7))
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

    def add_loop_edge(self, edge: LoopEdge, broadcast: bool = True) -> None:
        key = (edge.drone_id_a, edge.frame_id_a,
               edge.drone_id_b, edge.frame_id_b)
        if key in self._loop_keys:
            return
        if (np.linalg.norm(np.asarray(edge.rel_pose[:3]))
                > self.sys.loop_distance_threshold):
            return  # implausible loop (reference d2pgo.cpp:46-52)
        self._loop_keys.add(key)
        self.loop_edges.append(edge)
        self.last_loop = edge
        if broadcast and self.loopnet is not None \
                and self.sys.broadcast_loops:
            # share with the swarm so every robot's PGO has the edge
            # (reference SWARM_LOOP_CONN, loop_net.cpp:10-22)
            self.loopnet.broadcast_loop_edge(
                edge.frame_id_a, edge.frame_id_b, edge.drone_id_a,
                edge.drone_id_b, edge.rel_pose, edge.pos_cov, edge.yaw_cov,
                edge.inliers,
            )

    def _on_loop_edge_msg(self, dec: tuple) -> None:
        fa, fb, da, db, rel, pc, yc, inl = dec
        self.add_loop_edge(
            LoopEdge(frame_id_a=fa, frame_id_b=fb, drone_id_a=da,
                     drone_id_b=db, rel_pose=rel, pos_cov=pc, yaw_cov=yc,
                     inliers=inl),
            broadcast=False,
        )

    def _loop_slot(self, drone_id: int, frame_id: int) -> Optional[int]:
        return self._pgo_slot.get((drone_id, frame_id))

    def nearby_drones(self, now: float) -> set:
        """Drones within near-field range per the PGO-fused positions
        (reference getNearbyDronesbyPGOData, d2estimator.cpp:931-976 —
        the PGO->VIO feedback that gates lazy-broadcast escalation)."""
        from d2slam_tpu.comm.loopnet import nearby_drones_from_pgo

        if self.odometry is None or self._pgo_poses is None:
            return set()
        positions = {}
        for d, slot in self._last_kf_of.items():
            if d == self.drone_id:
                continue
            positions[d] = (self._pgo_poses[slot][:3],
                            self._pgo_meta[slot][2])
        return nearby_drones_from_pgo(
            np.asarray(self.odometry.pose[:3]), positions, now,
            distance=self.sys.nearby_distance,
            max_age=self.sys.nearby_max_age,
        )

    def _solve_pgo_distributed(self) -> Optional[np.ndarray]:
        """One ARock DPGO round over the transport (reference
        solve_multi -> ARockPGO; d2pgo.cpp:155-328). The local graph is
        synced into the endpoint, a round runs (receive -> anchored
        local solve -> dual update -> broadcast), and the optimized
        poses come back into the node's pose table."""
        from d2slam_tpu.vins.types import global_frame_id as gid

        dp = self.dpgo
        with self._pgo_lock:
            epoch0 = self._pgo_epoch
            n = len(self._pgo_meta)
            for slot, (d, fid, stamp, ego) in enumerate(self._pgo_meta):
                dp.add_frame(gid(d, fid), owner=d,
                             pose=self._pgo_poses[slot])

        def key_of(slot):
            d, fid, _, _ = self._pgo_meta[slot]
            return gid(d, fid)

        for (a, b, r, dist) in self._ego_edges[self._dpgo_ego_synced:]:
            cov_p = max(self.sys.ego_cov_min,
                        self.sys.ego_pos_cov_per_m * dist)
            cov_y = max(self.sys.ego_cov_min,
                        self.sys.ego_yaw_cov_per_m * dist)
            si = np.diag([1 / np.sqrt(cov_p)] * 3 + [1 / np.sqrt(cov_y)] * 3)
            dp.add_edge(key_of(a), key_of(b), r, si)
        self._dpgo_ego_synced = len(self._ego_edges)

        loops = self._usable_loops()
        mask = (self._pcm_mask(loops) if len(loops) > 1
                else np.ones(len(loops), bool))
        for keep, (sa, sb, e) in zip(mask, loops):
            lk = (e.drone_id_a, e.frame_id_a, e.drone_id_b, e.frame_id_b)
            if not keep or lk in self._dpgo_loops_added:
                continue
            si = np.diag([1 / np.sqrt(e.pos_cov)] * 3
                         + [1 / np.sqrt(e.yaw_cov)] * 3)
            if dp.add_edge(key_of(sa), key_of(sb), e.rel_pose, si):
                self._dpgo_loops_added.add(lk)

        now = self._pgo_meta[-1][2] if self._pgo_meta else 0.0
        dp.updated = True  # timer-driven round (reference solver cadence)
        dp.solve(stamp=now)
        with self._pgo_lock:
            if self._pgo_epoch == epoch0:
                for slot in range(n):
                    p = dp.optimized_pose(key_of(slot))
                    if p is not None:
                        self._pgo_poses[slot] = p
            out = self._pgo_poses[:n].copy()
        self.pgo_solve_count += 1
        self.last_pgo_report = dp.last_report
        return out

    def solve_pgo(self) -> Optional[np.ndarray]:
        """One PGO update over the accumulated graph (jitted LM, static
        layout → one compile). Returns optimized poses [N, 7].

        Thread-safe: serialized against the background worker by
        ``_pgo_solve_lock``; the input snapshot is taken under
        ``_pgo_lock`` and the write-back is dropped if a
        reference-frame merge bumped ``_pgo_epoch`` mid-solve."""
        with self._pgo_solve_lock:
            return self._solve_pgo_impl()

    def _solve_pgo_impl(self) -> Optional[np.ndarray]:
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
        if self.dpgo is not None:
            return self._solve_pgo_distributed()
        # grow edge capacity ahead of assembly so no edge is dropped
        needed = len(self._ego_edges) + len(self.loop_edges)
        while needed > self._pgo_edge_capacity \
                and self._pgo_edge_capacity < self.sys.pgo_hard_max_poses * 8:
            self._pgo_edge_capacity = min(
                self._pgo_edge_capacity * 2, self.sys.pgo_hard_max_poses * 8
            )
            self._pgo_solver = None
        layout = PGOLayout(self._pgo_capacity, self._pgo_edge_capacity,
                           self.sys.pgo_pose_dof)

        # ---- assemble edges (ego + PCM-filtered loops) ----
        snap_lock = self._pgo_lock
        snap_lock.acquire()
        epoch0 = self._pgo_epoch
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
        snap_lock.release()
        v = np.zeros(layout.N, bool)
        v[:n] = True
        fixed = np.zeros(layout.N, bool)
        fixed[0] = True  # gauge: first frame (reference main_id first kf)

        if self._pgo_solver is None:
            from d2slam_tpu.utils.placement import PackedAccelFn

            use_pcg = self.sys.pgo_solver == "pcg" or (
                self.sys.pgo_solver == "auto"
                and (layout.N > self.sys.pgo_pcg_threshold
                     or layout.E > 4 * self.sys.pgo_pcg_threshold)
            )
            # PGO rides the accelerator with packed transfers (the
            # dense path is ~300 GFLOP of GEMMs per update — seconds on
            # the host CPU, milliseconds on the chip); plain jit on
            # CPU-only hosts
            if use_pcg:
                self._pgo_solver = PackedAccelFn(
                    lambda s, e, f: solve_pgo_pcg(
                        layout, s, e, f, max_iters=self.sys.pgo_iters,
                        cg_iters=self.sys.pgo_cg_iters,
                    )
                )
            else:
                self._pgo_solver = PackedAccelFn(
                    lambda s, e, f: solve_pgo(layout, s, e, f,
                                              max_iters=self.sys.pgo_iters)
                )
        state = PGOState(poses=np.asarray(poses, np.float32),
                         valid=v)
        edges = PGOEdges(
            i=ei, j=ej,
            rel=np.asarray(rel, np.float32),
            sqrt_info=np.asarray(si, np.float32),
            valid=valid,
        )
        out, report = self._pgo_solver(state, edges, fixed)
        opt = np.asarray(out.poses, np.float64)
        opt[:, 3:] /= np.linalg.norm(opt[:, 3:], axis=1, keepdims=True)
        with self._pgo_lock:
            if self._pgo_epoch == epoch0:
                self._pgo_poses[:n] = opt[:n]
            else:
                # a reference-frame merge rewrote the pose table while
                # this solve was in flight — its result is expressed in
                # the pre-merge world; drop it (next cadence re-solves)
                opt = self._pgo_poses[:n].copy()
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
