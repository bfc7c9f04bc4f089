"""Golden IMAGE-LEVEL quadcam VIO with the trained SuperPoint: real
pixels on all 4 outward-facing views -> per-view detection, cross-view
ring association, estimator (round-3 verdict item 8: the quadcam golden
was feature-level only; the trained frontend had never driven the
FOURCORNER path)."""
import os

import numpy as np
import pytest

WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "weights",
                       "superpoint_synth.npz")

# observed 0.151 m at pin time (16 frames, trained SuperPoint, no
# stereo baseline on the outward ring -> depth only from motion; the
# feature-level quadcam golden (0.034 m) stays the estimation contract)
GOLDEN_QUADCAM_IMAGE_ATE = 0.25


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(WEIGHTS),
                    reason="trained weights not present")
def test_golden_quadcam_image_level():
    from d2slam_tpu.config import D2Config
    from d2slam_tpu.frontend.superpoint import SuperPointConfig
    from d2slam_tpu.frontend.tracker import FeatureTracker, TrackerConfig
    from d2slam_tpu.frontend.train_frontend import load_weights
    from d2slam_tpu.geometry.cameras import PinholeParams
    from d2slam_tpu.utils import np_lie
    from d2slam_tpu.utils.render import make_signatures, render_blobs
    from d2slam_tpu.utils.sim import CircleSim, quadcam_extrinsics
    from d2slam_tpu.vins.estimator import D2Estimator

    H, W = 240, 320
    FX = FY = 220.0
    CX, CY = W / 2, H / 2

    sp_params = load_weights(WEIGHTS)
    sp_cfg = SuperPointConfig(max_keypoints=150, threshold=0.010,
                              nms_radius=4)
    ext = quadcam_extrinsics()
    sim = CircleSim(seed=7, n_landmarks=220, extrinsics=ext,
                    fov_cos=0.5)
    inten = sim.rng.uniform(0.5, 1.0, len(sim.lms))
    sigs = make_signatures(len(sim.lms), seed=9)

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
        frame_rate=sim.frame_hz, extrinsics=ext,
    )
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
        imgs = [
            render_blobs(sim.lms, np_lie.pose_compose(pose_gt, ext[c]),
                         FX, FY, CX, CY, H, W, intensities=inten,
                         signatures=sigs)
            for c in range(4)
        ]
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
    print(f"quadcam image-level ATE {rmse:.3f} m over {n_kf} kf")
    assert rmse < GOLDEN_QUADCAM_IMAGE_ATE, \
        f"quadcam image-level VIO regressed: ATE {rmse:.3f} m"
