"""Full pipeline end to end: synthetic EuRoC dataset on disk ->
reader -> image frontend (SuperPoint+LK tracker) -> sliding-window
estimator -> odometry vs ground truth."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d2slam_tpu.config import D2Config
from d2slam_tpu.datasets import EuRoCDataset
from d2slam_tpu.frontend.superpoint import SuperPointConfig, superpoint_init
from d2slam_tpu.frontend.tracker import FeatureTracker, TrackerConfig
from d2slam_tpu.geometry.cameras import PinholeParams
from d2slam_tpu.utils import np_lie
from d2slam_tpu.utils.euroc_writer import write_euroc_dataset
from d2slam_tpu.utils.render import render_blobs
from d2slam_tpu.utils.sim import CircleSim, circle_gt_ramp, default_extrinsics
from d2slam_tpu.vins.estimator import D2Estimator

H, W = 240, 320
FX = FY = 220.0
CX, CY = W / 2, H / 2


def build_dataset(tmp_path, n_frames=10, frame_hz=4.0):
    rng = np.random.default_rng(0)
    n_lm = 140
    ang = rng.uniform(0, 2 * np.pi, n_lm)
    rad = rng.uniform(9.0, 13.0, n_lm)
    lz = rng.uniform(0.5, 3.5, n_lm)
    pts_w = np.stack([rad * np.cos(ang), rad * np.sin(ang), lz], axis=1)
    inten = rng.uniform(0.5, 1.0, n_lm)
    ext = default_extrinsics(baseline=0.2)
    sim = CircleSim(frame_hz=frame_hz)

    imu = sim.imu_samples(-0.3, (n_frames - 1) / frame_hz + 1e-6)
    frames = []
    gts = []
    for k in range(n_frames):
        t = k / frame_hz
        p, v, a, q, _ = circle_gt_ramp(t)
        pose = np.concatenate([p, q])
        gts.append((t, pose))
        imgs = []
        for c in range(2):
            T_cam = np_lie.pose_compose(pose, ext[c])
            imgs.append(
                render_blobs(pts_w, T_cam, FX, FY, CX, CY, H, W,
                             intensities=inten)
            )
        frames.append((t, imgs))
    root = str(tmp_path / "synth_euroc")
    write_euroc_dataset(root, imu, frames, gts)
    return root, ext


def run_pipeline(ds, ext, extract_fn=None, oracle=None):
    cfg = D2Config()
    cfg.estimator.max_sld_win_size = 8
    cfg.estimator.min_solve_frames = 4
    cfg.estimator.max_lm_slots = 128
    cfg.estimator.max_solve_measurements = 512
    cfg.estimator.max_imu_samples = 128
    cfg.estimator.max_solver_iters = 5
    cfg.estimator.focal_length = FX
    est = D2Estimator(cfg, ext)

    cams = [PinholeParams.make(FX, FY, CX, CY, dtype=jnp.float32)] * 2
    sp_cfg = SuperPointConfig(max_keypoints=128, threshold=1e-4)
    sp_params = superpoint_init(jax.random.PRNGKey(0), sp_cfg)
    tracker = FeatureTracker(
        sp_params, sp_cfg, cams,
        TrackerConfig(min_keyframe_parallax=3.0, search_radius=40.0),
        frame_rate=4.0, extract_fn=extract_fn,
    )

    outs = []
    frame_id = 0
    for ev in ds.play():
        if ev[0] == "imu":
            _, t, acc, gyr = ev
            est.input_imu(t, acc, gyr)
        else:
            _, t, imgs = ev
            if oracle is not None:
                oracle.set_pose(ds.gt_pose_at(t))
            ff = tracker.process_stereo(t, frame_id, imgs[0], imgs[1])
            frame_id += 1
            if ff is not None:
                od = est.input_frame(ff)
                if od is not None:
                    outs.append((t, od))
    return est, outs


def trajectory_errors(ds, outs):
    from d2slam_tpu.utils.np_lie import pose_compose, pose_inverse

    t0, od0 = outs[0]
    gt0 = ds.gt_pose_at(t0)
    T_align = pose_compose(gt0.astype(np.float64),
                           pose_inverse(od0.pose.astype(np.float64)))
    errs = []
    for (t, od) in outs:
        gt = ds.gt_pose_at(t)
        p = pose_compose(T_align, od.pose.astype(np.float64))
        errs.append(np.linalg.norm(p[:3] - gt[:3]))
    return errs


@pytest.mark.slow
def test_euroc_pipeline_oracle_features(tmp_path):
    """Dataset replay with an oracle extractor standing in for a
    TRAINED detector: validates the entire pipeline (reader -> tracker
    state machine -> matching/LK -> estimator) with a tight bound."""
    from d2slam_tpu.utils.oracle import OracleExtractor

    root, ext = build_dataset(tmp_path)
    ds = EuRoCDataset(root)
    assert len(ds.frames) == 10 and len(ds.imu) > 1000
    # reconstruct the dataset's landmark cloud (same seed as builder)
    rng = np.random.default_rng(0)
    n_lm = 140
    ang = rng.uniform(0, 2 * np.pi, n_lm)
    rad = rng.uniform(9.0, 13.0, n_lm)
    lz = rng.uniform(0.5, 3.5, n_lm)
    pts_w = np.stack([rad * np.cos(ang), rad * np.sin(ang), lz], axis=1)
    oracle = OracleExtractor(
        pts_w, ext, FX, FY, CX, CY, (H, W), pix_noise=0.3
    )
    est, outs = run_pipeline(ds, ext, extract_fn=oracle, oracle=oracle)
    assert est.initialized and est.solve_count >= 3
    errs = trajectory_errors(ds, outs)
    assert np.max(errs) < 0.1, f"trajectory errors {errs}"


@pytest.mark.slow
def test_euroc_pipeline_random_weights_smoke(tmp_path):
    """Same replay with the UNTRAINED SuperPoint: its peaks are
    repeatable but not 3D-consistent (~12 px from true corners), so this
    only asserts the pipeline stays finite and bounded — real weights
    are required for accuracy (zero-egress environment)."""
    root, ext = build_dataset(tmp_path)
    ds = EuRoCDataset(root)
    est, outs = run_pipeline(ds, ext)
    assert est.initialized and est.solve_count >= 3
    errs = trajectory_errors(ds, outs)
    assert np.isfinite(errs).all()
    assert np.max(errs) < 5.0, f"trajectory errors {errs}"
