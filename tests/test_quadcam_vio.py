"""Quadcam (FOURCORNER_FISHEYE) VIO frontend: 4-view tracking with
cross-view landmark unification (reference d2featuretracker.cpp:121-133
per-view track + LEFT_RIGHT adjacent-pair association), then the full
4-camera sliding-window estimator."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2slam_tpu.config import D2Config
from d2slam_tpu.frontend.superpoint import SuperPointConfig, superpoint_init
from d2slam_tpu.frontend.tracker import FeatureTracker, TrackerConfig
from d2slam_tpu.geometry.cameras import PinholeParams
from d2slam_tpu.utils import np_lie
from d2slam_tpu.utils.render import render_blobs
from d2slam_tpu.utils.sim import CircleSim, circle_gt_ramp, quadcam_extrinsics
from d2slam_tpu.vins.estimator import D2Estimator

H, W = 240, 320
FX = FY = 110.0  # ~110 deg FOV so the 90-deg ring views overlap
CX, CY = W / 2, H / 2


@pytest.mark.slow
def test_quadcam_tracker_on_rendered_sequence():
    rng = np.random.default_rng(0)
    n_lm = 240
    ang = rng.uniform(0, 2 * np.pi, n_lm)
    rad = rng.uniform(9.0, 13.0, n_lm)
    lz = rng.uniform(0.5, 3.5, n_lm)
    pts_w = np.stack([rad * np.cos(ang), rad * np.sin(ang), lz], axis=1)
    inten = rng.uniform(0.5, 1.0, n_lm)

    ext = quadcam_extrinsics()
    cams = [PinholeParams.make(FX, FY, CX, CY, dtype=jnp.float32)
            for _ in range(4)]
    sp_cfg = SuperPointConfig(max_keypoints=128, threshold=1e-4, nms_radius=4)
    sp_params = superpoint_init(jax.random.PRNGKey(0), sp_cfg)
    tracker = FeatureTracker(
        sp_params, sp_cfg, cams,
        TrackerConfig(min_keyframe_parallax=4.0, search_radius=30.0),
        extrinsics=ext,
    )

    frames = []
    for k in range(6):
        t = k * 0.25
        p, v, a, q, _ = circle_gt_ramp(t)
        pose = np.concatenate([p, q])
        imgs = []
        for c in range(4):
            T_cam = np_lie.pose_compose(pose, ext[c])
            imgs.append(
                render_blobs(pts_w, T_cam, FX, FY, CX, CY, H, W,
                             intensities=inten)
            )
        ff = tracker.process_quadcam(t, k, imgs)
        if ff is not None:
            frames.append(ff)

    assert len(frames) >= 3, f"only {len(frames)} keyframes"
    # all four views observe
    assert len(frames[0].observations) == 4
    # cross-view unification: landmark ids shared between adjacent views
    # within one frame (reference LEFT_RIGHT association)
    ff = frames[1]
    ids_by_view = [set(o.landmark_ids.tolist()) for o in ff.observations]
    cross = sum(
        len(ids_by_view[a] & ids_by_view[(a + 1) % 4]) for a in range(4)
    )
    assert cross >= 5, f"only {cross} cross-view landmarks"
    # temporal persistence per view
    common = set(frames[0].observations[0].landmark_ids.tolist()) & \
        set(frames[1].observations[0].landmark_ids.tolist())
    assert len(common) >= 10, f"only {len(common)} persistent tracks"
    # rays are unit norm
    for o in ff.observations:
        np.testing.assert_allclose(
            np.linalg.norm(o.rays, axis=1), 1.0, atol=1e-5
        )


def test_quadcam_estimator_e2e():
    """4-camera sliding-window VIO on oracle quadcam observations —
    the FOURCORNER_FISHEYE robot runs end to end."""
    ext = quadcam_extrinsics()
    cfg = D2Config()
    cfg.num_cams = 4
    cfg.estimator.max_sld_win_size = 6
    cfg.estimator.min_solve_frames = 4
    cfg.estimator.max_lm_slots = 96
    cfg.estimator.max_solve_measurements = 384
    cfg.estimator.max_imu_samples = 128
    cfg.estimator.max_solver_iters = 4
    sim = CircleSim(pix_noise_rad=0.5 / 460.0, seed=1, extrinsics=ext,
                    fov_cos=0.55, max_obs_per_frame=40)
    est = D2Estimator(cfg, ext)

    for (t, a, g) in sim.imu_samples(-0.3, 0.0):
        est.input_imu(t, a, g)
    t_prev = 0.0
    errs = []
    align = None
    for k in range(14):
        t = k / sim.frame_hz
        if k:
            for (ts, a, g) in sim.imu_samples(t_prev + 1e-6, t + 1e-6):
                est.input_imu(ts, a, g)
        t_prev = t
        od = est.input_frame(sim.frame(k))
        if od is None:
            continue
        gt, _ = sim.gt_pose(t)
        if align is None:
            align = np_lie.pose_compose(
                od.pose.astype(np.float64), np_lie.pose_inverse(gt)
            )
        gt_in_est = np_lie.pose_compose(align, gt)
        errs.append(np.linalg.norm(od.pose[:3] - gt_in_est[:3]))

    assert est.solve_count >= 8
    assert np.median(errs) < 0.08, f"quadcam VIO err {np.median(errs):.3f}"
    # observations from all 4 cameras actually entered the solve
    cams_used = {o.cam_id for lm in est.lmanager.db.values()
                 for o in lm.obs}
    assert cams_used == {0, 1, 2, 3}, cams_used
