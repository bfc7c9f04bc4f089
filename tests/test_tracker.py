"""Image-level frontend integration: rendered stereo blob images ->
FeatureTracker -> persistent landmark tracks & stereo associations."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2slam_tpu.frontend.superpoint import SuperPointConfig, superpoint_init
from d2slam_tpu.frontend.tracker import FeatureTracker, TrackerConfig
from d2slam_tpu.geometry.cameras import PinholeParams
from d2slam_tpu.utils import np_lie
from d2slam_tpu.utils.render import render_blobs
from d2slam_tpu.utils.sim import circle_gt_ramp, default_extrinsics

H, W = 240, 320
FX = FY = 220.0
CX, CY = W / 2, H / 2


@pytest.mark.slow
def test_tracker_on_rendered_sequence():
    rng = np.random.default_rng(0)
    n_lm = 120
    ang = rng.uniform(0, 2 * np.pi, n_lm)
    rad = rng.uniform(9.0, 13.0, n_lm)
    lz = rng.uniform(0.5, 3.5, n_lm)
    pts_w = np.stack([rad * np.cos(ang), rad * np.sin(ang), lz], axis=1)
    inten = rng.uniform(0.5, 1.0, n_lm)

    ext = default_extrinsics(baseline=0.2)
    cams = [
        PinholeParams.make(FX, FY, CX, CY, dtype=jnp.float32)
        for _ in range(2)
    ]
    sp_cfg = SuperPointConfig(max_keypoints=128, threshold=1e-4, nms_radius=4)
    sp_params = superpoint_init(jax.random.PRNGKey(0), sp_cfg)
    tracker = FeatureTracker(
        sp_params, sp_cfg, cams,
        TrackerConfig(min_keyframe_parallax=4.0, search_radius=30.0),
    )

    frames = []
    for k in range(8):
        t = k * 0.25
        p, v, a, q, _ = circle_gt_ramp(t)
        pose = np.concatenate([p, q])
        imgs = []
        for c in range(2):
            T_cam = np_lie.pose_compose(pose, ext[c])
            imgs.append(
                render_blobs(pts_w, T_cam, FX, FY, CX, CY, H, W,
                             intensities=inten)
            )
        ff = tracker.process_stereo(t, k, imgs[0], imgs[1])
        if ff is not None:
            frames.append(ff)

    assert len(frames) >= 3, f"only {len(frames)} keyframes"
    # landmark ids persist across keyframes
    id_sets = [set(f.observations[0].landmark_ids.tolist()) for f in frames]
    common_01 = id_sets[0] & id_sets[1]
    assert len(common_01) >= 15, f"only {len(common_01)} persistent tracks"
    # stereo observations exist
    n_stereo = sum(
        len(f.observations[1].landmark_ids) for f in frames
        if len(f.observations) > 1
    )
    assert n_stereo >= 20
    # rays are unit and point forward (camera z)
    r = frames[0].observations[0].rays
    np.testing.assert_allclose(np.linalg.norm(r, axis=1), 1.0, atol=1e-5)
    assert (r[:, 2] > 0.2).all()


@pytest.mark.slow
def test_rgbd_depth_attachment():
    """PINHOLE_DEPTH path: process_rgbd samples the aligned depth image
    at tracked keypoints; in-range samples attach as measured depths,
    out-of-range leave the landmark vision-only."""
    rng = np.random.default_rng(1)
    n_lm = 100
    ang = rng.uniform(0, 2 * np.pi, n_lm)
    rad = rng.uniform(9.0, 13.0, n_lm)
    lz = rng.uniform(0.5, 3.5, n_lm)
    pts_w = np.stack([rad * np.cos(ang), rad * np.sin(ang), lz], axis=1)
    inten = rng.uniform(0.5, 1.0, n_lm)

    ext = default_extrinsics(baseline=0.2)[:1]
    cams = [PinholeParams.make(FX, FY, CX, CY, dtype=jnp.float32)]
    sp_cfg = SuperPointConfig(max_keypoints=128, threshold=1e-4, nms_radius=4)
    sp_params = superpoint_init(jax.random.PRNGKey(0), sp_cfg)
    tracker = FeatureTracker(
        sp_params, sp_cfg, cams,
        TrackerConfig(min_keyframe_parallax=4.0, search_radius=30.0,
                      depth_min=0.3, depth_max=20.0),
        extrinsics=ext,
    )

    def render_depth(T_cam):
        """Depth image: splat each landmark's camera-frame z on a disk
        around its projection (0 = no measurement)."""
        R = np_lie.quat_to_rotmat(T_cam[3:])
        pc = (pts_w - T_cam[:3]) @ R
        d = np.zeros((H, W))
        for p in pc[pc[:, 2] > 0.5]:
            u = int(round(FX * p[0] / p[2] + CX))
            v = int(round(FY * p[1] / p[2] + CY))
            if 3 <= u < W - 3 and 3 <= v < H - 3:
                d[v - 3 : v + 4, u - 3 : u + 4] = p[2]
        return d

    got_depth = 0
    checked = 0
    for k in range(6):
        t = k * 0.25
        p, v, a, q, _ = circle_gt_ramp(t)
        pose = np.concatenate([p, q])
        T_cam = np_lie.pose_compose(pose, ext[0])
        img = render_blobs(pts_w, T_cam, FX, FY, CX, CY, H, W,
                           intensities=inten)
        dimg = render_depth(T_cam)
        ff = tracker.process_rgbd(t, k, img, dimg)
        if ff is None:
            continue
        (co,) = ff.observations
        assert co.depths is not None
        pos = co.depths > 0
        got_depth += int(pos.sum())
        checked += len(co.depths)
        # every attached depth is in range and equals some landmark's
        # camera-frame z (the depth disks carry exact landmark depths)
        assert (co.depths[pos] > 0.3).all() and (co.depths[pos] < 20).all()
        R = np_lie.quat_to_rotmat(T_cam[3:])
        z_lms = ((pts_w - T_cam[:3]) @ R)[:, 2]
        for d in co.depths[pos]:
            assert np.min(np.abs(z_lms - d)) < 1e-6
    assert checked > 0
    # SuperPoint (random weights) fires off-blob too; require a solid
    # absolute count of depth-carrying keypoints, not a fraction
    assert got_depth >= 20, f"only {got_depth}/{checked} with depth"
