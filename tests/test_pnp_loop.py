"""PnP RANSAC and loop detection geometric verification."""
import numpy as np

import jax.numpy as jnp

from d2slam_tpu.frontend.loop_detector import (
    KeyframeEntry,
    LoopDetector,
    LoopDetectorConfig,
)
from d2slam_tpu.frontend.pnp import ransac_pnp, ransac_pnp_body
from d2slam_tpu.utils import np_lie
from d2slam_tpu.utils.sim import default_extrinsics


def make_pnp_scene(n=60, outliers=10, seed=0):
    rng = np.random.default_rng(seed)
    # camera at a known pose
    axis = rng.normal(0, 1, 3)
    axis *= 0.3 / np.linalg.norm(axis)
    from d2slam_tpu.geometry.lie import so3_exp_quat

    q = np.asarray(so3_exp_quat(jnp.asarray(axis)))
    T = np.concatenate([rng.normal(0, 2, 3), q])
    R = np_lie.quat_to_rotmat(T[3:])
    pts_w = T[:3] + (rng.uniform(-4, 4, (n, 2)) @ np.eye(2, 3)) \
        + R[:, 2] * rng.uniform(4, 12, (n, 1)) + rng.normal(0, 1.0, (n, 3))
    pc = (pts_w - T[:3]) @ R
    rays = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    # corrupt some correspondences
    bad = rng.choice(n, outliers, replace=False)
    rays[bad] = rng.normal(0, 1, (outliers, 3))
    rays[bad] /= np.linalg.norm(rays[bad], axis=1, keepdims=True)
    rays[bad][:, 2] = np.abs(rays[bad][:, 2])
    return T, rays, pts_w, bad


def test_ransac_pnp_recovers_pose():
    T, rays, pts_w, bad = make_pnp_scene()
    T_est, inl = ransac_pnp(rays, pts_w, thresh=2e-3, min_inliers=20)
    assert T_est is not None
    assert np.linalg.norm(T_est[:3] - T[:3]) < 0.05
    dq = np_lie.quat_mul(np_lie.quat_conj(T_est[3:]), T[3:])
    assert abs(dq[3]) > 0.9999
    # outliers excluded
    assert not inl[bad].any()


def test_ransac_pnp_body_multicam():
    T_body, rays, pts_w, _ = make_pnp_scene(outliers=0, seed=1)
    ext = default_extrinsics()
    # treat bearings as cam0 observations; transform accordingly:
    # rays are in "camera" frame == T_body here, so compose body pose
    T_w_cam = T_body
    T_w_body = np_lie.pose_compose(T_w_cam, np_lie.pose_inverse(ext[0]))
    cam_idx = np.zeros(len(rays), np.int32)
    T_est, inl = ransac_pnp_body(
        rays, cam_idx, ext, pts_w, thresh=2e-3, min_inliers=20
    )
    assert T_est is not None
    assert np.linalg.norm(T_est[:3] - T_w_body[:3]) < 0.05
    assert inl.sum() >= 50


def make_entry(frame_id, drone_id, pose, rays, cams, desc, lms, stamp=0.0):
    return KeyframeEntry(
        frame_id=frame_id, drone_id=drone_id, stamp=stamp,
        pose=pose, kpt_rays=rays, kpt_cam=cams, kpt_desc=desc,
        kpt_valid=np.ones(len(rays), bool), lm_positions=lms,
    )


def test_loop_detector_end_to_end():
    rng = np.random.default_rng(3)
    ext = default_extrinsics()
    cfg = LoopDetectorConfig(min_gap_frames=2, min_inliers=20,
                             min_match_per_dir=10)
    det = LoopDetector(cfg, ext)

    # old keyframe: at origin-ish, with known landmarks
    n = 80
    # camera0 looks along world +x (body x forward): put landmarks ahead
    lms = np.concatenate(
        [rng.uniform(6, 14, (n, 1)), rng.uniform(-5, 5, (n, 1)),
         rng.uniform(0, 4, (n, 1))], axis=1
    )
    pose_old = np.array([0.0, 0, 0, 0, 0, 0, 1])
    T_cam_old = np_lie.pose_compose(pose_old, ext[0])
    R = np_lie.quat_to_rotmat(T_cam_old[3:])
    pc = (lms - T_cam_old[:3]) @ R
    rays_old = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    desc = rng.normal(0, 1, (n, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    gdesc_old = rng.normal(0, 1, 4096).astype(np.float32)
    gdesc_old /= np.linalg.norm(gdesc_old)
    det.add_keyframe(
        make_entry(0, 0, pose_old, rays_old, np.zeros(n, np.int32), desc, lms),
        gdesc_old,
    )

    # new keyframe: body moved, sees the SAME landmarks with similar descs
    pose_new_true = np.array([1.0, 0.5, 0.2, 0, 0, np.sin(0.1), np.cos(0.1)])
    T_cam_new = np_lie.pose_compose(pose_new_true, ext[0])
    Rn = np_lie.quat_to_rotmat(T_cam_new[3:])
    pcn = (lms - T_cam_new[:3]) @ Rn
    rays_new = pcn / np.linalg.norm(pcn, axis=1, keepdims=True)
    desc_new = desc + rng.normal(0, 0.03, desc.shape).astype(np.float32)
    desc_new /= np.linalg.norm(desc_new, axis=1, keepdims=True)
    gdesc_new = gdesc_old + rng.normal(0, 0.005, 4096).astype(np.float32)
    gdesc_new /= np.linalg.norm(gdesc_new)

    # drifted VIO pose for the new frame (loop should correct this)
    pose_new_vio = pose_new_true.copy()
    pose_new_vio[:3] += [0.3, -0.2, 0.1]

    entry = make_entry(
        10, 0, pose_new_vio, rays_new, np.zeros(n, np.int32), desc_new,
        np.full((n, 3), np.nan),
    )
    edge = det.detect(entry, gdesc_new)
    assert edge is not None, "loop not detected"
    assert edge.inliers >= 50
    # rel pose = old_T_new(true) since landmarks/PnP are exact
    rel_true = np_lie.pose_compose(
        np_lie.pose_inverse(pose_old), pose_new_true
    )
    np.testing.assert_allclose(edge.rel_pose[:3], rel_true[:3], atol=0.02)

    # below-threshold NetVLAD similarity -> no loop
    g_other = rng.normal(0, 1, 4096).astype(np.float32)
    g_other /= np.linalg.norm(g_other)
    assert det.detect(entry, g_other) is None


def test_ransac_pnp_device_matches_host():
    """Batched-hypothesis device RANSAC (one jitted program for all
    hypotheses, SURVEY §7) recovers the same pose as the host loop."""
    T, rays, pts_w, bad = make_pnp_scene(seed=4)
    Th, inl_h = ransac_pnp(rays, pts_w, thresh=2e-3, min_inliers=20)
    Td, inl_d = ransac_pnp(rays, pts_w, thresh=2e-3, min_inliers=20,
                           device=True)
    assert Th is not None and Td is not None
    np.testing.assert_allclose(Td[:3], T[:3], atol=0.02)
    dq = np_lie.quat_mul(np_lie.quat_conj(Td[3:]), T[3:])
    assert abs(dq[3]) > 0.9999, f"device rot off: {Td}"
    # inlier masks agree on the ground-truth outliers
    assert not inl_d[bad].any()
    assert inl_d.sum() >= inl_h.sum() - 3


def test_ransac_pnp_body_device():
    """Non-central (multi-camera) PnP through the device path."""
    T, rays, pts_w, bad = make_pnp_scene(n=80, outliers=8, seed=9)
    ext = default_extrinsics(baseline=0.2)
    # treat all bearings as cam0 observations of the BODY at T*inv(ext0)
    T_body = np_lie.pose_compose(T, np_lie.pose_inverse(ext[0]))
    cam_idx = np.zeros(len(rays), np.int32)
    Tb, inl = ransac_pnp_body(rays, cam_idx, ext, pts_w, thresh=2e-3,
                              min_inliers=20, device=True)
    assert Tb is not None
    np.testing.assert_allclose(Tb[:3], T_body[:3], atol=0.02)


def test_adaptive_retrieval_gate():
    """auto_thres: the retrieval gate self-calibrates to the running
    embedding's impostor-similarity scale (mu + k*sigma of non-loop
    best-match scores) instead of the NetVLAD-tuned constant."""
    rng = np.random.default_rng(0)
    ext = default_extrinsics()
    # deliberately mistuned constant: a weak embedding whose genuine
    # matches sit near 0.6 would never pass 0.8
    cfg = LoopDetectorConfig(netvlad_thres=0.8, auto_thres=True,
                             auto_thres_sigma=3.0,
                             auto_thres_min_samples=10,
                             min_gap_frames=2)
    det = LoopDetector(cfg, ext)

    def unit(v):
        return (v / np.linalg.norm(v)).astype(np.float32)

    # a DB of distinct places
    base = [unit(rng.normal(0, 1, 4096)) for _ in range(8)]
    rays = np.tile([[1.0, 0, 0]], (4, 1))
    for i, g in enumerate(base):
        det.add_keyframe(make_entry(
            100 + i, 0, np.array([0.0, 0, 0, 0, 0, 0, 1]),
            rays, np.zeros(4, np.int32),
            np.eye(4, 8, dtype=np.float32), np.full((4, 3), np.nan),
        ), g)

    # warm-up: impostor queries (random directions, low similarity)
    assert det.effective_netvlad_thres() == cfg.netvlad_thres
    for i in range(30):
        q = unit(rng.normal(0, 1, 4096))
        assert det.detect(make_entry(
            500 + i, 1, np.array([0.0, 0, 0, 0, 0, 0, 1]),
            rays, np.zeros(4, np.int32),
            np.eye(4, 8, dtype=np.float32), np.full((4, 3), np.nan),
        ), q) is None

    thres = det.effective_netvlad_thres()
    # calibrated: far below the mistuned 0.8, above the impostor cloud
    assert thres < 0.5
    assert thres > det._imp_mean
    # a genuine revisit (same embedding + small noise) passes the gate
    revisit = unit(base[3] + 0.05 * rng.normal(0, 1, 4096))
    score = det.query_score(revisit)
    assert score > thres


def test_ransac_homography_mask():
    from d2slam_tpu.frontend.pnp import ransac_homography

    rng = np.random.default_rng(11)
    pts = rng.uniform(-0.5, 0.5, (60, 2))
    H = np.array([[1.02, 0.01, 0.03], [-0.01, 0.98, -0.02],
                  [0.05, -0.03, 1.0]])
    hb = np.concatenate([pts, np.ones((60, 1))], 1) @ H.T
    pa = hb[:, :2] / hb[:, 2:]
    pa[:10] += rng.uniform(0.2, 0.4, (10, 2))  # gross outliers
    m = ransac_homography(pa, pts, thresh=0.02)
    assert m[:10].sum() == 0 and m[10:].sum() >= 45
    # degenerate input passes through
    assert ransac_homography(pa[:3], pts[:3], 0.02).all()


def test_loop_detector_homography_gate():
    """Planar scene + corrupted matches: the homography test drops the
    bad correspondences and the loop edge survives (reference
    enable_homography_test, loop_detector.cpp:610-617)."""
    rng = np.random.default_rng(5)
    ext = default_extrinsics()
    cfg = LoopDetectorConfig(min_gap_frames=2, min_inliers=20,
                             min_match_per_dir=10,
                             enable_homography_test=True)
    det = LoopDetector(cfg, ext)

    n = 80
    # planar wall x = 10 ahead of camera0 (+x forward)
    lms = np.concatenate(
        [np.full((n, 1), 10.0), rng.uniform(-5, 5, (n, 1)),
         rng.uniform(-1, 3, (n, 1))], axis=1
    )
    pose_old = np.array([0.0, 0, 0, 0, 0, 0, 1])
    T_cam_old = np_lie.pose_compose(pose_old, ext[0])
    R = np_lie.quat_to_rotmat(T_cam_old[3:])
    pc = (lms - T_cam_old[:3]) @ R
    rays_old = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    desc = rng.normal(0, 1, (n, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    gdesc = rng.normal(0, 1, 4096).astype(np.float32)
    gdesc /= np.linalg.norm(gdesc)
    det.add_keyframe(
        make_entry(0, 0, pose_old, rays_old, np.zeros(n, np.int32),
                   desc, lms), gdesc,
    )

    pose_new = np.array([1.0, 0.5, 0.1, 0, 0, np.sin(0.05), np.cos(0.05)])
    T_cam_new = np_lie.pose_compose(pose_new, ext[0])
    Rn = np_lie.quat_to_rotmat(T_cam_new[3:])
    pcn = (lms - T_cam_new[:3]) @ Rn
    rays_new = pcn / np.linalg.norm(pcn, axis=1, keepdims=True)
    # 15 features look (desc-wise) like the WRONG old landmarks ->
    # off-plane correspondences the homography gate must remove
    desc_new = desc + rng.normal(0, 0.03, desc.shape).astype(np.float32)
    perm = rng.permutation(15)
    desc_new[:15] = desc[perm] + rng.normal(0, 0.03, (15, 256))
    desc_new /= np.linalg.norm(desc_new, axis=1, keepdims=True)

    entry = make_entry(10, 0, pose_new, rays_new, np.zeros(n, np.int32),
                       desc_new, np.full((n, 3), np.nan))
    edge = det.detect(entry, gdesc)
    assert edge is not None
    rel_true = np_lie.pose_compose(np_lie.pose_inverse(pose_old), pose_new)
    np.testing.assert_allclose(edge.rel_pose[:3], rel_true[:3], atol=0.05)


def test_ransac_pnp_planar_scene():
    """Coplanar landmarks (wall/corridor loops): the 6-point DLT is
    degenerate there, the planar-homography hypothesis recovers the
    pose (reference solvers EPnP/OpenGV handle planar natively)."""
    rng = np.random.default_rng(9)
    n = 60
    pts = np.concatenate(
        [rng.uniform(-4, 4, (n, 1)), rng.uniform(-2, 2, (n, 1)),
         np.full((n, 1), 8.0)], axis=1
    )  # plane z = 8 in front of camera
    T_true = np.array([0.4, -0.2, 0.5, 0, np.sin(0.1), 0, np.cos(0.1)])
    R = np_lie.quat_to_rotmat(T_true[3:])
    pc = (pts - T_true[:3]) @ R
    rays = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    T, inl = ransac_pnp(rays, pts, thresh=2.0 / 460.0, min_inliers=30)
    assert T is not None and inl.sum() >= 55
    assert np.linalg.norm(T[:3] - T_true[:3]) < 0.02


def test_ransac_pnp_planar_device():
    """The batched device kernel also carries planar-homography
    hypotheses, so coplanar scenes work on the device path too."""
    rng = np.random.default_rng(9)
    n = 60
    pts = np.concatenate(
        [rng.uniform(-4, 4, (n, 1)), rng.uniform(-2, 2, (n, 1)),
         np.full((n, 1), 8.0)], axis=1
    )
    T_true = np.array([0.4, -0.2, 0.5, 0, np.sin(0.1), 0, np.cos(0.1)])
    R = np_lie.quat_to_rotmat(T_true[3:])
    pc = (pts - T_true[:3]) @ R
    rays = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    T, inl = ransac_pnp(rays, pts, thresh=2.0 / 460.0, min_inliers=30,
                        device=True)
    assert T is not None and inl.sum() >= 55
    assert np.linalg.norm(T[:3] - T_true[:3]) < 0.02


def test_gravity_check_rejects_tilted_loop(monkeypatch):
    """A PnP result whose attitude tilts gravity vs the frame's ego
    attitude is rejected (reference gravityCheck, pnp_utils.cpp:85-93),
    even when inliers are plentiful."""
    import d2slam_tpu.frontend.loop_detector as mod

    rng = np.random.default_rng(3)
    ext = default_extrinsics()
    cfg = LoopDetectorConfig(min_gap_frames=2, min_inliers=20,
                             min_match_per_dir=10)
    det = LoopDetector(cfg, ext)
    n = 80
    lms = np.concatenate(
        [rng.uniform(6, 14, (n, 1)), rng.uniform(-5, 5, (n, 1)),
         rng.uniform(0, 4, (n, 1))], axis=1)
    pose_old = np.array([0.0, 0, 0, 0, 0, 0, 1])
    T_cam = np_lie.pose_compose(pose_old, ext[0])
    R = np_lie.quat_to_rotmat(T_cam[3:])
    pc = (lms - T_cam[:3]) @ R
    rays = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    desc = rng.normal(0, 1, (n, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    gdesc = rng.normal(0, 1, 4096).astype(np.float32)
    gdesc /= np.linalg.norm(gdesc)
    det.add_keyframe(
        make_entry(0, 0, pose_old, rays, np.zeros(n, np.int32), desc, lms),
        gdesc)
    entry = make_entry(10, 0, pose_old, rays, np.zeros(n, np.int32),
                       desc, np.full((n, 3), np.nan))

    # identical frame: sanity — accepted
    assert det.detect(entry, gdesc) is not None

    # force a 10-degree-pitched PnP result: gravity gate must fire
    tilt = np.array([0, 0, 0, 0, np.sin(0.09), 0, np.cos(0.09)])
    real = mod.ransac_pnp_body

    def tilted(*a, **k):
        T, inl = real(*a, **k)
        return (None, inl) if T is None else (np_lie.pose_compose(T, tilt),
                                              inl)

    monkeypatch.setattr(mod, "ransac_pnp_body", tilted)
    assert det.detect(entry, gdesc) is None
