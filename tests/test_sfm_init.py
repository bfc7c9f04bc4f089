"""Dynamic-start monocular SFM initialization: up-to-scale SFM -> gyro
bias -> linear alignment -> gravity-aligned metric states."""
import numpy as np

import jax.numpy as jnp

from d2slam_tpu.imu import default_noise_matrix, preintegrate
from d2slam_tpu.utils import np_lie
from d2slam_tpu.utils.sim import default_extrinsics
from d2slam_tpu.utils.synthetic import GRAVITY, circle_gt
from d2slam_tpu.vins.initialization import linear_alignment
from d2slam_tpu.vins.sfm_init import align_to_gravity, sfm_initialize

NOISE = default_noise_matrix(0.1, 0.05, 0.002, 0.0004, dtype=jnp.float64)


def test_sfm_initialize_dynamic_mono():
    rng = np.random.default_rng(0)
    ext = default_extrinsics()
    S, dt_f, imu_hz = 6, 0.25, 400
    true_bg = np.array([0.003, -0.002, 0.004])

    # landmarks ahead of the (moving) camera
    n = 120
    ang = rng.uniform(0, 2 * np.pi, n)
    rad = rng.uniform(8, 14, n)
    lz = rng.uniform(0, 4, n)
    lms = np.stack([rad * np.cos(ang), rad * np.sin(ang), lz], 1)

    frame_obs = []
    gt_poses = []
    for k in range(S):
        p, v, a, q = circle_gt(k * dt_f)
        pose = np.concatenate([p, q])
        gt_poses.append(pose)
        T = np_lie.pose_compose(pose, ext[0])
        R = np_lie.quat_to_rotmat(T[3:])
        pc = (lms - T[:3]) @ R
        vis = pc[:, 2] > 1.0
        obs = {}
        for i in np.flatnonzero(vis):
            r = pc[i] / np.linalg.norm(pc[i])
            obs[int(i)] = r
        frame_obs.append(obs)

    pres = []
    for k in range(S - 1):
        nk = int(dt_f * imu_hz) + 1
        dts = np.zeros(nk)
        accs = np.zeros((nk, 3))
        gyrs = np.zeros((nk, 3))
        mask = np.zeros(nk, bool)
        for i in range(nk):
            t = k * dt_f + i / imu_hz
            p, v, a, q = circle_gt(t)
            R = np_lie.quat_to_rotmat(q)
            accs[i] = R.T @ (a + GRAVITY)
            gyrs[i] = np.array([0, 0, 0.5]) + true_bg
            dts[i] = 0 if i == 0 else 1.0 / imu_hz
            mask[i] = i > 0
        pres.append(preintegrate(
            jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs),
            jnp.asarray(mask), jnp.zeros(3), jnp.zeros(3), NOISE,
        ))

    out = sfm_initialize(frame_obs, ext[0], pres)
    assert out is not None, "SFM init did not trigger"
    np.testing.assert_allclose(out["dbg"], true_bg, atol=1e-3)

    # repropagate with the recovered bias, then align
    pres2 = []
    for k in range(S - 1):
        nk = int(dt_f * imu_hz) + 1
        dts = np.zeros(nk); accs = np.zeros((nk, 3))
        gyrs = np.zeros((nk, 3)); mask = np.zeros(nk, bool)
        for i in range(nk):
            t = k * dt_f + i / imu_hz
            p, v, a, q = circle_gt(t)
            R = np_lie.quat_to_rotmat(q)
            accs[i] = R.T @ (a + GRAVITY)
            gyrs[i] = np.array([0, 0, 0.5]) + true_bg
            dts[i] = 0 if i == 0 else 1.0 / imu_hz
            mask[i] = i > 0
        pres2.append(preintegrate(
            jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs),
            jnp.asarray(mask), jnp.zeros(3), jnp.asarray(out["dbg"]), NOISE,
        ))
    la = linear_alignment(out["body_poses_visual"], pres2)
    assert la is not None
    vels_body, g_vis, scale = la
    poses, vels = align_to_gravity(
        out["body_poses_visual"], vels_body, g_vis, scale
    )

    # metric relative distances match ground truth
    gt_poses = np.stack(gt_poses)
    for k in range(1, S):
        d_est = np.linalg.norm(poses[k, :3] - poses[0, :3])
        d_gt = np.linalg.norm(gt_poses[k, :3] - gt_poses[0, :3])
        assert abs(d_est - d_gt) < 0.05 * max(d_gt, 0.3), (k, d_est, d_gt)
    # velocity magnitude ~ 2.5 m/s on the circle
    np.testing.assert_allclose(
        np.linalg.norm(vels, axis=1), 2.5, rtol=0.08
    )
    # gravity-aligned: body tilt about x/y matches GT (yaw is gauge)
    for k in range(S):
        g_body_est = np_lie.quat_rotate(
            np_lie.quat_conj(poses[k, 3:]), np.array([0, 0, -1.0])
        )
        g_body_gt = np_lie.quat_rotate(
            np_lie.quat_conj(gt_poses[k, 3:]), np.array([0, 0, -1.0])
        )
        assert np.linalg.norm(g_body_est - g_body_gt) < 0.05
