"""Mono initialization building blocks, evaluation module, checkpoint."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d2slam_tpu.utils import np_lie
from d2slam_tpu.utils.evaluation import (
    ate_rmse,
    read_trajectory_csv,
    rpe_rmse,
    write_trajectory_csv,
)
from d2slam_tpu.vins.initialization import (
    linear_alignment,
    solve_gyroscope_bias,
    solve_relative_pose,
)


def test_essential_relative_pose():
    rng = np.random.default_rng(0)
    # two cameras with known relative pose
    from d2slam_tpu.geometry.lie import so3_exp_quat

    q12 = np.asarray(so3_exp_quat(jnp.asarray([0.05, -0.1, 0.2])))
    R12 = np_lie.quat_to_rotmat(q12)  # x2 = R12 x1 + t12
    t12 = np.array([0.4, 0.1, -0.2])
    pts1 = np.concatenate(
        [rng.uniform(-2, 2, (60, 2)), rng.uniform(4, 10, (60, 1))], axis=1
    )
    r1 = pts1 / np.linalg.norm(pts1, axis=1, keepdims=True)
    pts2 = (R12 @ pts1.T).T + t12
    r2 = pts2 / np.linalg.norm(pts2, axis=1, keepdims=True)
    # outliers
    r2[:6] = rng.normal(0, 1, (6, 3))
    r2[:6] /= np.linalg.norm(r2[:6], axis=1, keepdims=True)

    R, t, inl = solve_relative_pose(r1, r2, thresh=1e-4)
    assert R is not None
    assert inl.sum() >= 50 and not inl[:6].any()
    np.testing.assert_allclose(R, R12, atol=1e-3)
    t_unit = t12 / np.linalg.norm(t12)
    assert abs(float(t @ t_unit)) > 0.999

    # batched-hypothesis device RANSAC finds the same solution
    Rd, td, inl_d = solve_relative_pose(r1, r2, thresh=1e-4, device=True)
    assert Rd is not None
    assert inl_d.sum() >= 50 and not inl_d[:6].any()
    np.testing.assert_allclose(Rd, R12, atol=1e-3)
    assert abs(float(td @ t_unit)) > 0.999


def test_gyro_bias_and_alignment():
    from d2slam_tpu.imu import default_noise_matrix, preintegrate
    from d2slam_tpu.utils.synthetic import GRAVITY, circle_gt

    noise = default_noise_matrix(0.1, 0.05, 0.002, 0.0004, dtype=jnp.float64)
    true_bg = np.array([0.004, -0.003, 0.002])
    imu_hz, dt_f = 400, 0.25
    K = 5
    pres, q_rel, poses_vis = [], [], []
    scale_true = 2.5  # visual frame scaled down
    for k in range(K + 1):
        p, v, a, q = circle_gt(k * dt_f)
        poses_vis.append(np.concatenate([p / scale_true, q]))
    for k in range(K):
        n = int(dt_f * imu_hz) + 1
        dts = np.zeros(n)
        accs = np.zeros((n, 3))
        gyrs = np.zeros((n, 3))
        mask = np.zeros(n, bool)
        for i in range(n):
            t = k * dt_f + i / imu_hz
            p, v, a, q = circle_gt(t)
            R = np_lie.quat_to_rotmat(q)
            accs[i] = R.T @ (a + GRAVITY)
            gyrs[i] = np.array([0, 0, 0.5]) + true_bg
            dts[i] = 0 if i == 0 else 1.0 / imu_hz
            mask[i] = i > 0
        pre = preintegrate(
            jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs),
            jnp.asarray(mask), jnp.zeros(3), jnp.zeros(3), noise,
        )
        pres.append(pre)
        qa = poses_vis[k][3:]
        qb = poses_vis[k + 1][3:]
        q_rel.append(np_lie.quat_mul(np_lie.quat_conj(qa), qb))

    dbg = solve_gyroscope_bias(q_rel, pres)
    np.testing.assert_allclose(dbg, true_bg, atol=5e-4)

    # repropagate with the recovered bias, then align
    pres2 = []
    for k in range(K):
        n = int(dt_f * imu_hz) + 1
        dts = np.zeros(n)
        accs = np.zeros((n, 3))
        gyrs = np.zeros((n, 3))
        mask = np.zeros(n, bool)
        for i in range(n):
            t = k * dt_f + i / imu_hz
            p, v, a, q = circle_gt(t)
            R = np_lie.quat_to_rotmat(q)
            accs[i] = R.T @ (a + GRAVITY)
            gyrs[i] = np.array([0, 0, 0.5]) + true_bg
            dts[i] = 0 if i == 0 else 1.0 / imu_hz
            mask[i] = i > 0
        pres2.append(preintegrate(
            jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs),
            jnp.asarray(mask), jnp.zeros(3), jnp.asarray(dbg), noise,
        ))
    out = linear_alignment(poses_vis, pres2)
    assert out is not None
    vels, g, s = out
    np.testing.assert_allclose(s, scale_true, rtol=0.02)
    # gravity in the visual frame is -GRAVITY direction? world frame here
    # IS the visual frame orientation, gravity vec should be ~[0,0,-9.8]
    np.testing.assert_allclose(g, GRAVITY, atol=0.3)  # factor convention: G positive up
    # velocity of frame 0 in body frame: |v| = 2.5 m/s
    v0_body = vels[0]
    np.testing.assert_allclose(np.linalg.norm(v0_body), 2.5, rtol=0.05)


def test_evaluation_module(tmp_path):
    rng = np.random.default_rng(0)
    t = np.arange(50) * 0.1
    poses_gt = np.zeros((50, 7))
    poses_gt[:, 6] = 1
    poses_gt[:, 0] = np.linspace(0, 5, 50)
    # estimate: yaw-rotated + offset + noise
    yaw = 0.3
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    poses_est = poses_gt.copy()
    poses_est[:, :3] = (R.T @ (poses_gt[:, :3] - [1, 2, 0]).T).T
    poses_est[:, :3] += rng.normal(0, 0.01, (50, 3))
    qz = np.array([0, 0, np.sin(-yaw / 2), np.cos(-yaw / 2)])
    for i in range(50):
        poses_est[i, 3:] = np_lie.quat_mul(qz, poses_gt[i, 3:])
    rmse, errs = ate_rmse(t, poses_est, t, poses_gt)
    assert rmse < 0.03, rmse  # alignment removes the offset
    r = rpe_rmse(t, poses_est, t, poses_gt, delta=5)
    assert r < 0.05

    p = str(tmp_path / "traj.csv")
    write_trajectory_csv(p, t, poses_est)
    t2, p2 = read_trajectory_csv(p)
    np.testing.assert_allclose(t2, t, atol=1e-6)
    np.testing.assert_allclose(p2, poses_est, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    from d2slam_tpu.config import D2Config
    from d2slam_tpu.utils.checkpoint import load_estimator, save_estimator
    from d2slam_tpu.utils.sim import CircleSim
    from d2slam_tpu.vins.estimator import D2Estimator

    cfg = D2Config()
    cfg.estimator.max_sld_win_size = 6
    cfg.estimator.min_solve_frames = 3
    cfg.estimator.max_lm_slots = 64
    cfg.estimator.max_solve_measurements = 256
    cfg.estimator.max_imu_samples = 128
    cfg.estimator.max_solver_iters = 3
    sim = CircleSim()
    est = D2Estimator(cfg, sim.ext)
    for (t, a, g) in sim.imu_samples(-0.3, 0.0):
        est.input_imu(t, a, g)
    t_prev = 0.0
    for k in range(5):
        t = k / sim.frame_hz
        if k:
            for (ts, a, g) in sim.imu_samples(t_prev + 1e-6, t + 1e-6):
                est.input_imu(ts, a, g)
        t_prev = t
        est.input_frame(sim.frame(k))

    path = str(tmp_path / "ckpt.npz")
    save_estimator(path, est)
    est2 = D2Estimator(cfg, sim.ext)
    load_estimator(path, est2)
    np.testing.assert_array_equal(
        np.asarray(est.state.poses), np.asarray(est2.state.poses)
    )
    assert est2.solve_count == est.solve_count
    assert len(est2.frames) == len(est.frames)
    assert len(est2.lmanager.db) == len(est.lmanager.db)
    # resumed estimator keeps running
    for (ts, a, g) in sim.imu_samples(t_prev + 1e-6, t_prev + 0.125 + 1e-6):
        est2.input_imu(ts, a, g)
    od = est2.input_frame(sim.frame(5))
    assert od is not None and np.isfinite(od.pose).all()
