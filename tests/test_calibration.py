"""Intrinsic calibration recovers known camera parameters from
synthetic checkerboard views; vignette fitting."""
import numpy as np

import jax.numpy as jnp

from d2slam_tpu.geometry.cameras import (
    KBParams,
    PinholeParams,
    kb_project,
    pinhole_project,
)
from d2slam_tpu.tools import calibrate_kb, calibrate_pinhole, calibrate_vignette
from d2slam_tpu.utils import np_lie


def make_board(nx=8, ny=6, square=0.04):
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny))
    pts = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3) * square
    return pts - pts.mean(axis=0)


def render_views(project, params, board, n_views=8, seed=0, noise=0.1):
    rng = np.random.default_rng(seed)
    img_pts, poses = [], []
    v = 0
    while len(img_pts) < n_views:
        v += 1
        # board ~0.5 m in front with random tilt/offset
        from d2slam_tpu.geometry.lie import so3_exp_quat

        q = np.asarray(so3_exp_quat(jnp.asarray(rng.normal(0, 0.25, 3))))
        t = np.array([rng.normal(0, 0.08), rng.normal(0, 0.06),
                      rng.uniform(0.4, 0.7)])
        pose = np.concatenate([t, q])  # cam_T_board
        pc = (np_lie.quat_to_rotmat(pose[3:]) @ board.T).T + pose[:3]
        uv, valid = project(jnp.asarray(pc), params)
        uv = np.asarray(uv)
        if not np.asarray(valid).all():
            continue
        if uv.min() < 10 or uv[:, 0].max() > 630 or uv[:, 1].max() > 470:
            continue
        img_pts.append(uv + rng.normal(0, noise, uv.shape))
        poses.append(pose)
    return img_pts


def test_calibrate_pinhole():
    gt = PinholeParams.make(420.0, 418.0, 325.0, 245.0, k1=-0.25, k2=0.06,
                            dtype=jnp.float64)
    board = make_board()
    img_pts = render_views(pinhole_project, gt, board)
    est, rms = calibrate_pinhole(board, img_pts, (640, 480))
    assert rms < 0.3, f"rms {rms}"
    assert abs(float(est.fx) - 420.0) < 4.0, est
    assert abs(float(est.fy) - 418.0) < 4.0
    assert abs(float(est.cx) - 325.0) < 4.0
    assert abs(float(est.k1) + 0.25) < 0.03


def test_calibrate_kb():
    gt = KBParams.make(200.0, 199.0, 322.0, 242.0, k2=0.02, k3=-0.004,
                       dtype=jnp.float64)
    board = make_board(square=0.08)
    img_pts = render_views(kb_project, gt, board, seed=2)
    est, rms = calibrate_kb(board, img_pts, (640, 480), f_guess=210.0)
    assert rms < 0.3, f"rms {rms}"
    assert abs(float(est.fx) - 200.0) < 4.0, est
    assert abs(float(est.cx) - 322.0) < 4.0


def test_calibrate_vignette():
    H, W = 240, 320
    ys, xs = np.mgrid[0:H, 0:W]
    r2 = ((xs - 160) ** 2 + (ys - 120) ** 2) / 160.0**2
    true_v = 1.0 - 0.4 * r2 + 0.05 * r2**2
    img = 0.8 * true_v
    coeffs, corr = calibrate_vignette(img)
    flat = img * corr
    # corrected image should be nearly uniform
    assert flat.std() / flat.mean() < 0.02


def test_calibrate_stereo_extrinsic():
    from d2slam_tpu.tools.calibration import calibrate_stereo_extrinsic

    rng = np.random.default_rng(5)
    board = make_board()
    p0 = PinholeParams(fx=460.0, fy=458.0, cx=320.0, cy=240.0,
                       k1=0.0, k2=0.0, p1=0.0, p2=0.0)
    p1 = PinholeParams(fx=455.0, fy=456.0, cx=318.0, cy=242.0,
                       k1=0.0, k2=0.0, p1=0.0, p2=0.0)
    # ground-truth extrinsic: 12 cm baseline + slight toe-in yaw
    from d2slam_tpu.geometry.lie import so3_exp_quat

    q_gt = np.asarray(so3_exp_quat(jnp.asarray([0.0, 0.02, 0.005])))
    rel_gt = np.concatenate([[-0.12, 0.001, 0.002], q_gt])

    img0, img1 = [], []
    while len(img0) < 8:
        q = np.asarray(so3_exp_quat(jnp.asarray(rng.normal(0, 0.2, 3))))
        t = np.array([rng.normal(0, 0.06), rng.normal(0, 0.05),
                      rng.uniform(0.45, 0.7)])
        pose = np.concatenate([t, q])  # cam0_T_board
        pc0 = (np_lie.quat_to_rotmat(pose[3:]) @ board.T).T + pose[:3]
        pc1 = (np_lie.quat_to_rotmat(rel_gt[3:]) @ pc0.T).T + rel_gt[:3]
        uv0, v0 = pinhole_project(jnp.asarray(pc0), p0)
        uv1, v1 = pinhole_project(jnp.asarray(pc1), p1)
        uv0, uv1 = np.asarray(uv0), np.asarray(uv1)
        if not (np.asarray(v0).all() and np.asarray(v1).all()):
            continue
        if min(uv0.min(), uv1.min()) < 10 or \
           max(uv0[:, 0].max(), uv1[:, 0].max()) > 630 or \
           max(uv0[:, 1].max(), uv1[:, 1].max()) > 470:
            continue
        img0.append(uv0 + rng.normal(0, 0.1, uv0.shape))
        img1.append(uv1 + rng.normal(0, 0.1, uv1.shape))

    rel, rms = calibrate_stereo_extrinsic(
        board, img0, img1,
        lambda pc: pinhole_project(pc, p0),
        lambda pc: pinhole_project(pc, p1),
        460.0, (320.0, 240.0), 455.0, (318.0, 242.0),
    )
    assert rms < 0.3, rms
    # baseline within 1 mm, rotation within ~0.2 deg
    np.testing.assert_allclose(rel[:3], rel_gt[:3], atol=1e-3)
    assert abs(np.dot(rel[3:], rel_gt[3:])) > 1 - 1e-5
