"""Synthetic VI-SLAM scenes for tests and benchmarks.

Generates an analytic circular trajectory with body-frame IMU, a cloud
of landmarks, and stereo unit-ray observations, packed directly into the
fixed-shape solver containers. This plays the role of the reference's
dataset-driven validation (SURVEY.md §4) at unit-test scale, with exact
ground truth.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from d2slam_tpu.utils import np_lie
from d2slam_tpu.imu.preintegration import default_noise_matrix, preintegrate
from d2slam_tpu.factors.residuals import imu_sqrt_info
from d2slam_tpu.solver.layout import VIOLayout
from d2slam_tpu.solver.state import ImuMeas, ProjMeas, VIOState

GRAVITY = np.array([0.0, 0.0, 9.805])


def circle_gt(t, radius=5.0, omega=0.5, height=2.0):
    """Ground-truth kinematics on a circle, body x along the tangent."""
    c, s = np.cos(omega * t), np.sin(omega * t)
    p = np.array([radius * c, radius * s, height])
    v = np.array([-radius * omega * s, radius * omega * c, 0.0])
    a = np.array([-radius * omega**2 * c, -radius * omega**2 * s, 0.0])
    yaw = omega * t + np.pi / 2
    q = np.array([0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)])
    return p, v, a, q


def make_circle_scene(
    layout: VIOLayout,
    n_frames: int,
    n_landmarks: int,
    dt_frame: float = 0.25,
    imu_hz: int = 400,
    pix_noise_rad: float = 0.0,
    imu_acc_noise: float = 0.0,
    imu_gyr_noise: float = 0.0,
    acc_n: float = 0.1,
    gyr_n: float = 0.05,
    acc_w: float = 0.002,
    gyr_w: float = 0.0004,
    baseline: float = 0.1,
    seed: int = 0,
    dtype=jnp.float64,
):
    """Build GT state + measurement containers for an n_frames window."""
    rng = np.random.default_rng(seed)
    assert n_frames <= layout.W

    # ---------------- ground-truth states ----------------
    times = np.arange(n_frames) * dt_frame
    poses = np.zeros((layout.W, 7))
    poses[:, 6] = 1.0
    sb = np.zeros((layout.W, 9))
    for k, t in enumerate(times):
        p, v, _, q = circle_gt(t)
        poses[k, :3], poses[k, 3:] = p, q
        sb[k, :3] = v
    frame_valid = np.zeros(layout.W, bool)
    frame_valid[:n_frames] = True

    # extrinsics: cam0 at identity-ish (camera z forward == body x):
    # R_bc maps camera frame (z forward, x right, y down) to body (x fwd,
    # y left, z up)
    R_bc = np.array([[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]])
    q_bc = np_lie.rotmat_to_quat(R_bc)
    ext = np.zeros((layout.C, 7))
    ext[0] = np.concatenate([[0.0, baseline / 2, 0.0], q_bc])
    ext[1] = np.concatenate([[0.0, -baseline / 2, 0.0], q_bc])

    # ---------------- landmarks ----------------
    # scatter in front of the trajectory ring (outside the circle)
    ang = rng.uniform(0, 2 * np.pi, n_landmarks)
    rad = rng.uniform(8.0, 14.0, n_landmarks)
    lz = rng.uniform(0.0, 4.0, n_landmarks)
    lms_w = np.stack([rad * np.cos(ang), rad * np.sin(ang), lz], axis=1)

    # ---------------- observations ----------------
    def cam_pose(fk, ck):
        return np_lie.pose_compose(poses[fk], ext[ck])

    def ray(fk, ck, pw):
        T = cam_pose(fk, ck)
        R = np_lie.quat_to_rotmat(T[3:])
        pc = R.T @ (pw - T[:3])
        d = np.linalg.norm(pc)
        return pc / d, d, pc[2] > 0.5  # in front of camera

    obs = []  # (fi, fj, ci, cj, lm_slot, ray_i, ray_j)
    inv_dep = np.full(layout.L, 0.2)
    lm_valid = np.zeros(layout.L, bool)
    anchor = {}
    for l in range(min(n_landmarks, layout.L)):
        pw = lms_w[l]
        views = []
        for f in range(n_frames):
            for c in range(2):
                rvec, d, ok = ray(f, c, pw)
                if ok:
                    views.append((f, c, rvec, d))
        if len(views) < 4:
            continue
        f0, c0, r0, d0 = views[0]
        assert c0 == 0 or True
        inv_dep[l] = 1.0 / d0
        lm_valid[l] = True
        anchor[l] = (f0, c0)
        for (f, c, rv, d) in views[1:]:
            if pix_noise_rad > 0:
                n2 = rng.normal(0, pix_noise_rad, 3)
                rv = rv + n2 - rv * (rv @ n2)
                rv = rv / np.linalg.norm(rv)
            obs.append((f0, f, c0, c, l, r0, rv, d))

    M = layout.M
    if len(obs) > M:
        keep = rng.choice(len(obs), M, replace=False)
        obs = [obs[i] for i in sorted(keep)]
    proj = ProjMeas.empty(layout, dtype)
    pm = {k: np.array(v) for k, v in proj._asdict().items()}  # writable copies
    for m, (fi, fj, ci, cj, l, ri, rj, dj) in enumerate(obs):
        pm["frame_i"][m], pm["frame_j"][m] = fi, fj
        pm["cam_i"][m], pm["cam_j"][m] = ci, cj
        pm["lm"][m] = l
        pm["ray_i"][m], pm["ray_j"][m] = ri, rj
        pm["dep_j"][m] = dj
        pm["valid"][m] = True
    proj = ProjMeas(**{k: jnp.asarray(v) for k, v in pm.items()})

    # ---------------- IMU between consecutive frames ----------------
    noise = default_noise_matrix(acc_n, gyr_n, acc_w, gyr_w, dtype=dtype)
    n_samp = layout.N_IMU_SAMPLES
    K = layout.W - 1
    dts = np.zeros((K, n_samp))
    accs = np.zeros((K, n_samp, 3))
    gyrs = np.zeros((K, n_samp, 3))
    mask = np.zeros((K, n_samp), bool)
    omega = 0.5
    for k in range(max(n_frames - 1, 0)):
        t0 = times[k]
        nk = int(dt_frame * imu_hz)
        assert nk + 1 <= n_samp
        for i in range(nk + 1):
            t = t0 + i / imu_hz
            p, v, a, q = circle_gt(t)
            R = np_lie.quat_to_rotmat(q)
            acc_b = R.T @ (a + GRAVITY)  # specific force (gravity pos-up)
            gyr_b = np.array([0.0, 0.0, omega])
            if imu_acc_noise > 0:
                acc_b = acc_b + rng.normal(0, imu_acc_noise, 3)
            if imu_gyr_noise > 0:
                gyr_b = gyr_b + rng.normal(0, imu_gyr_noise, 3)
            accs[k, i] = acc_b
            gyrs[k, i] = gyr_b
            dts[k, i] = 0.0 if i == 0 else 1.0 / imu_hz
            mask[k, i] = i > 0
    pre = jax.vmap(preintegrate, in_axes=(0, 0, 0, 0, None, None, None))(
        jnp.asarray(dts, dtype), jnp.asarray(accs, dtype),
        jnp.asarray(gyrs, dtype), jnp.asarray(mask),
        jnp.zeros(3, dtype), jnp.zeros(3, dtype), noise,
    )  # explicit dtype: np f64 inputs must not promote the solver
    #    pipeline to f64 when the host has x64 enabled
    sqrt_infos = jax.vmap(imu_sqrt_info)(pre.covariance)
    imu_valid = np.zeros(K, bool)
    imu_valid[: max(n_frames - 1, 0)] = True
    imu = ImuMeas(
        frame_i=jnp.arange(K, dtype=jnp.int32),
        frame_j=jnp.arange(1, K + 1, dtype=jnp.int32),
        valid=jnp.asarray(imu_valid),
        pre=pre,
        sqrt_info=sqrt_infos,
    )

    gt_state = VIOState(
        poses=jnp.asarray(poses, dtype),
        sb=jnp.asarray(sb, dtype),
        ext=jnp.asarray(ext, dtype),
        td=jnp.zeros((), dtype),
        inv_dep=jnp.asarray(inv_dep, dtype),
        frame_valid=jnp.asarray(frame_valid),
        lm_valid=jnp.asarray(lm_valid),
        lm_pos=jnp.asarray(
            np.pad(lms_w[: layout.L],
                   ((0, max(layout.L - len(lms_w), 0)), (0, 0))),
            dtype,
        ),
    )
    return dict(
        gt_state=gt_state,
        imu=imu,
        proj=proj,
        landmarks_w=lms_w,
        gravity=jnp.asarray(GRAVITY, dtype),
        times=times,
    )


def default_col_free(layout: VIOLayout, state: VIOState, fix_first_pose=True,
                     fix_ext=True, fix_td=True):
    """Free-column mask: valid frames free, gauge on first valid frame."""
    free = np.zeros(layout.D_pad, bool)
    fv = np.asarray(state.frame_valid)
    for w in range(layout.W):
        if fv[w]:
            free[15 * w : 15 * w + 15] = True
    if fix_first_pose:
        first = int(np.argmax(fv)) if fv.any() else 0
        free[15 * first : 15 * first + 6] = False
    if not fix_ext:
        free[15 * layout.W : 15 * layout.W + 6 * layout.C] = True
    if not fix_td:
        free[layout.td_col] = True
    return jnp.asarray(free)
