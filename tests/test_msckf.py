"""MSCKF filter: propagation, augmentation, and landmark updates on a
synthetic circular flight (the reference's MSCKF, d2vins/src/MSCKF/, is
an unwired skeleton with no update step — this one is complete)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d2slam_tpu.geometry.lie import (
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_rotmat,
    so3_exp_quat,
)
from d2slam_tpu.vins.msckf import (
    GRAVITY,
    MSCKFConfig,
    msckf_augment,
    msckf_init,
    msckf_propagate,
    msckf_update,
)

IMU_HZ = 200.0
RADIUS = 3.0
OMEGA = 0.5  # rad/s around the circle


def circle_truth(t):
    """Position/velocity/acceleration of a circular flight; body yaw
    follows the tangent."""
    c, s = np.cos(OMEGA * t), np.sin(OMEGA * t)
    p = np.array([RADIUS * c, RADIUS * s, 1.5])
    v = np.array([-RADIUS * OMEGA * s, RADIUS * OMEGA * c, 0.0])
    a = np.array([-RADIUS * OMEGA**2 * c, -RADIUS * OMEGA**2 * s, 0.0])
    yaw = OMEGA * t + np.pi / 2
    q = np.array([0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)])
    return p, v, a, q


def imu_measurements(t0, t1, n):
    """Perfect body-frame IMU samples over [t0, t1]."""
    ts = np.linspace(t0, t1, n, endpoint=False) + (t1 - t0) / n / 2
    dts = np.full(n, (t1 - t0) / n)
    gyrs, accs = [], []
    g = np.asarray(GRAVITY, np.float64)
    for t in ts:
        p, v, a, q = circle_truth(t)
        R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        gyrs.append(np.array([0.0, 0.0, OMEGA]))  # constant yaw rate
        accs.append(R.T @ (a - g))
    return jnp.asarray(dts), jnp.asarray(np.stack(gyrs)), jnp.asarray(np.stack(accs))


def make_landmarks(n=24, seed=0):
    rng = np.random.RandomState(seed)
    ang = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(6.0, 9.0, n)
    z = rng.uniform(0.0, 3.0, n)
    return np.stack([r * np.cos(ang), r * np.sin(ang), z], axis=1)


def project(p_w, q_w, landmarks):
    """Normalized image coords of landmarks from body pose (camera =
    body, z forward)."""
    R = np.asarray(quat_to_rotmat(jnp.asarray(q_w)))
    pc = (landmarks - p_w) @ R
    uv = pc[:, :2] / np.maximum(pc[:, 2:3], 1e-9)
    ok = pc[:, 2] > 0.3
    return uv, ok


def run_filter(n_kf=8, noise_px=0.0, seed=0):
    cfg = MSCKFConfig(num_clones=8, max_landmarks=24)
    p0, v0, _, q0 = circle_truth(0.0)
    st = msckf_init(cfg, q0=q0, p0=p0, v0=v0)
    lms = make_landmarks(cfg.max_landmarks, seed)
    rng = np.random.RandomState(seed + 1)

    kf_dt = 0.25
    prop = jax.jit(lambda s, d, g, a: msckf_propagate(s, cfg, d, g, a))
    aug = jax.jit(lambda s, t: msckf_augment(s, cfg, t))
    upd = jax.jit(lambda s, uv, m: msckf_update(s, cfg, uv, m))

    obs_uv = np.zeros((cfg.max_landmarks, cfg.num_clones, 2))
    obs_mask = np.zeros((cfg.max_landmarks, cfg.num_clones), bool)
    slots = []
    for k in range(n_kf):
        t0, t1 = k * kf_dt, (k + 1) * kf_dt
        dts, gyrs, accs = imu_measurements(t0, t1, int(IMU_HZ * kf_dt))
        st = prop(st, dts, gyrs, accs)
        st, slot = aug(st, t1)
        slot = int(slot)
        p_t, _, _, q_t = circle_truth(t1)
        uv, ok = project(p_t, q_t, lms)
        if noise_px > 0:
            uv = uv + rng.randn(*uv.shape) * noise_px
        obs_uv[:, slot] = uv
        obs_mask[:, slot] = ok
        slots.append((slot, t1))
        if k >= 3:  # update once enough clones observe the landmarks
            st = upd(st, jnp.asarray(obs_uv), jnp.asarray(obs_mask))
    p_t, v_t, _, q_t = circle_truth(n_kf * kf_dt)
    return st, p_t, v_t, q_t


def test_propagation_tracks_truth():
    cfg = MSCKFConfig(num_clones=4)
    p0, v0, _, q0 = circle_truth(0.0)
    st = msckf_init(cfg, q0=q0, p0=p0, v0=v0)
    dts, gyrs, accs = imu_measurements(0.0, 1.0, int(IMU_HZ))
    st = msckf_propagate(st, cfg, dts, gyrs, accs)
    p_t, v_t, _, q_t = circle_truth(1.0)
    assert np.linalg.norm(np.asarray(st.p) - p_t) < 5e-3
    assert np.linalg.norm(np.asarray(st.v) - v_t) < 5e-3
    # covariance grows under dead reckoning
    assert float(st.P[3, 3]) > 1e-6


def test_augment_clones_pose_and_covariance():
    cfg = MSCKFConfig(num_clones=4)
    st = msckf_init(cfg)
    dts, gyrs, accs = imu_measurements(0.0, 0.5, 100)
    st = msckf_propagate(st, cfg, dts, gyrs, accs)
    st2, slot = msckf_augment(st, cfg, 0.5)
    s = int(slot)
    np.testing.assert_allclose(np.asarray(st2.clone_p[s]), np.asarray(st.p))
    base = 15 + 6 * s
    # clone covariance equals body (dth, dp) covariance
    np.testing.assert_allclose(
        np.asarray(st2.P[base + 3 : base + 6, base + 3 : base + 6]),
        np.asarray(st.P[3:6, 3:6]), rtol=1e-10)
    # eigenvalues stay >= 0 (PSD after augmentation)
    w = np.linalg.eigvalsh(np.asarray(st2.P))
    assert w.min() > -1e-12


def test_updates_beat_dead_reckoning():
    st, p_t, v_t, q_t = run_filter(n_kf=8, noise_px=0.0)
    err_p = np.linalg.norm(np.asarray(st.p) - p_t)
    err_v = np.linalg.norm(np.asarray(st.v) - v_t)
    assert err_p < 0.03, err_p
    assert err_v < 0.03, err_v
    # attitude error small
    dq = quat_mul(
        jnp.asarray(q_t) * jnp.array([-1.0, -1, -1, 1]), st.q)
    ang = 2 * np.arccos(min(1.0, abs(float(dq[3]))))
    assert ang < 0.02


def test_noisy_updates_stay_bounded():
    st, p_t, v_t, q_t = run_filter(n_kf=10, noise_px=1.5e-3, seed=3)
    err_p = np.linalg.norm(np.asarray(st.p) - p_t)
    assert err_p < 0.15, err_p
    # covariance of position should have contracted vs dead reckoning
    cfg = MSCKFConfig(num_clones=8, max_landmarks=24)
    p0, v0, _, q0 = circle_truth(0.0)
    dr = msckf_init(cfg, q0=q0, p0=p0, v0=v0)
    for k in range(10):
        dts, gyrs, accs = imu_measurements(k * 0.25, (k + 1) * 0.25, 50)
        dr = msckf_propagate(dr, cfg, dts, gyrs, accs)
    assert float(jnp.trace(st.P[3:6, 3:6])) < float(jnp.trace(dr.P[3:6, 3:6]))
