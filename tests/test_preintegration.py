"""Preintegration validated against an independent numpy implementation
and finite-difference bias Jacobians."""
import jax
import jax.numpy as jnp
import numpy as np

from d2slam_tpu.imu import (
    IMUBuffer,
    default_noise_matrix,
    imu_propagate_pose,
    preintegrate,
)
from d2slam_tpu.geometry.lie import quat_conj, quat_mul, quat_normalize

GRAVITY = np.array([0.0, 0.0, 9.805])  # world gravity magnitude (measured up)


def _np_quat_mul(q1, q2):
    x1, y1, z1, w1 = q1
    x2, y2, z2, w2 = q2
    return np.array(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ]
    )


def _np_rot(q):
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def np_preintegrate(dts, accs, gyrs, mask, ba, bg):
    """Straight-line numpy midpoint preintegration (delta only)."""
    dp = np.zeros(3)
    dq = np.array([0.0, 0, 0, 1])
    dv = np.zeros(3)
    acc0, gyr0 = accs[0].copy(), gyrs[0].copy()
    for i in range(1, len(dts)):
        if not mask[i]:
            continue
        dt, acc1, gyr1 = dts[i], accs[i], gyrs[i]
        un_acc_0 = _np_rot(dq) @ (acc0 - ba)
        un_gyr = 0.5 * (gyr0 + gyr1) - bg
        half = un_gyr * dt / 2
        dq_new = _np_quat_mul(dq, np.array([half[0], half[1], half[2], 1.0]))
        dq_new = dq_new / np.linalg.norm(dq_new)
        un_acc_1 = _np_rot(dq_new) @ (acc1 - ba)
        un_acc = 0.5 * (un_acc_0 + un_acc_1)
        dp = dp + dv * dt + 0.5 * un_acc * dt * dt
        dv = dv + un_acc * dt
        dq = dq_new
        acc0, gyr0 = acc1, gyr1
    return dp, dq, dv


def make_samples(n=40, seed=0, dt=0.0025):
    rng = np.random.default_rng(seed)
    dts = np.full(n, dt)
    dts[0] = 0.0
    # body at a slight attitude, rotating and accelerating
    accs = np.tile(GRAVITY, (n, 1)) + rng.normal(0, 0.4, (n, 3))
    gyrs = rng.normal(0.1, 0.3, (n, 3))
    mask = np.ones(n, bool)
    mask[0] = False
    return (
        jnp.asarray(dts),
        jnp.asarray(accs),
        jnp.asarray(gyrs),
        jnp.asarray(mask),
    )


NOISE = default_noise_matrix(0.1, 0.05, 0.002, 0.0004, dtype=jnp.float64)


def test_matches_numpy_reference():
    dts, accs, gyrs, mask = make_samples()
    ba = jnp.array([0.01, -0.02, 0.005])
    bg = jnp.array([0.002, 0.001, -0.003])
    out = preintegrate(dts, accs, gyrs, mask, ba, bg, NOISE)
    dp, dq, dv = np_preintegrate(
        np.asarray(dts), np.asarray(accs), np.asarray(gyrs), np.asarray(mask),
        np.asarray(ba), np.asarray(bg),
    )
    np.testing.assert_allclose(out.delta_p, dp, atol=1e-12)
    np.testing.assert_allclose(out.delta_v, dv, atol=1e-12)
    assert abs(np.dot(np.asarray(out.delta_q), dq)) > 1 - 1e-12
    np.testing.assert_allclose(out.sum_dt, np.sum(np.asarray(dts)[1:]), atol=1e-12)


def test_padding_invariance():
    dts, accs, gyrs, mask = make_samples(n=40)
    ba = bg = jnp.zeros(3)
    out1 = preintegrate(dts, accs, gyrs, mask, ba, bg, NOISE)
    # pad to 64 with garbage in masked-out slots
    pad = 24
    dts2 = jnp.concatenate([dts, jnp.full((pad,), 99.0)])
    accs2 = jnp.concatenate([accs, jnp.full((pad, 3), 123.0)])
    gyrs2 = jnp.concatenate([gyrs, jnp.full((pad, 3), -55.0)])
    mask2 = jnp.concatenate([mask, jnp.zeros(pad, bool)])
    out2 = preintegrate(dts2, accs2, gyrs2, mask2, ba, bg, NOISE)
    np.testing.assert_allclose(out2.delta_p, out1.delta_p, atol=1e-12)
    np.testing.assert_allclose(out2.delta_q, out1.delta_q, atol=1e-12)
    np.testing.assert_allclose(out2.covariance, out1.covariance, atol=1e-12)


def test_bias_jacobian_finite_difference():
    dts, accs, gyrs, mask = make_samples()
    ba = jnp.array([0.01, -0.02, 0.005])
    bg = jnp.array([0.002, 0.001, -0.003])
    out = preintegrate(dts, accs, gyrs, mask, ba, bg, NOISE)
    J = np.asarray(out.jacobian)
    eps = 1e-6

    num_dp_dba = np.zeros((3, 3))
    num_dv_dba = np.zeros((3, 3))
    num_dp_dbg = np.zeros((3, 3))
    num_dv_dbg = np.zeros((3, 3))
    num_dq_dbg = np.zeros((3, 3))
    for k in range(3):
        dba = jnp.zeros(3).at[k].set(eps)
        o2 = preintegrate(dts, accs, gyrs, mask, ba + dba, bg, NOISE)
        num_dp_dba[:, k] = (np.asarray(o2.delta_p) - np.asarray(out.delta_p)) / eps
        num_dv_dba[:, k] = (np.asarray(o2.delta_v) - np.asarray(out.delta_v)) / eps
        o3 = preintegrate(dts, accs, gyrs, mask, ba, bg + dba, NOISE)
        num_dp_dbg[:, k] = (np.asarray(o3.delta_p) - np.asarray(out.delta_p)) / eps
        num_dv_dbg[:, k] = (np.asarray(o3.delta_v) - np.asarray(out.delta_v)) / eps
        dq_err = quat_mul(quat_conj(out.delta_q), o3.delta_q)
        num_dq_dbg[:, k] = 2.0 * np.asarray(dq_err)[:3] / eps

    # the propagated jacobian is itself first-order; FD at eps=1e-6 agrees
    np.testing.assert_allclose(J[0:3, 9:12], num_dp_dba, atol=1e-5)
    np.testing.assert_allclose(J[6:9, 9:12], num_dv_dba, atol=1e-5)
    np.testing.assert_allclose(J[0:3, 12:15], num_dp_dbg, atol=1e-4)
    np.testing.assert_allclose(J[6:9, 12:15], num_dv_dbg, atol=1e-4)
    np.testing.assert_allclose(J[3:6, 12:15], num_dq_dbg, atol=1e-4)


def test_covariance_psd_and_growth():
    dts, accs, gyrs, mask = make_samples(n=60)
    out = preintegrate(dts, accs, gyrs, mask, jnp.zeros(3), jnp.zeros(3), NOISE)
    P = np.asarray(out.covariance)
    np.testing.assert_allclose(P, P.T, atol=1e-15)
    eig = np.linalg.eigvalsh(P)
    assert eig.min() > -1e-15
    assert eig.max() > 0


def test_vmap_batching():
    batches = [make_samples(seed=s) for s in range(4)]
    dts = jnp.stack([b[0] for b in batches])
    accs = jnp.stack([b[1] for b in batches])
    gyrs = jnp.stack([b[2] for b in batches])
    mask = jnp.stack([b[3] for b in batches])
    ba = jnp.zeros((4, 3))
    bg = jnp.zeros((4, 3))
    out = jax.vmap(preintegrate, in_axes=(0, 0, 0, 0, 0, 0, None))(
        dts, accs, gyrs, mask, ba, bg, NOISE
    )
    single = preintegrate(dts[2], accs[2], gyrs[2], mask[2], ba[2], bg[2], NOISE)
    np.testing.assert_allclose(out.delta_p[2], single.delta_p, atol=1e-14)
    np.testing.assert_allclose(out.covariance[2], single.covariance, atol=1e-14)


def test_propagate_static_gravity():
    # stationary IMU measuring exactly gravity: pose should not move
    n = 50
    dts = jnp.full((n,), 0.0025)
    accs = jnp.tile(jnp.asarray(GRAVITY), (n, 1))
    gyrs = jnp.zeros((n, 3))
    mask = jnp.ones(n, bool)
    pose = jnp.array([0.0, 0, 0, 0, 0, 0, 1])
    vel = jnp.zeros(3)
    new_pose, new_vel = imu_propagate_pose(
        pose, vel, jnp.zeros(3), jnp.zeros(3), dts, accs, gyrs, mask,
        jnp.asarray(-GRAVITY),
    )
    np.testing.assert_allclose(new_pose, pose, atol=1e-12)
    np.testing.assert_allclose(new_vel, 0, atol=1e-12)


def test_imu_buffer_period():
    buf = IMUBuffer()
    for i in range(100):
        t = i * 0.0025
        buf.add(t, GRAVITY + i * 0.001, [0.0, 0, 0.01 * i])
    dts, accs, gyrs, mask = buf.period(0.01, 0.05, pad_to=32)
    assert mask[0] == False  # noqa: E712  (seed slot)
    np.testing.assert_allclose(dts[mask].sum(), 0.04, atol=1e-9)
    # closest search
    assert buf.search_closest(0.0251) == 10
    assert buf.search_closest(-1.0) == 0
    assert buf.search_closest(10.0) == 99
