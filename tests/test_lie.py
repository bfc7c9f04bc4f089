import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2slam_tpu.geometry import (
    pose_apply,
    pose_boxminus,
    pose_boxplus,
    pose_compose,
    pose_from_matrix,
    pose_identity,
    pose_inverse,
    pose_to_matrix,
    pose4d_boxplus,
    quat_average,
    quat_conj,
    quat_from_small_angle,
    quat_from_yaw,
    quat_identity,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_rotmat,
    rotmat_to_quat,
    skew,
    so3_exp,
    so3_exp_quat,
    so3_log,
    so3_log_quat,
    yaw_from_quat,
)

KEY = jax.random.PRNGKey(0)


def random_quats(key, n):
    q = jax.random.normal(key, (n, 4), dtype=jnp.float64)
    return quat_normalize(q)


def test_quat_mul_vs_rotmat():
    k1, k2 = jax.random.split(KEY)
    q1, q2 = random_quats(k1, 32), random_quats(k2, 32)
    R = quat_to_rotmat(quat_mul(q1, q2))
    np.testing.assert_allclose(
        R, quat_to_rotmat(q1) @ quat_to_rotmat(q2), atol=1e-12
    )


def test_quat_rotate_matches_rotmat():
    k1, k2 = jax.random.split(KEY)
    q = random_quats(k1, 16)
    v = jax.random.normal(k2, (16, 3), dtype=jnp.float64)
    np.testing.assert_allclose(
        quat_rotate(q, v),
        jnp.einsum("nij,nj->ni", quat_to_rotmat(q), v),
        atol=1e-12,
    )


def test_rotmat_quat_roundtrip():
    q = random_quats(KEY, 100)
    q2 = rotmat_to_quat(quat_to_rotmat(q))
    # sign-canonical comparison
    np.testing.assert_allclose(quat_normalize(q), quat_normalize(q2), atol=1e-9)


def test_exp_log_roundtrip():
    # roundtrip holds on the principal domain |theta| < pi
    direction = jax.random.normal(KEY, (50, 3), dtype=jnp.float64)
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    mag = jax.random.uniform(KEY, (50, 1), dtype=jnp.float64) * 3.1
    theta = direction * mag
    np.testing.assert_allclose(so3_log_quat(so3_exp_quat(theta)), theta, atol=1e-9)
    # small angles
    theta = jax.random.normal(KEY, (50, 3), dtype=jnp.float64) * 1e-8
    np.testing.assert_allclose(so3_log_quat(so3_exp_quat(theta)), theta, atol=1e-12)
    # zero
    z = jnp.zeros((3,), dtype=jnp.float64)
    np.testing.assert_allclose(so3_log_quat(so3_exp_quat(z)), z, atol=0)


def test_exp_matches_rodrigues():
    theta = jax.random.normal(KEY, (20, 3), dtype=jnp.float64)
    R = so3_exp(theta)
    angle = jnp.linalg.norm(theta, axis=-1, keepdims=True)[..., None]
    axis_hat = skew(theta / jnp.linalg.norm(theta, axis=-1, keepdims=True))
    rodrigues = (
        jnp.eye(3)
        + jnp.sin(angle) * axis_hat
        + (1 - jnp.cos(angle)) * (axis_hat @ axis_hat)
    )
    np.testing.assert_allclose(R, rodrigues, atol=1e-10)


def test_pose_compose_inverse():
    k1, k2 = jax.random.split(KEY)
    qa, qb = random_quats(k1, 8), random_quats(k2, 8)
    pa = jax.random.normal(k1, (8, 3), dtype=jnp.float64)
    pb = jax.random.normal(k2, (8, 3), dtype=jnp.float64)
    a = jnp.concatenate([pa, qa], -1)
    b = jnp.concatenate([pb, qb], -1)
    Tab = pose_to_matrix(pose_compose(a, b))
    np.testing.assert_allclose(Tab, pose_to_matrix(a) @ pose_to_matrix(b), atol=1e-10)
    ident = pose_compose(a, pose_inverse(a))
    np.testing.assert_allclose(ident[..., :3], 0, atol=1e-10)
    np.testing.assert_allclose(jnp.abs(ident[..., 6]), 1, atol=1e-10)
    # apply
    x = jax.random.normal(k1, (8, 3), dtype=jnp.float64)
    np.testing.assert_allclose(
        pose_apply(a, x),
        (pose_to_matrix(a) @ jnp.concatenate([x, jnp.ones((8, 1))], -1)[..., None])[
            ..., :3, 0
        ],
        atol=1e-10,
    )


def test_pose_matrix_roundtrip():
    q = random_quats(KEY, 8)
    p = jax.random.normal(KEY, (8, 3), dtype=jnp.float64)
    a = jnp.concatenate([p, q], -1)
    a2 = pose_from_matrix(pose_to_matrix(a))
    np.testing.assert_allclose(pose_to_matrix(a2), pose_to_matrix(a), atol=1e-9)


def test_boxplus_boxminus():
    q = random_quats(KEY, 8)
    p = jax.random.normal(KEY, (8, 3), dtype=jnp.float64)
    a = jnp.concatenate([p, q], -1)
    delta = jax.random.normal(KEY, (8, 6), dtype=jnp.float64) * 0.02
    b = pose_boxplus(a, delta)
    rec = pose_boxminus(b, a)
    # first-order retraction: recovered tangent close for small delta
    # (error is O(|dtheta|^3/12) from the [theta/2, 1] quaternion)
    np.testing.assert_allclose(rec[:, :3], delta[:, :3], atol=1e-12)
    np.testing.assert_allclose(rec[:, 3:], delta[:, 3:], atol=1e-4)
    # boxminus(a, a) == 0 exactly
    np.testing.assert_allclose(pose_boxminus(a, a), 0, atol=1e-12)


def test_quat_average():
    # average of identical quats = that quat
    q = random_quats(KEY, 1)[0]
    qs = jnp.tile(q, (5, 1)) * jnp.array([[1], [-1], [1], [1], [-1]], dtype=jnp.float64)
    avg = quat_average(qs)
    assert (
        np.abs(np.dot(np.asarray(avg), np.asarray(q))) > 1 - 1e-9
    )
    # average of small perturbations stays near identity
    theta = jax.random.normal(KEY, (64, 3), dtype=jnp.float64) * 0.05
    qs = so3_exp_quat(theta)
    avg = quat_average(qs)
    assert np.abs(np.asarray(avg)[3]) > 0.999


def test_yaw():
    yaw = jnp.array([0.3, -2.5, 3.1], dtype=jnp.float64)
    np.testing.assert_allclose(yaw_from_quat(quat_from_yaw(yaw)), yaw, atol=1e-12)


def test_pose4d_boxplus_keeps_tilt():
    # start with a tilted pose, apply yaw delta, tilt (gravity dir) preserved
    tilt = so3_exp_quat(jnp.array([0.2, -0.1, 0.0], dtype=jnp.float64))
    q = quat_mul(quat_from_yaw(jnp.array(0.7, dtype=jnp.float64)), tilt)
    pose = jnp.concatenate([jnp.array([1.0, 2, 3]), q])
    delta = jnp.array([0.1, 0.2, 0.3, 0.5], dtype=jnp.float64)
    new = pose4d_boxplus(pose, delta)
    np.testing.assert_allclose(new[:3], pose[:3] + delta[:3], atol=1e-12)
    np.testing.assert_allclose(
        yaw_from_quat(new[3:]), yaw_from_quat(pose[3:]) + 0.5, atol=1e-9
    )
    # gravity direction in body frame unchanged
    g = jnp.array([0.0, 0, -1])
    g_body_old = quat_rotate(quat_conj(pose[3:]), g)
    g_body_new = quat_rotate(quat_conj(new[3:]), g)
    np.testing.assert_allclose(g_body_new, g_body_old, atol=1e-9)


def test_jit_vmap_compat():
    f = jax.jit(jax.vmap(lambda a, b: pose_boxminus(pose_compose(a, b), a)))
    q = random_quats(KEY, 4)
    p = jax.random.normal(KEY, (4, 3), dtype=jnp.float64)
    a = jnp.concatenate([p, q], -1)
    out = f(a, jnp.tile(pose_identity(jnp.float64), (4, 1)))
    np.testing.assert_allclose(out, 0, atol=1e-12)
