"""Quaternion / SO(3) / SE(3) operations, batched and jit-friendly.

Conventions
-----------
* Quaternions are stored ``[x, y, z, w]`` (Hamilton convention, xyzw memory
  layout). This matches the reference wire format where a pose parameter
  block is ``[px py pz qx qy qz qw]``
  (reference: d2common/include/d2common/d2basetypes.h POSE_SIZE=7).
* A "pose" is a flat array ``[..., 7]`` = ``[p(3), q(4)]``.
* The pose retraction (boxplus) matches the reference's
  ``PoseLocalParameterization``: position adds the first 3 tangent
  coordinates, the quaternion right-multiplies ``dq(theta) =
  [theta/2, 1]`` (reference: d2common/src/solver/pose_local_parameterization.cpp).
  Tangent layout is ``[dp(3), dtheta(3)]``.

All functions broadcast over leading batch dimensions and are safe under
``jit``/``vmap``/``grad`` (small-angle branches use Taylor expansions
selected with ``jnp.where`` on numerically-safe operands).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions (xyzw)
# ---------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32):
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_mul(q1, q2):
    """Hamilton product q1 ⊗ q2, both xyzw."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_inverse(q):
    return quat_conj(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def quat_normalize(q):
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, jnp.finfo(q.dtype).tiny)
    # canonicalize sign (w >= 0) so logs/averages are stable
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0).astype(q.dtype)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q: R(q) @ v."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_rotmat(q):
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def rotmat_to_quat(R):
    """Shepperd's method, branch-free via selecting the max-trace case."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate computations; pick the numerically best.
    def cand_w():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2  # s = 4w
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s], -1)

    def cand_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2  # s = 4x
        return jnp.stack([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s], -1)

    def cand_y():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2  # s = 4y
        return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s], -1)

    def cand_z():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2  # s = 4z
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s], -1)

    c0, c1, c2, c3 = cand_w(), cand_x(), cand_y(), cand_z()
    cond0 = tr > 0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None],
        c0,
        jnp.where(cond1[..., None], c1, jnp.where(cond2[..., None], c2, c3)),
    )
    return quat_normalize(q)


def quat_from_small_angle(theta):
    """First-order quaternion from a small rotation vector: [theta/2, 1].

    This is the retraction used throughout the reference (Utility::deltaQ).
    Not normalized exactly like the reference; we normalize for stability.
    """
    half = 0.5 * theta
    one = jnp.ones(theta.shape[:-1] + (1,), dtype=theta.dtype)
    return quat_normalize(jnp.concatenate([half, one], axis=-1))


def so3_exp_quat(theta):
    """Exact exponential map rotation-vector -> quaternion (xyzw)."""
    angle_sq = jnp.sum(theta * theta, axis=-1, keepdims=True)
    angle = jnp.sqrt(angle_sq)
    small = angle < 1e-6
    safe = jnp.where(small, jnp.ones_like(angle), angle)
    half = 0.5 * angle
    # sin(a/2)/a  with Taylor fallback 0.5 - a^2/48
    k = jnp.where(small, 0.5 - angle_sq / 48.0, jnp.sin(half) / safe)
    w = jnp.cos(half)
    return jnp.concatenate([k * theta, w], axis=-1)


def so3_log_quat(q):
    """Logarithm map quaternion -> rotation vector (angle-axis * angle).

    Hemisphere-corrected: q and -q are the same rotation, so the log
    takes the representative with w >= 0 (shortest geodesic, angle in
    [0, pi]) — otherwise a sign flip between two nearly-equal
    quaternions reads as a ~2*pi rotation.
    """
    q = quat_normalize(q)
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    qv = q[..., :3]
    qw = q[..., 3:4]
    n = jnp.linalg.norm(qv, axis=-1, keepdims=True)
    small = n < 1e-6
    safe_n = jnp.where(small, jnp.ones_like(n), n)
    angle = 2.0 * jnp.arctan2(n, qw)
    k = jnp.where(small, 2.0 / jnp.maximum(qw, 1e-12), angle / safe_n)
    return k * qv


def so3_exp(theta):
    return quat_to_rotmat(so3_exp_quat(theta))


def so3_log(R):
    return so3_log_quat(rotmat_to_quat(R))


def skew(v):
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_left_matrix(q):
    """Q_L(q) such that Q_L(q) @ p = q ⊗ p (both xyzw-with-w-last as 4-vecs).

    Layout: acts on [x,y,z,w] stacked vectors.
    """
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack([w, -z, y, x], -1)
    row1 = jnp.stack([z, w, -x, y], -1)
    row2 = jnp.stack([-y, x, w, z], -1)
    row3 = jnp.stack([-x, -y, -z, w], -1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def quat_right_matrix(q):
    """Q_R(q) such that Q_R(q) @ p = p ⊗ q."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack([w, z, -y, x], -1)
    row1 = jnp.stack([-z, w, x, y], -1)
    row2 = jnp.stack([y, -x, w, z], -1)
    row3 = jnp.stack([-x, -y, -z, w], -1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def quat_average(qs, weights=None):
    """Weighted quaternion average via the Markley eigenvector method.

    Used for consensus pose averaging (reference:
    d2common/src/solver/ConsensusSolver.cpp:166-228 averages remote pose
    copies). Robust to sign flips.

    Args:
      qs: [N, 4] quaternions (xyzw).
      weights: optional [N] nonnegative weights.
    """
    if weights is None:
        weights = jnp.ones(qs.shape[0], dtype=qs.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), jnp.finfo(qs.dtype).tiny)
    M = jnp.einsum("n,ni,nj->ij", w, qs, qs)
    # Principal eigenvector by a few power iterations (M is 4x4 PSD).
    # Seed from M itself (not a fresh constant) so the carry inherits
    # M's device-varying type under shard_map, and add a tiny constant
    # to avoid a zero seed when M is near-diagonal.
    v = jnp.sum(M, axis=1) + jnp.full((4,), 1e-3, qs.dtype)
    def body(_, v):
        v = M @ v
        return v / jnp.maximum(jnp.linalg.norm(v), jnp.finfo(qs.dtype).tiny)
    v = jax.lax.fori_loop(0, 32, body, v)
    return quat_normalize(v)


# ---------------------------------------------------------------------------
# SE(3) poses as flat [p(3), q(4)] arrays
# ---------------------------------------------------------------------------


def pose_identity(dtype=jnp.float32):
    return jnp.array([0, 0, 0, 0, 0, 0, 1], dtype=dtype)


def pose_compose(a, b):
    """a ∘ b: apply b then a (T_a @ T_b)."""
    pa, qa = a[..., :3], a[..., 3:]
    pb, qb = b[..., :3], b[..., 3:]
    return jnp.concatenate([pa + quat_rotate(qa, pb), quat_mul(qa, qb)], axis=-1)


def pose_inverse(a):
    p, q = a[..., :3], a[..., 3:]
    qi = quat_conj(quat_normalize(q))
    return jnp.concatenate([-quat_rotate(qi, p), qi], axis=-1)


def pose_apply(a, x):
    """Transform point(s) x by pose a."""
    return quat_rotate(a[..., 3:], x) + a[..., :3]


def pose_boxplus(pose, delta):
    """Retraction: [dp(3), dtheta(3)] applied to [p, q].

    Matches the reference PoseLocalParameterization: p += dp,
    q = q ⊗ dq(dtheta) with dq the first-order quaternion.
    """
    p, q = pose[..., :3], pose[..., 3:]
    dp, dth = delta[..., :3], delta[..., 3:6]
    return jnp.concatenate(
        [p + dp, quat_normalize(quat_mul(q, quat_from_small_angle(dth)))], axis=-1
    )


def pose_boxminus(a, b):
    """Tangent difference: delta such that b ⊞ delta ≈ a.

    Position: p_a - p_b. Rotation: log(q_b^{-1} ⊗ q_a).
    """
    dp = a[..., :3] - b[..., :3]
    dq = quat_mul(quat_conj(quat_normalize(b[..., 3:])), quat_normalize(a[..., 3:]))
    return jnp.concatenate([dp, so3_log_quat(dq)], axis=-1)


def pose_to_matrix(pose):
    R = quat_to_rotmat(quat_normalize(pose[..., 3:]))
    p = pose[..., :3]
    top = jnp.concatenate([R, p[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def pose_from_matrix(T):
    q = rotmat_to_quat(T[..., :3, :3])
    return jnp.concatenate([T[..., :3, 3], q], axis=-1)


def yaw_from_quat(q):
    """ZYX yaw angle of quaternion (xyzw)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def quat_from_yaw(yaw):
    half = 0.5 * yaw
    zero = jnp.zeros_like(half)
    return jnp.stack([zero, zero, jnp.sin(half), jnp.cos(half)], axis=-1)


def pose4d_boxplus(pose, delta):
    """4-DoF retraction [dx, dy, dz, dyaw] (reference PosAngleManifold).

    Keeps roll/pitch fixed: new_yaw = yaw + dyaw composed onto the
    yaw-only rotation. Used for PGO_POSE_DOF=4 mode where attitude
    roll/pitch come from VIO gravity observability.
    """
    p, q = pose[..., :3], pose[..., 3:]
    yaw = yaw_from_quat(q)
    tilt = quat_mul(quat_from_yaw(-yaw), q)  # roll/pitch-only part
    new_q = quat_mul(quat_from_yaw(yaw + delta[..., 3]), tilt)
    return jnp.concatenate([p + delta[..., :3], quat_normalize(new_q)], axis=-1)
