"""IMU midpoint preintegration on the manifold, as a pure batched function.

Re-expresses the VINS-Mono-style preintegration used by the reference
(reference: d2common/include/d2common/integration_base.h:95-227) in
functional JAX form:

* The preintegrated delta (dp, dq, dv), the 15x15 bias Jacobian and the
  15x15 covariance are a **pure function** of the padded IMU sample
  arrays and the linearization biases. "Repropagation" on bias update
  (reference ``repropagate``, integration_base.h:79-93) is therefore just
  calling :func:`preintegrate` again — XLA-compiled, batched over all
  sliding-window intervals at once with ``vmap``.
* Samples are padded to a static length with a validity mask, so the
  whole sliding window preintegrates as one ``[W, N, ...]`` batch.

State ordering matches the reference (StateOrder): P(0:3), R(3:6),
V(6:9), BA(9:12), BG(12:15). Noise ordering (NoiseOrder): AN(0:3),
GN(3:6), AN1(6:9), GN1(9:12), AW(12:15), GW(15:18).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from d2slam_tpu.geometry.lie import (
    quat_from_small_angle,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_rotmat,
    skew,
)

# StateOrder offsets
O_P, O_R, O_V, O_BA, O_BG = 0, 3, 6, 9, 12


class PreintegrationResult(NamedTuple):
    """Preintegrated IMU quantities between two frames.

    All fields support leading batch dimensions.
    """

    delta_p: jax.Array  # [..., 3]
    delta_q: jax.Array  # [..., 4] xyzw
    delta_v: jax.Array  # [..., 3]
    jacobian: jax.Array  # [..., 15, 15] d(state)/d(bias at linearization)
    covariance: jax.Array  # [..., 15, 15]
    sum_dt: jax.Array  # [...]
    linearized_ba: jax.Array  # [..., 3]
    linearized_bg: jax.Array  # [..., 3]


def default_noise_matrix(acc_n, gyr_n, acc_w, gyr_w, dtype=jnp.float32):
    """18x18 diagonal noise matrix (reference integration_base noise static)."""
    d = jnp.concatenate(
        [
            jnp.full((3,), acc_n**2),
            jnp.full((3,), gyr_n**2),
            jnp.full((3,), acc_n**2),
            jnp.full((3,), gyr_n**2),
            jnp.full((3,), acc_w**2),
            jnp.full((3,), gyr_w**2),
        ]
    ).astype(dtype)
    return jnp.diag(d)


def preintegrate(
    dts, accs, gyrs, mask, linearized_ba, linearized_bg, noise
) -> PreintegrationResult:
    """Preintegrate one interval of IMU samples.

    Args:
      dts:  [N] time deltas. ``dts[i]`` is the gap between sample i-1 and i;
            the first valid sample should carry dt to integrate from the
            frame time (reference pushes samples with their dt).
      accs: [N, 3] accelerometer samples. ``accs[0]`` plays the role of the
            reference's ``acc_0`` seed sample (its dt is ignored — set
            ``mask[0]=False`` if it is only the seed, matching the
            reference where ``buf[0]`` seeds acc_0/gyr_0 and is also
            push_back'ed; we keep the seed separate for clarity).
      gyrs: [N, 3] gyro samples.
      mask: [N] bool — True for samples that advance the integration.
            Sample 0 must be the seed (mask[0] is ignored; it is never
            integrated, it only initializes acc_0/gyr_0).
      linearized_ba/bg: [3] biases at linearization.
      noise: [18, 18] noise matrix from :func:`default_noise_matrix`.

    Returns a :class:`PreintegrationResult`. ``vmap`` over a leading axis
    for whole-window batches.
    """
    dtype = accs.dtype
    I3 = jnp.eye(3, dtype=dtype)

    def step(carry, inp):
        dp, dq, dv, J, P, acc0, gyr0, sum_dt = carry
        dt, acc1, gyr1, valid = inp

        un_acc_0 = quat_rotate(dq, acc0 - linearized_ba)
        un_gyr = 0.5 * (gyr0 + gyr1) - linearized_bg
        result_dq = quat_normalize(quat_mul(dq, quat_from_small_angle(un_gyr * dt)))
        un_acc_1 = quat_rotate(result_dq, acc1 - linearized_ba)
        un_acc = 0.5 * (un_acc_0 + un_acc_1)
        result_dp = dp + dv * dt + 0.5 * un_acc * dt * dt
        result_dv = dv + un_acc * dt

        # Jacobian/covariance propagation (integration_base.h:114-167)
        R_w_x = skew(un_gyr)
        R_a_0_x = skew(acc0 - linearized_ba)
        R_a_1_x = skew(acc1 - linearized_ba)
        R0 = quat_to_rotmat(dq)
        R1 = quat_to_rotmat(result_dq)

        F = jnp.zeros((15, 15), dtype)
        F = F.at[O_P:O_P+3, O_P:O_P+3].set(I3)
        F = F.at[O_P:O_P+3, O_R:O_R+3].set(
            -0.25 * R0 @ R_a_0_x * dt * dt
            + -0.25 * R1 @ R_a_1_x @ (I3 - R_w_x * dt) * dt * dt
        )
        F = F.at[O_P:O_P+3, O_V:O_V+3].set(I3 * dt)
        F = F.at[O_P:O_P+3, O_BA:O_BA+3].set(-0.25 * (R0 + R1) * dt * dt)
        F = F.at[O_P:O_P+3, O_BG:O_BG+3].set(-0.25 * R1 @ R_a_1_x * dt * dt * -dt)
        F = F.at[O_R:O_R+3, O_R:O_R+3].set(I3 - R_w_x * dt)
        F = F.at[O_R:O_R+3, O_BG:O_BG+3].set(-I3 * dt)
        F = F.at[O_V:O_V+3, O_R:O_R+3].set(
            -0.5 * R0 @ R_a_0_x * dt
            + -0.5 * R1 @ R_a_1_x @ (I3 - R_w_x * dt) * dt
        )
        F = F.at[O_V:O_V+3, O_V:O_V+3].set(I3)
        F = F.at[O_V:O_V+3, O_BA:O_BA+3].set(-0.5 * (R0 + R1) * dt)
        F = F.at[O_V:O_V+3, O_BG:O_BG+3].set(-0.5 * R1 @ R_a_1_x * dt * -dt)
        F = F.at[O_BA:O_BA+3, O_BA:O_BA+3].set(I3)
        F = F.at[O_BG:O_BG+3, O_BG:O_BG+3].set(I3)

        V = jnp.zeros((15, 18), dtype)
        V = V.at[O_P:O_P+3, 0:3].set(0.25 * R0 * dt * dt)
        v03 = 0.25 * -R1 @ R_a_1_x * dt * dt * 0.5 * dt
        V = V.at[O_P:O_P+3, 3:6].set(v03)
        V = V.at[O_P:O_P+3, 6:9].set(0.25 * R1 * dt * dt)
        V = V.at[O_P:O_P+3, 9:12].set(v03)
        V = V.at[O_R:O_R+3, 3:6].set(0.5 * I3 * dt)
        V = V.at[O_R:O_R+3, 9:12].set(0.5 * I3 * dt)
        V = V.at[O_V:O_V+3, 0:3].set(0.5 * R0 * dt)
        v63 = 0.5 * -R1 @ R_a_1_x * dt * 0.5 * dt
        V = V.at[O_V:O_V+3, 3:6].set(v63)
        V = V.at[O_V:O_V+3, 6:9].set(0.5 * R1 * dt)
        V = V.at[O_V:O_V+3, 9:12].set(v63)
        V = V.at[O_BA:O_BA+3, 12:15].set(I3 * dt)
        V = V.at[O_BG:O_BG+3, 15:18].set(I3 * dt)

        result_J = F @ J
        result_P = F @ P @ F.T + V @ noise.astype(dtype) @ V.T

        # freeze state for padded samples
        def sel(new, old):
            return jnp.where(valid, new, old)

        new_carry = (
            sel(result_dp, dp),
            sel(result_dq, dq),
            sel(result_dv, dv),
            jnp.where(valid, result_J, J),
            jnp.where(valid, result_P, P),
            sel(acc1, acc0),
            sel(gyr1, gyr0),
            jnp.where(valid, sum_dt + dt, sum_dt),
        )
        return new_carry, None

    init = (
        jnp.zeros(3, dtype),
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype),
        jnp.zeros(3, dtype),
        jnp.eye(15, dtype=dtype),
        jnp.zeros((15, 15), dtype),
        accs[0],
        gyrs[0],
        jnp.zeros((), dtype),
    )
    # Sample 0 seeds acc_0/gyr_0; integration consumes samples 1..N-1.
    xs = (dts[1:], accs[1:], gyrs[1:], mask[1:])
    (dp, dq, dv, J, P, _, _, sum_dt), _ = jax.lax.scan(step, init, xs)
    return PreintegrationResult(
        delta_p=dp,
        delta_q=dq,
        delta_v=dv,
        jacobian=J,
        covariance=P,
        sum_dt=sum_dt,
        linearized_ba=linearized_ba,
        linearized_bg=linearized_bg,
    )


@jax.jit  # host-rate path: eager scan tracing costs ~100 ms/call
def imu_propagate_pose(pose, vel, ba, bg, dts, accs, gyrs, mask, gravity):
    """Euler-propagate odometry through raw IMU samples.

    TPU equivalent of the reference's IMU-rate propagation used for
    motion prediction and high-rate odometry output
    (reference: d2common/src/d2imu.cpp IMUBuffer::propagation and
    d2vins/src/estimator/d2estimator.cpp:978-996 getMotionPredict).

    Args:
      pose: [7] world pose; vel: [3] world velocity.
      gravity: [3] gravity vector in world frame (e.g. [0,0,-9.805] sign
        convention: measured specific force = R^T(a_w - g)).
    Returns (pose, vel) after integrating valid samples.
    """
    def step(carry, inp):
        p, q, v = carry
        dt, acc, gyr, valid = inp
        # midpoint on rotation, euler on velocity (matches reference
        # IMUBuffer::propagation semantics)
        un_gyr = gyr - bg
        q_new = quat_normalize(quat_mul(q, quat_from_small_angle(un_gyr * dt)))
        acc_w = quat_rotate(q, acc - ba) + gravity
        v_new = v + acc_w * dt
        p_new = p + v * dt + 0.5 * acc_w * dt * dt
        sel = lambda a, b: jnp.where(valid, a, b)
        return (sel(p_new, p), sel(q_new, q), sel(v_new, v)), None

    (p, q, v), _ = jax.lax.scan(
        step, (pose[:3], pose[3:], vel), (dts, accs, gyrs, mask)
    )
    return jnp.concatenate([p, q]), v
