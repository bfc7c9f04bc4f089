"""Factor residuals: zero at ground truth, AD Jacobians vs central
finite differences (independent validation — no analytic transcription)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2slam_tpu.factors import (
    RETRACT,
    consensus_pose_residual,
    gravity_prior_residual,
    imu_residual,
    imu_sqrt_info,
    linearize_factor,
    projection_one_frame_two_cam,
    projection_depth_residual,
    projection_two_frame_one_cam,
    projection_two_frame_two_cam,
    relpose4d_residual,
    relpose_residual,
    tangent_base_of,
)
from d2slam_tpu.geometry.lie import (
    pose_boxplus,
    pose_compose,
    pose_inverse,
    quat_conj,
    quat_normalize,
    quat_rotate,
    so3_exp_quat,
)
from d2slam_tpu.imu import default_noise_matrix, preintegrate

GRAVITY = jnp.array([0.0, 0.0, 9.805])
NOISE = default_noise_matrix(0.1, 0.05, 0.002, 0.0004, dtype=jnp.float64)


def fd_jacobians(res_fn, kinds, params, *args, eps=1e-7):
    """Central finite differences through the retractions."""
    jacs = []
    r0 = np.asarray(res_fn(*params, *args))
    for bi, (kind, p) in enumerate(zip(kinds, params)):
        fn, dim = RETRACT[kind]
        if dim is None:
            dim = p.shape[-1]
        J = np.zeros((r0.shape[0], dim))
        for k in range(dim):
            d = jnp.zeros(dim, jnp.float64).at[k].set(eps)
            pp = list(params)
            pp[bi] = fn(p, d)
            rp = np.asarray(res_fn(*pp, *args))
            pp[bi] = fn(p, -d)
            rm = np.asarray(res_fn(*pp, *args))
            J[:, k] = (rp - rm) / (2 * eps)
        jacs.append(J)
    return jacs


def check_factor(res_fn, kinds, params, *args, atol=1e-5):
    r, jacs = linearize_factor(res_fn, kinds, params, *args)
    fd = fd_jacobians(res_fn, kinds, params, *args)
    for J_ad, J_fd, kind in zip(jacs, fd, kinds):
        np.testing.assert_allclose(np.asarray(J_ad), J_fd, atol=atol,
                                   err_msg=f"jacobian mismatch for {kind}")
    return r, jacs


# -------------------------------------------------------------------------
# fixtures
# -------------------------------------------------------------------------


def make_imu_setup(seed=0):
    """Two GT states joined by integrated IMU."""
    rng = np.random.default_rng(seed)
    n = 40
    dt = 0.0025
    dts = jnp.concatenate([jnp.zeros(1), jnp.full((n - 1,), dt)])
    accs = jnp.asarray(np.tile([0, 0, 9.805], (n, 1)) + rng.normal(0, 0.5, (n, 3)))
    gyrs = jnp.asarray(rng.normal(0.05, 0.2, (n, 3)))
    mask = jnp.ones(n, bool).at[0].set(False)
    ba = jnp.asarray(rng.normal(0, 0.02, 3))
    bg = jnp.asarray(rng.normal(0, 0.002, 3))
    pre = preintegrate(dts, accs, gyrs, mask, ba, bg, NOISE)

    pose_i = jnp.asarray(
        np.concatenate([rng.normal(0, 1, 3), np.asarray(quat_normalize(jnp.asarray(rng.normal(0, 1, 4))))])
    )
    vi = jnp.asarray(rng.normal(0, 0.5, 3))
    sb_i = jnp.concatenate([vi, ba, bg])
    # propagate GT to frame j using the preintegrated deltas (so residual=0)
    dtx = pre.sum_dt
    Qi = pose_i[3:]
    Pj = pose_i[:3] + vi * dtx - 0.5 * GRAVITY * dtx**2 + quat_rotate(Qi, pre.delta_p)
    Vj = vi - GRAVITY * dtx + quat_rotate(Qi, pre.delta_v)
    Qj = quat_normalize(jax.numpy.asarray(np_quat_mul(Qi, pre.delta_q)))
    pose_j = jnp.concatenate([Pj, Qj])
    sb_j = jnp.concatenate([Vj, ba, bg])
    return pose_i, sb_i, pose_j, sb_j, pre


def np_quat_mul(q1, q2):
    from d2slam_tpu.geometry.lie import quat_mul

    return quat_mul(q1, q2)


def test_imu_residual_zero_at_gt():
    pose_i, sb_i, pose_j, sb_j, pre = make_imu_setup()
    r = imu_residual(pose_i, sb_i, pose_j, sb_j, pre, GRAVITY)
    np.testing.assert_allclose(r, 0, atol=1e-10)


def test_imu_jacobians():
    pose_i, sb_i, pose_j, sb_j, pre = make_imu_setup()
    # perturb away from GT so jacobians are generic
    pose_j = pose_boxplus(pose_j, jnp.asarray(np.linspace(-0.05, 0.08, 6)))
    sb_j = sb_j + 0.01
    kinds = ("pose", "vec", "pose", "vec")
    check_factor(
        imu_residual, kinds, (pose_i, sb_i, pose_j, sb_j), pre, GRAVITY, atol=2e-6
    )


def test_imu_sqrt_info():
    _, _, _, _, pre = make_imu_setup()
    S = imu_sqrt_info(pre.covariance)
    np.testing.assert_allclose(
        np.asarray(S.T @ S), np.linalg.inv(np.asarray(pre.covariance)), rtol=2e-4
    )


def make_projection_setup(seed=1):
    rng = np.random.default_rng(seed)
    q_i = so3_exp_quat(jnp.asarray(rng.normal(0, 0.3, 3)))
    q_j = so3_exp_quat(jnp.asarray(rng.normal(0, 0.3, 3)))
    pose_i = jnp.concatenate([jnp.asarray(rng.normal(0, 1.0, 3)), q_i])
    pose_j = jnp.concatenate([jnp.asarray(rng.normal(0, 1.0, 3)), q_j])
    ext = jnp.asarray([0.05, 0.0, 0.02, 0.0, 0.0, 0.0, 1.0])
    ext_r = jnp.asarray([-0.05, 0.0, 0.02, 0.0, 0.0, 0.0, 1.0])
    # landmark 5m in front of camera i
    pt_w = jnp.asarray(rng.normal(0, 1.0, 3)) + quat_rotate(q_i, jnp.array([5.0, 0.5, 0.5]))

    def ray_of(pose, ext):
        T_cam = pose_compose(pose, ext)
        pc = quat_rotate(quat_conj(T_cam[3:]), pt_w - T_cam[:3])
        return pc / jnp.linalg.norm(pc), jnp.linalg.norm(pc)

    ray_i, dep_i = ray_of(pose_i, ext)
    ray_j, dep_j = ray_of(pose_j, ext)
    ray_jr, dep_jr = ray_of(pose_j, ext_r)
    ray_ir, _ = ray_of(pose_i, ext_r)
    inv_dep = 1.0 / dep_i
    return dict(
        pose_i=pose_i, pose_j=pose_j, ext=ext, ext_r=ext_r,
        ray_i=ray_i, ray_j=ray_j, ray_jr=ray_jr, ray_ir=ray_ir,
        inv_dep=jnp.asarray(inv_dep), dep_j=dep_j,
    )


ZERO3 = jnp.zeros(3)


def test_projection_two_frame_one_cam():
    s = make_projection_setup()
    td = jnp.asarray(0.0)
    tb = tangent_base_of(s["ray_j"])
    args = (s["ray_i"], s["ray_j"], ZERO3, ZERO3, 0.0, 0.0, tb)
    params = (s["pose_i"], s["pose_j"], s["ext"], s["inv_dep"], td)
    kinds = ("pose", "pose", "pose", "scalar", "scalar")
    r = projection_two_frame_one_cam(*params, *args)
    np.testing.assert_allclose(r, 0, atol=1e-12)
    # perturb so jacobians generic + well-scaled
    params = (
        pose_boxplus(s["pose_i"], jnp.asarray(np.linspace(-0.03, 0.05, 6))),
        s["pose_j"], s["ext"], s["inv_dep"] * 1.1, td + 0.001,
    )
    # nonzero velocities exercise the td terms
    args = (s["ray_i"], s["ray_j"], jnp.asarray([0.1, -0.2, 0.0]),
            jnp.asarray([0.05, 0.1, 0.0]), 0.002, -0.001, tb)
    check_factor(projection_two_frame_one_cam, kinds, params, *args, atol=1e-5)


def test_projection_two_frame_two_cam():
    s = make_projection_setup()
    tb = tangent_base_of(s["ray_jr"])
    td = jnp.asarray(0.0)
    params = (s["pose_i"], s["pose_j"], s["ext"], s["ext_r"], s["inv_dep"], td)
    args = (s["ray_i"], s["ray_jr"], ZERO3, ZERO3, 0.0, 0.0, tb)
    kinds = ("pose", "pose", "pose", "pose", "scalar", "scalar")
    r = projection_two_frame_two_cam(*params, *args)
    np.testing.assert_allclose(r, 0, atol=1e-12)
    params = (s["pose_i"], pose_boxplus(s["pose_j"], jnp.full(6, 0.02)),
              s["ext"], s["ext_r"], s["inv_dep"], td)
    check_factor(projection_two_frame_two_cam, kinds, params, *args, atol=1e-5)


def test_projection_one_frame_two_cam():
    s = make_projection_setup()
    tb = tangent_base_of(s["ray_ir"])
    td = jnp.asarray(0.0)
    params = (s["ext"], s["ext_r"], s["inv_dep"], td)
    args = (s["ray_i"], s["ray_ir"], ZERO3, ZERO3, 0.0, 0.0, tb)
    kinds = ("pose", "pose", "scalar", "scalar")
    r = projection_one_frame_two_cam(*params, *args)
    np.testing.assert_allclose(r, 0, atol=1e-12)
    params = (s["ext"], s["ext_r"], s["inv_dep"] * 0.9, td)
    check_factor(projection_one_frame_two_cam, kinds, params, *args, atol=1e-5)


def test_projection_depth():
    s = make_projection_setup()
    tb = tangent_base_of(s["ray_j"])
    td = jnp.asarray(0.0)
    params = (s["pose_i"], s["pose_j"], s["ext"], s["inv_dep"], td)
    args = (s["ray_i"], s["ray_j"], ZERO3, ZERO3, 0.0, 0.0, tb, s["dep_j"])
    kinds = ("pose", "pose", "pose", "scalar", "scalar")
    r = projection_depth_residual(*params, *args)
    np.testing.assert_allclose(r, 0, atol=1e-12)
    check_factor(projection_depth_residual, kinds, params, *args, atol=1e-5)


def test_consensus_factor():
    rng = np.random.default_rng(3)
    pose = jnp.concatenate([
        jnp.asarray(rng.normal(0, 1, 3)), so3_exp_quat(jnp.asarray(rng.normal(0, 0.4, 3)))
    ])
    # identical pose, zero tilde -> zero residual
    r = consensus_pose_residual(pose, pose, ZERO3, ZERO3, 1.0, 0.5)
    np.testing.assert_allclose(r, 0, atol=1e-12)
    ref = pose_boxplus(pose, jnp.asarray(np.linspace(-0.1, 0.1, 6)))
    params = (pose,)
    args = (ref, jnp.asarray([0.01, 0.02, -0.01]), jnp.asarray([0.005, -0.01, 0.02]), 0.7, 0.3)
    check_factor(consensus_pose_residual, ("pose",), params, *args, atol=1e-6)


def test_relpose_factor():
    rng = np.random.default_rng(4)
    a = jnp.concatenate([jnp.asarray(rng.normal(0, 1, 3)), so3_exp_quat(jnp.asarray(rng.normal(0, 0.4, 3)))])
    b = jnp.concatenate([jnp.asarray(rng.normal(0, 1, 3)), so3_exp_quat(jnp.asarray(rng.normal(0, 0.4, 3)))])
    meas = pose_compose(pose_inverse(a), b)
    sqrt_info = jnp.eye(6) * 2.0
    r = relpose_residual(a, b, meas, sqrt_info)
    np.testing.assert_allclose(r, 0, atol=1e-12)
    meas2 = pose_boxplus(meas, jnp.full(6, 0.03))
    check_factor(relpose_residual, ("pose", "pose"), (a, b), meas2, sqrt_info, atol=1e-5)


def test_relpose4d_factor():
    from d2slam_tpu.geometry.lie import quat_from_yaw, yaw_from_quat

    a = jnp.concatenate([jnp.asarray([1.0, 2, 3]), quat_from_yaw(jnp.asarray(0.4))])
    b = jnp.concatenate([jnp.asarray([2.0, 1, 3.5]), quat_from_yaw(jnp.asarray(-2.9))])
    # measurement = relative 4d pose
    dyaw = yaw_from_quat(b[3:]) - yaw_from_quat(a[3:])
    c, s = jnp.cos(-0.4), jnp.sin(-0.4)
    d = b[:3] - a[:3]
    dp = jnp.stack([c * d[0] - s * d[1], s * d[0] + c * d[1], d[2]])
    meas = jnp.concatenate([dp, quat_from_yaw(dyaw)])
    info = jnp.eye(4)
    r = relpose4d_residual(a, b, meas, info)
    np.testing.assert_allclose(r, 0, atol=1e-12)
    check_factor(
        relpose4d_residual, ("pose4d", "pose4d"), (a, b), meas, info, atol=1e-5
    )
    # yaw wrap: push b's yaw across -pi
    b2 = jnp.concatenate([b[:3], quat_from_yaw(jnp.asarray(3.0))])
    r2 = relpose4d_residual(a, b2, meas, info)
    assert np.all(np.abs(np.asarray(r2)[3]) < np.pi)


def test_gravity_prior():
    tilt = so3_exp_quat(jnp.asarray([0.1, -0.2, 0.0]))
    pose = jnp.concatenate([ZERO3, tilt])
    g_body = quat_rotate(quat_conj(tilt), jnp.array([0.0, 0, -1.0]))
    r = gravity_prior_residual(pose, g_body, jnp.eye(3))
    np.testing.assert_allclose(r, 0, atol=1e-12)
    check_factor(
        gravity_prior_residual, ("pose",), (pose,), g_body + 0.01, jnp.eye(3), atol=1e-6
    )
