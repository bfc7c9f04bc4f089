"""Residual functions for the VIO / PGO factor library.

Each function maps (parameter blocks..., measurement data...) -> residual
vector. They are pure, unbatched, and `vmap`-able; Jacobians are obtained
with :func:`d2slam_tpu.factors.linearize.linearize_factor` (forward-mode
AD through the manifold retraction), which reproduces the reference's
analytic tangent-space Jacobians exactly.

Reference semantics:
* IMU factor: d2vins/src/factors/imu_factor.h (15-dof residual, sqrt-info
  from LLT of the preintegration covariance inverse).
* Projection family: unit-sphere (tangent-base) reprojection with
  time-offset correction via landmark image velocity
  (d2vins/src/factors/projectionTwoFrameOneCamFactor.cpp:34-120 and
  siblings: TwoFrameTwoCam, OneFrameTwoCam, TwoFrameOneCamDepth).
* Consensus factor: d2common/src/solver/consenus_factor.cpp (ADMM local
  penalty vs reference pose + accumulated dual).
* Relative pose factors: d2common/include/d2common/solver/RelPoseFactor.hpp
  (6-DoF and 4-DoF x,y,z,yaw variants used by D2PGO).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from d2slam_tpu.geometry.lie import (
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_rotmat,
    so3_log_quat,
    yaw_from_quat,
)

# ---------------------------------------------------------------------------
# IMU factor
# ---------------------------------------------------------------------------


def imu_residual(pose_i, sb_i, pose_j, sb_j, pre, gravity):
    """15-dof preintegration residual.

    Args:
      pose_i/j: [7] world poses. sb_i/j: [9] = [v(3), ba(3), bg(3)].
      pre: PreintegrationResult (delta_p/q/v, jacobian, linearized biases).
      gravity: [3] gravity magnitude vector, positive up convention
        (reference uses IMUData::Gravity = (0,0,9.805) in
        integration_base.h:221-223).
    Returns: [15] residual ordered [r_p, r_theta, r_v, r_ba, r_bg].
    """
    Pi, Qi = pose_i[:3], quat_normalize(pose_i[3:])
    Pj, Qj = pose_j[:3], quat_normalize(pose_j[3:])
    Vi, Bai, Bgi = sb_i[:3], sb_i[3:6], sb_i[6:9]
    Vj, Baj, Bgj = sb_j[:3], sb_j[3:6], sb_j[6:9]
    dt = pre.sum_dt
    J = pre.jacobian
    dba = Bai - pre.linearized_ba
    dbg = Bgi - pre.linearized_bg

    dp_dba, dp_dbg = J[0:3, 9:12], J[0:3, 12:15]
    dq_dbg = J[3:6, 12:15]
    dv_dba, dv_dbg = J[6:9, 9:12], J[6:9, 12:15]

    theta_corr = dq_dbg @ dbg
    corrected_dq = quat_normalize(
        quat_mul(
            pre.delta_q,
            jnp.concatenate([0.5 * theta_corr, jnp.ones(1, pre.delta_q.dtype)]),
        )
    )
    corrected_dv = pre.delta_v + dv_dba @ dba + dv_dbg @ dbg
    corrected_dp = pre.delta_p + dp_dba @ dba + dp_dbg @ dbg

    Qi_inv = quat_conj(Qi)
    r_p = quat_rotate(Qi_inv, 0.5 * gravity * dt * dt + Pj - Pi - Vi * dt) - corrected_dp
    q_err = quat_mul(quat_conj(corrected_dq), quat_mul(Qi_inv, Qj))
    r_theta = 2.0 * q_err[:3]
    r_v = quat_rotate(Qi_inv, gravity * dt + Vj - Vi) - corrected_dv
    return jnp.concatenate([r_p, r_theta, r_v, Baj - Bai, Bgj - Bgi])


def imu_sqrt_info(covariance, jitter=1e-12):
    """Upper-triangular S with S^T S = covariance^{-1}.

    Matches the reference's
    ``LLT(covariance.inverse()).matrixL().transpose()``
    (imu_factor.h:40-44). Computed via Cholesky of the covariance and
    triangular inversion for stability.
    """
    n = covariance.shape[-1]
    eye = jnp.eye(n, dtype=covariance.dtype)
    # jitter scaled to the covariance magnitude (eigenvalues span ~9
    # decades after a short interval; an absolute floor would distort
    # the stiff modes). The tiny absolute term keeps the result finite
    # for all-zero covariances (empty padded intervals — their rows are
    # masked later, but NaN * 0 would still poison the system).
    scale = jnp.trace(covariance) / n + jnp.asarray(1e-12, covariance.dtype)
    L = jnp.linalg.cholesky(covariance + jitter * scale * eye)
    # covariance^{-1} = L^{-T} L^{-1}; S = L^{-1} (lower) satisfies
    # S^T S = L^{-T} L^{-1}. Any square root is valid for least squares.
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return Linv


# ---------------------------------------------------------------------------
# Visual projection factors (unit-sphere + time offset)
# ---------------------------------------------------------------------------


def tangent_base_of(pt_unit):
    """2x3 tangent basis at a unit-sphere point (reference
    projectionTwoFrameOneCamFactor.cpp:35-43)."""
    a = pt_unit / jnp.linalg.norm(pt_unit)
    tmp = jnp.where(
        jnp.abs(a[2]) > 0.999,
        jnp.array([1.0, 0.0, 0.0], a.dtype),
        jnp.array([0.0, 0.0, 1.0], a.dtype),
    )
    b1 = tmp - a * jnp.dot(a, tmp)
    b1 = b1 / jnp.linalg.norm(b1)
    b2 = jnp.cross(a, b1)
    return jnp.stack([b1, b2])


def projection_residual(pts_cam_j, pts_j_td, tangent_base):
    """Unit-sphere reprojection error of a predicted camera-frame point
    against the (td-corrected) observed ray."""
    pred = pts_cam_j / jnp.maximum(
        jnp.linalg.norm(pts_cam_j), jnp.asarray(1e-12, pts_cam_j.dtype)
    )
    obs = pts_j_td / jnp.maximum(
        jnp.linalg.norm(pts_j_td), jnp.asarray(1e-12, pts_j_td.dtype)
    )
    return tangent_base @ (pred - obs)


def _point_world_from_anchor(pose_i, ext_i, inv_dep, pt_i_td):
    pts_cam_i = pt_i_td / jnp.maximum(inv_dep, jnp.asarray(1e-6, pt_i_td.dtype))
    pts_imu_i = quat_rotate(ext_i[3:], pts_cam_i) + ext_i[:3]
    return quat_rotate(pose_i[3:], pts_imu_i) + pose_i[:3]


def _point_cam_from_world(pose_j, ext_j, pts_w):
    pts_imu_j = quat_rotate(quat_conj(quat_normalize(pose_j[3:])), pts_w - pose_j[:3])
    return quat_rotate(quat_conj(quat_normalize(ext_j[3:])), pts_imu_j - ext_j[:3])


def projection_two_frame_one_cam(
    pose_i, pose_j, ext, inv_dep, td,
    pts_i, pts_j, vel_i, vel_j, td_i, td_j, tangent_base,
):
    """Landmark seen by the same camera in frames i (anchor) and j.

    All pts are unit-sphere rays; velocities are image-ray velocities for
    time-offset correction (reference projectionTwoFrameOneCamFactor).
    """
    pts_i_td = pts_i - (td - td_i) * vel_i
    pts_j_td = pts_j - (td - td_j) * vel_j
    pts_w = _point_world_from_anchor(pose_i, ext, inv_dep, pts_i_td)
    pts_cam_j = _point_cam_from_world(pose_j, ext, pts_w)
    return projection_residual(pts_cam_j, pts_j_td, tangent_base)


def projection_two_frame_two_cam(
    pose_i, pose_j, ext_i, ext_j, inv_dep, td,
    pts_i, pts_j, vel_i, vel_j, td_i, td_j, tangent_base,
):
    """Anchor camera in frame i, different camera in frame j (e.g. left->right
    across time; reference projectionTwoFrameTwoCamFactor)."""
    pts_i_td = pts_i - (td - td_i) * vel_i
    pts_j_td = pts_j - (td - td_j) * vel_j
    pts_w = _point_world_from_anchor(pose_i, ext_i, inv_dep, pts_i_td)
    pts_cam_j = _point_cam_from_world(pose_j, ext_j, pts_w)
    return projection_residual(pts_cam_j, pts_j_td, tangent_base)


def projection_one_frame_two_cam(
    ext_i, ext_j, inv_dep, td,
    pts_i, pts_j, vel_i, vel_j, td_i, td_j, tangent_base,
):
    """Stereo observation within one frame (reference
    projectionOneFrameTwoCamFactor) — pose cancels, constrains extrinsics
    and inverse depth."""
    pts_i_td = pts_i - (td - td_i) * vel_i
    pts_j_td = pts_j - (td - td_j) * vel_j
    pts_cam_i = pts_i_td / jnp.maximum(inv_dep, jnp.asarray(1e-6, pts_i.dtype))
    pts_imu = quat_rotate(ext_i[3:], pts_cam_i) + ext_i[:3]
    pts_cam_j = quat_rotate(quat_conj(quat_normalize(ext_j[3:])), pts_imu - ext_j[:3])
    return projection_residual(pts_cam_j, pts_j_td, tangent_base)


def projection_depth_residual(
    pose_i, pose_j, ext, inv_dep, td,
    pts_i, pts_j, vel_i, vel_j, td_i, td_j, tangent_base, dep_j,
):
    """Two-frame projection + measured depth in frame j: 3-dof residual
    [unit-sphere(2), depth error(1)] (reference
    projectionTwoFrameOneCamDepthFactor)."""
    pts_i_td = pts_i - (td - td_i) * vel_i
    pts_j_td = pts_j - (td - td_j) * vel_j
    pts_w = _point_world_from_anchor(pose_i, ext, inv_dep, pts_i_td)
    pts_cam_j = _point_cam_from_world(pose_j, ext, pts_w)
    r2 = projection_residual(pts_cam_j, pts_j_td, tangent_base)
    r_dep = jnp.linalg.norm(pts_cam_j) - dep_j
    return jnp.concatenate([r2, r_dep[None]])


# ---------------------------------------------------------------------------
# Consensus / relative-pose factors (ADMM, PGO)
# ---------------------------------------------------------------------------


def consensus_pose_residual(pose, pose_ref, t_tilde, theta_tilde, rho_T, rho_theta):
    """ADMM consensus penalty on a pose vs the averaged reference plus
    accumulated scaled dual (reference consenus_factor.cpp:20-52).

    residual[0:3] = rho_T   * (R_ref^T (p - p_ref) + t_tilde)
    residual[3:6] = rho_theta * (2 vec(q_ref^{-1} q) + theta_tilde)
    (note: the reference names the sqrt-infos swapped; semantics kept.)
    """
    q_ref = quat_normalize(pose_ref[3:])
    q_err = quat_mul(quat_conj(q_ref), quat_normalize(pose[3:]))
    # hemisphere correction: local and reference quaternions may sit on
    # opposite signs of the double cover (per-robot rot-init / Markley
    # averaging both have arbitrary sign); penalize the short geodesic
    q_err = q_err * jnp.where(q_err[3] < 0, -1.0, 1.0)
    r_theta = rho_theta * (2.0 * q_err[:3] + theta_tilde)
    r_t = rho_T * (
        quat_rotate(quat_conj(q_ref), pose[:3] - pose_ref[:3]) + t_tilde
    )
    return jnp.concatenate([r_t, r_theta])


def relpose_residual(pose_a, pose_b, rel_pose_meas, sqrt_info):
    """6-DoF relative pose factor: residual of T_a^{-1} T_b vs measurement,
    [dp(3), dtheta(3)] weighted by a [6,6] sqrt-info (reference
    RelPoseFactor / loop edges, ego-motion edges in D2PGO)."""
    qa = quat_normalize(pose_a[3:])
    dp_est = quat_rotate(quat_conj(qa), pose_b[:3] - pose_a[:3])
    dq_est = quat_mul(quat_conj(qa), quat_normalize(pose_b[3:]))
    dq_err = quat_mul(quat_conj(quat_normalize(rel_pose_meas[3:])), dq_est)
    r = jnp.concatenate([dp_est - rel_pose_meas[:3], so3_log_quat(dq_err)])
    return sqrt_info @ r


def relpose4d_residual(pose_a, pose_b, rel_pose_meas, sqrt_info_4):
    """4-DoF (x,y,z,yaw) relative pose factor (reference RelPoseFactor4D,
    used with PGO_POSE_DOF=4): position residual in a's yaw-only frame and
    wrapped yaw difference."""
    yaw_a = yaw_from_quat(pose_a[3:])
    yaw_b = yaw_from_quat(pose_b[3:])
    c, s = jnp.cos(-yaw_a), jnp.sin(-yaw_a)
    d = pose_b[:3] - pose_a[:3]
    dp_est = jnp.stack([c * d[0] - s * d[1], s * d[0] + c * d[1], d[2]])
    dyaw_meas = yaw_from_quat(quat_normalize(rel_pose_meas[3:]))
    dyaw = yaw_b - yaw_a - dyaw_meas
    dyaw = jnp.arctan2(jnp.sin(dyaw), jnp.cos(dyaw))  # wrap
    r = jnp.concatenate([dp_est - rel_pose_meas[:3], dyaw[None]])
    return sqrt_info_4 @ r


def gravity_prior_residual(pose, gravity_body_meas, sqrt_info_3):
    """Penalize deviation of the body-frame gravity direction from the
    VIO-observed one (reference GravityPrior.hpp, used as PGO attitude
    prior). gravity_body_meas: [3] unit gravity direction in body frame."""
    g_world = jnp.array([0.0, 0.0, -1.0], pose.dtype)
    g_body = quat_rotate(quat_conj(quat_normalize(pose[3:])), g_world)
    return sqrt_info_3 @ (g_body - gravity_body_meas)
