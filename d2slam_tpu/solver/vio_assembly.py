"""Batched dense-row assembly of the VIO Gauss-Newton system.

TPU-first formulation: every factor contributes weighted, masked
Jacobian **rows scattered into the padded global column layout**, so the
normal equations become a single GEMM ``H = rows^T @ rows`` on the MXU
(the reference instead assembles Ceres CRS sparse Jacobians,
d2vins/src/estimator/marginalization/marginalization.cpp:17-76 — sparse
makes no sense at W<=11, D<200). Inverse-depth landmark columns are
kept separate as scalars and Schur-eliminated analytically (diagonal
H_ll), mirroring the reference's landmark elimination but as batched
dense algebra.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from d2slam_tpu.factors.residuals import imu_residual
from d2slam_tpu.geometry.lie import pose_boxplus, quat_conj, quat_mul, quat_normalize, quat_rotate
from d2slam_tpu.solver.layout import VIOLayout
from d2slam_tpu.solver.state import ImuMeas, PriorBlock, ProjMeas, VIOState


class RowBlock(NamedTuple):
    """Weighted rows of the linearized system.

    J: [N, D_pad]; r: [N]; Jl: landmark-column entries — [N] scalar for
    inverse-depth landmarks, [N, 3] blocks for pos3d landmarks;
    lm: [N] int32 landmark slot per row (0 where unused);
    lm_used: [N] bool; cost: [N] true robust cost contribution.
    """

    J: jax.Array
    r: jax.Array
    Jl: jax.Array
    lm: jax.Array
    lm_used: jax.Array
    cost: jax.Array


def take_row(table, idx):
    """``table[idx]`` for a traced scalar index via one-hot
    contraction. Under vmap this becomes one [M, n] x [n, cols] MXU
    GEMM instead of TPU's serializing gather custom-call
    (GatherScatterIndicesBitpacked: measured ~40% of the B=128
    batched-solve device time in round 5). Tables here are tiny
    (W/C/L rows), so the one-hot is cheap."""
    n = table.shape[0]
    oh = (jnp.arange(n, dtype=jnp.int32) == idx).astype(table.dtype)
    return jnp.tensordot(oh, table, axes=1)


def take_flags(flags, idx):
    """``flags[idx]`` ([M] bool from a tiny bool table) as a one-hot
    matmul; same rationale as take_row."""
    n = flags.shape[0]
    oh = (idx[:, None] == jnp.arange(n, dtype=jnp.int32)).astype(jnp.float32)
    return (oh @ flags.astype(jnp.float32)) > 0.5


def place_block(J, col0, D):
    """Place a [r, k] Jacobian block at column offset ``col0`` of a
    [r, D] row via a one-hot matmul — the TPU-friendly alternative to
    scatter-add (works under vmap with traced offsets; coincident
    blocks still sum because callers add the results)."""
    k = J.shape[-1]
    cols = col0 + jnp.arange(k, dtype=jnp.int32)
    onehot = (cols[:, None] == jnp.arange(D, dtype=jnp.int32)[None, :]).astype(
        J.dtype
    )
    return J @ onehot


def _huber_weight(sq_norm, delta):
    """sqrt(rho'(s)) for Huber, and rho(s) (Ceres HuberLoss semantics:
    rho(s)=s for s<=d^2, else 2 d sqrt(s) - d^2)."""
    d2 = delta * delta
    big = sq_norm > d2
    w = jnp.where(big, jnp.sqrt(d2 / jnp.maximum(sq_norm, 1e-18)), 1.0)
    rho = jnp.where(big, 2.0 * delta * jnp.sqrt(jnp.maximum(sq_norm, 1e-18)) - d2, sq_norm)
    return jnp.sqrt(w), rho


# ---------------------------------------------------------------------------
# Projection rows
# ---------------------------------------------------------------------------


def _proj_residual_unified(pose_i, pose_j, ext_i, ext_j, inv_dep, td, m):
    """3-row unified projection residual [tangent(2), depth(1)].

    Covers all four reference projection kinds (see ProjMeas docstring).
    """
    dtype = pose_i.dtype
    pts_i_td = m["ray_i"] - (td - m["td_i"]) * m["vel_i"]
    pts_j_td = m["ray_j"] - (td - m["td_j"]) * m["vel_j"]
    pts_cam_i = pts_i_td / jnp.maximum(inv_dep, jnp.asarray(1e-6, dtype))
    pts_imu_i = quat_rotate(ext_i[3:], pts_cam_i) + ext_i[:3]
    pts_w = quat_rotate(pose_i[3:], pts_imu_i) + pose_i[:3]
    pts_imu_j = quat_rotate(quat_conj(quat_normalize(pose_j[3:])), pts_w - pose_j[:3])
    pts_cam_j = quat_rotate(quat_conj(quat_normalize(ext_j[3:])), pts_imu_j - ext_j[:3])

    norm_j = jnp.linalg.norm(pts_cam_j)
    pred = pts_cam_j / jnp.maximum(norm_j, jnp.asarray(1e-12, dtype))
    obs = pts_j_td / jnp.maximum(jnp.linalg.norm(pts_j_td), jnp.asarray(1e-12, dtype))
    r2 = m["tb"] @ (pred - obs)
    r_dep = norm_j - m["dep_j"]
    return jnp.concatenate([r2, r_dep[None]])


def build_proj_rows(
    layout: VIOLayout,
    state: VIOState,
    meas: ProjMeas,
    proj_sqrt_info: float,
    dep_sqrt_info: float,
    huber_delta: float,
) -> RowBlock:
    """Linearize all projection measurements into dense rows.

    proj_sqrt_info: scalar weight on the 2-dof tangent residual
    (reference uses focal/1.5 px, d2vins_params sqrt_info statics).
    huber_delta: robust threshold on the *weighted* residual norm
    (reference wraps projection factors in ceres::HuberLoss(1.0)).
    """
    D = layout.D_pad
    dtype = state.poses.dtype

    tb = jax.vmap(
        lambda r: _tangent_base(r)
    )(meas.ray_j)

    def linearize_one(fi, fj, ci, cj, lm, m):
        pose_i = take_row(state.poses, fi)
        pose_j = take_row(state.poses, fj)
        ext_i = take_row(state.ext, ci)
        ext_j = take_row(state.ext, cj)
        inv_dep = take_row(state.inv_dep, lm)
        td = state.td

        def f(d_pi, d_pj, d_ei, d_ej, d_l, d_td):
            return _proj_residual_unified(
                pose_boxplus(pose_i, d_pi),
                pose_boxplus(pose_j, d_pj),
                pose_boxplus(ext_i, d_ei),
                pose_boxplus(ext_j, d_ej),
                inv_dep + d_l[0],
                td + d_td[0],
                m,
            )

        # Derive the linearization point from the state so it shares the
        # state's device-varying type under shard_map: reverse-mode
        # cotangents of a *replicated* seed are psum-ed over the mesh
        # (the mathematically correct adjoint of a shared variable, but
        # here every robot linearizes its own copy).
        vz = pose_i[0] * 0
        z6 = jnp.zeros((6,), dtype) + vz
        z1 = jnp.zeros((1,), dtype) + vz
        r = f(z6, z6, z6, z6, z1, z1)
        J_pi, J_pj, J_ei, J_ej, J_l, J_td = jax.jacrev(
            f, argnums=(0, 1, 2, 3, 4, 5)
        )(z6, z6, z6, z6, z1, z1)

        # place block jacobians into a [3, D] dense row (sums, so
        # coincident blocks — same cam or same frame — accumulate)
        ext0 = 15 * layout.W
        row = (
            place_block(J_pi, 15 * fi, D)
            + place_block(J_pj, 15 * fj, D)
            + place_block(J_ei, ext0 + 6 * ci, D)
            + place_block(J_ej, ext0 + 6 * cj, D)
            + place_block(J_td, jnp.int32(layout.td_col), D)
        )
        return r, row, J_l[:, 0]

    m_data = {
        "ray_i": meas.ray_i, "ray_j": meas.ray_j,
        "vel_i": meas.vel_i, "vel_j": meas.vel_j,
        "td_i": meas.td_i, "td_j": meas.td_j,
        "dep_j": meas.dep_j, "tb": tb,
    }
    r, rows, Jl = jax.vmap(linearize_one)(
        meas.frame_i, meas.frame_j, meas.cam_i, meas.cam_j, meas.lm, m_data
    )  # r: [M,3], rows: [M,3,D], Jl: [M,3]

    w2 = jnp.asarray(proj_sqrt_info, dtype)
    w3 = jnp.asarray(dep_sqrt_info, dtype)
    valid = meas.valid & state.lm_valid[meas.lm] \
        & take_flags(state.frame_valid, meas.frame_i) \
        & take_flags(state.frame_valid, meas.frame_j)

    # robust weighting on the weighted 2-dof part
    sq = jnp.sum((w2 * r[:, :2]) ** 2, axis=-1)
    hw, rho = _huber_weight(sq, huber_delta)
    row_w = jnp.stack(
        [hw * w2, hw * w2, w3 * meas.has_dep.astype(dtype)], axis=-1
    ) * valid[:, None].astype(dtype)  # [M, 3]

    dep_cost = (w3 * r[:, 2]) ** 2 * meas.has_dep.astype(dtype)
    cost3 = jnp.stack(
        [0.5 * rho, jnp.zeros_like(rho), 0.5 * dep_cost], axis=-1
    ) * valid[:, None].astype(dtype)

    N = layout.M * 3
    return RowBlock(
        J=(rows * row_w[:, :, None]).reshape(N, D),
        r=(r * row_w).reshape(N),
        Jl=(Jl * row_w).reshape(N),
        lm=jnp.repeat(meas.lm, 3),
        lm_used=jnp.repeat(valid, 3),
        cost=cost3.reshape(N),
    )


def build_proj_rows_pos3d(
    layout: VIOLayout,
    state: VIOState,
    meas: ProjMeas,
    proj_sqrt_info: float,
    dep_sqrt_info: float,
    huber_delta: float,
) -> RowBlock:
    """Projection rows for 3-dof world-position landmarks.

    The reference's ``landmark_param == LM_POS`` parameterization
    (d2vins/src/d2vins_params.hpp:70-73, factors/reprojection3d.h):
    each observation is an independent residual of (pose_j, ext_j,
    lm_pos) — no anchor pairing, so ``meas`` should carry EVERY
    observation (including the anchor's) with frame_j/cam_j/ray_j set
    (frame_i/ray_i are ignored). Jl becomes a [N, 3] block eliminated
    by 3x3 block Schur in the solver.
    """
    D = layout.D_pad
    dtype = state.poses.dtype

    tb = jax.vmap(lambda r: _tangent_base(r))(meas.ray_j)

    def linearize_one(fj, cj, lm, m):
        pose_j = take_row(state.poses, fj)
        ext_j = take_row(state.ext, cj)
        pw = take_row(state.lm_pos, lm)
        td = state.td

        def f(d_pj, d_ej, d_l, d_td):
            pose = pose_boxplus(pose_j, d_pj)
            ext = pose_boxplus(ext_j, d_ej)
            p = pw + d_l
            tdv = td + d_td[0]
            pts_j_td = m["ray_j"] - (tdv - m["td_j"]) * m["vel_j"]
            pts_imu_j = quat_rotate(
                quat_conj(quat_normalize(pose[3:])), p - pose[:3]
            )
            pts_cam_j = quat_rotate(
                quat_conj(quat_normalize(ext[3:])), pts_imu_j - ext[:3]
            )
            norm_j = jnp.linalg.norm(pts_cam_j)
            pred = pts_cam_j / jnp.maximum(norm_j, jnp.asarray(1e-12, dtype))
            obs = pts_j_td / jnp.maximum(
                jnp.linalg.norm(pts_j_td), jnp.asarray(1e-12, dtype)
            )
            r2 = m["tb"] @ (pred - obs)
            r_dep = norm_j - m["dep_j"]
            return jnp.concatenate([r2, r_dep[None]])

        # varying-zero seed: see build_proj_rows on jacrev-under-shard_map
        vz = pose_j[0] * 0
        z6 = jnp.zeros((6,), dtype) + vz
        z3 = jnp.zeros((3,), dtype) + vz
        z1 = jnp.zeros((1,), dtype) + vz
        r = f(z6, z6, z3, z1)
        J_pj, J_ej, J_l, J_td = jax.jacrev(f, argnums=(0, 1, 2, 3))(
            z6, z6, z3, z1
        )
        ext0 = 15 * layout.W
        row = (
            place_block(J_pj, 15 * fj, D)
            + place_block(J_ej, ext0 + 6 * cj, D)
            + place_block(J_td, jnp.int32(layout.td_col), D)
        )
        return r, row, J_l

    m_data = {
        "ray_j": meas.ray_j, "vel_j": meas.vel_j,
        "td_j": meas.td_j, "dep_j": meas.dep_j, "tb": tb,
    }
    r, rows, Jl = jax.vmap(linearize_one)(
        meas.frame_j, meas.cam_j, meas.lm, m_data
    )  # r: [M,3], rows: [M,3,D], Jl: [M,3,3]

    w2 = jnp.asarray(proj_sqrt_info, dtype)
    w3 = jnp.asarray(dep_sqrt_info, dtype)
    valid = meas.valid & state.lm_valid[meas.lm] \
        & take_flags(state.frame_valid, meas.frame_j)

    sq = jnp.sum((w2 * r[:, :2]) ** 2, axis=-1)
    hw, rho = _huber_weight(sq, huber_delta)
    row_w = jnp.stack(
        [hw * w2, hw * w2, w3 * meas.has_dep.astype(dtype)], axis=-1
    ) * valid[:, None].astype(dtype)  # [M, 3]

    dep_cost = (w3 * r[:, 2]) ** 2 * meas.has_dep.astype(dtype)
    cost3 = jnp.stack(
        [0.5 * rho, jnp.zeros_like(rho), 0.5 * dep_cost], axis=-1
    ) * valid[:, None].astype(dtype)

    N = layout.M * 3
    return RowBlock(
        J=(rows * row_w[:, :, None]).reshape(N, D),
        r=(r * row_w).reshape(N),
        Jl=(Jl * row_w[:, :, None]).reshape(N, 3),
        lm=jnp.repeat(meas.lm, 3),
        lm_used=jnp.repeat(valid, 3),
        cost=cost3.reshape(N),
    )


def _tangent_base(ray):
    a = ray / jnp.maximum(jnp.linalg.norm(ray), 1e-12)
    tmp = jnp.where(
        jnp.abs(a[2]) > 0.999,
        jnp.array([1.0, 0.0, 0.0], ray.dtype),
        jnp.array([0.0, 0.0, 1.0], ray.dtype),
    )
    b1 = tmp - a * jnp.dot(a, tmp)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
    b2 = jnp.cross(a, b1)
    return jnp.stack([b1, b2])


# ---------------------------------------------------------------------------
# IMU rows
# ---------------------------------------------------------------------------


def build_imu_rows(
    layout: VIOLayout, state: VIOState, imu: ImuMeas, gravity
) -> RowBlock:
    D = layout.D_pad
    dtype = state.poses.dtype

    def linearize_one(fi, fj, pre, sqrt_info):
        pose_i, sb_i = take_row(state.poses, fi), take_row(state.sb, fi)
        pose_j, sb_j = take_row(state.poses, fj), take_row(state.sb, fj)

        def f(d_pi, d_si, d_pj, d_sj):
            return imu_residual(
                pose_boxplus(pose_i, d_pi), sb_i + d_si,
                pose_boxplus(pose_j, d_pj), sb_j + d_sj,
                pre, gravity,
            )

        # varying-zero seed: see build_proj_rows on jacrev-under-shard_map
        vz = pose_i[0] * 0
        z6 = jnp.zeros((6,), dtype) + vz
        z9 = jnp.zeros((9,), dtype) + vz
        r = f(z6, z9, z6, z9)
        J_pi, J_si, J_pj, J_sj = jax.jacrev(f, argnums=(0, 1, 2, 3))(z6, z9, z6, z9)

        r_w = sqrt_info @ r
        Ji = sqrt_info @ jnp.concatenate([J_pi, J_si], axis=1)  # [15, 15]
        Jj = sqrt_info @ jnp.concatenate([J_pj, J_sj], axis=1)
        row = place_block(Ji, 15 * fi, D) + place_block(Jj, 15 * fj, D)
        return r_w, row

    r, rows = jax.vmap(linearize_one)(imu.frame_i, imu.frame_j, imu.pre, imu.sqrt_info)

    valid = (imu.valid & take_flags(state.frame_valid, imu.frame_i)
             & take_flags(state.frame_valid, imu.frame_j))
    w = valid.astype(dtype)[:, None]
    K = imu.frame_i.shape[0]
    N = K * 15
    r_w = r * w
    return RowBlock(
        J=(rows * w[:, :, None]).reshape(N, D),
        r=r_w.reshape(N),
        Jl=jnp.zeros((N,), dtype),
        lm=jnp.zeros((N,), jnp.int32),
        lm_used=jnp.zeros((N,), bool),
        cost=0.5 * (r_w ** 2).reshape(N),
    )


# ---------------------------------------------------------------------------
# Prior rows
# ---------------------------------------------------------------------------


def state_boxminus(layout: VIOLayout, a: VIOState, b: VIOState) -> jax.Array:
    """Blockwise tangent difference a [-] b in the solver column layout
    (landmarks excluded), shape [D_pad]."""
    from d2slam_tpu.geometry.lie import pose_boxminus

    dtype = a.poses.dtype
    dx = jnp.zeros((layout.D_pad,), dtype)
    dposes = jax.vmap(pose_boxminus)(a.poses, b.poses)  # [W, 6]
    dsb = a.sb - b.sb  # [W, 9]
    per_frame = jnp.concatenate([dposes, dsb], axis=-1).reshape(-1)  # [15W]
    dx = dx.at[: 15 * layout.W].set(per_frame)
    dext = jax.vmap(pose_boxminus)(a.ext, b.ext).reshape(-1)
    dx = dx.at[15 * layout.W : 15 * layout.W + 6 * layout.C].set(dext)
    dx = dx.at[layout.td_col].set(a.td - b.td)
    return dx


def build_prior_rows(layout: VIOLayout, state: VIOState, prior: PriorBlock) -> RowBlock:
    dtype = state.poses.dtype
    dx = state_boxminus(layout, state, prior.lin)
    r = prior.r + prior.J @ dx
    w = prior.row_valid.astype(dtype)
    r_w = r * w
    P = prior.r.shape[0]
    return RowBlock(
        J=prior.J * w[:, None],
        r=r_w,
        Jl=jnp.zeros((P,), dtype),
        lm=jnp.zeros((P,), jnp.int32),
        lm_used=jnp.zeros((P,), bool),
        cost=0.5 * r_w ** 2,
    )


def expand_lm_cols(b: RowBlock) -> RowBlock:
    """Lift a scalar-landmark block (Jl [N], all zeros for IMU/prior
    rows) to the pos3d layout (Jl [N, 3]) so blocks concatenate."""
    if b.Jl.ndim == 2:
        return b
    return b._replace(Jl=jnp.zeros(b.Jl.shape + (3,), b.Jl.dtype))


def assemble_full_rows(blocks: Tuple[RowBlock, ...]) -> RowBlock:
    if any(b.Jl.ndim == 2 for b in blocks):
        blocks = tuple(expand_lm_cols(b) for b in blocks)
    return RowBlock(
        J=jnp.concatenate([b.J for b in blocks], axis=0),
        r=jnp.concatenate([b.r for b in blocks], axis=0),
        Jl=jnp.concatenate([b.Jl for b in blocks], axis=0),
        lm=jnp.concatenate([b.lm for b in blocks], axis=0),
        lm_used=jnp.concatenate([b.lm_used for b in blocks], axis=0),
        cost=jnp.concatenate([b.cost for b in blocks], axis=0),
    )
