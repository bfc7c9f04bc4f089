"""Direct block-sparse assembly of the VIO normal equations.

The row-matrix formulation (vio_assembly.py) scatters every factor's
Jacobian into dense [N, D] rows via one-hot matmuls and forms
H = rows^T rows with one GEMM. That is simple and exact, but the
one-hot placement tensors dominate HBM traffic: measured ~89 MB per
window per linearization at W=11/M=1024 (the round-3 "bandwidth-burner"
finding). This module assembles the SAME normal equations without ever
materializing the [N, D] row matrix:

  * each projection measurement is linearized into a compact
    [3, 25] Jacobian over its five touched blocks
    (pose_i 6 | pose_j 6 | ext_i 6 | ext_j 6 | td 1);
  * the compact Jacobians expand into [3M, G] rows over the
    G = 6W+6C+1 POSE-ONLY column space via block-level one-hots
    ([M, W]-sized, not [M, 6, D]) — speed/bias and padding columns
    never see projection traffic;
  * H_G = J_G^T J_G is one well-shaped MXU GEMM (contraction over 3M),
    embedded into the global interleaved [D, D] layout through one
    constant placement matrix (two small GEMMs).

Scatter-adds are deliberately absent: TPU scatter with colliding
indices serializes (measured 4-7x slower than the segment GEMMs).
Results are the same sums up to float reassociation
(tests/test_normal_assembly.py checks agreement with the row path).

Reference semantics unchanged: Ceres CRS + Schur ordering
(d2vins/src/estimator/marginalization/marginalization.cpp:17-76);
unit-sphere + td projection factors
(d2vins/src/factors/projectionTwoFrameOneCamFactor.cpp:34-120).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from d2slam_tpu.geometry.lie import pose_boxplus
from d2slam_tpu.solver.layout import VIOLayout
from d2slam_tpu.solver.state import ImuMeas, PriorBlock, ProjMeas, VIOState
from d2slam_tpu.solver.vio_assembly import (
    RowBlock,
    _huber_weight,
    _proj_residual_unified,
    _tangent_base,
    take_flags,
    take_row,
)


class Normal(NamedTuple):
    """Normal equations of the window, landmarks kept separate.

    H: [D, D]; g: [D]; cost: scalar robust cost.
    Landmark blocks (zero for factor sets without landmarks), kept in
    the COMPACT pose-space G = 6W+6C+1 (projection factors never touch
    speed/bias or padding columns — consumers embed through
    ``compact_placement`` when they need the global layout):
      inv_dep: hll [L], gl [L], Hpl [L, G]
      pos3d:   hll [L, 3, 3], gl [L, 3], Hpl [L, 3, G]
    """

    H: jax.Array
    g: jax.Array
    hll: jax.Array
    gl: jax.Array
    Hpl: jax.Array
    cost: jax.Array


def compact_placement(layout: VIOLayout, dtype) -> Tuple[np.ndarray, int]:
    """Constant [G, D] one-hot embedding the compact pose-space
    (6W poses | 6C ext | td) into the global interleaved layout."""
    G = 6 * layout.W + 6 * layout.C + 1
    P = np.zeros((G, layout.D_pad), np.float32)
    for w in range(layout.W):
        for u in range(6):
            P[6 * w + u, 15 * w + u] = 1.0
    for c in range(layout.C):
        for u in range(6):
            P[6 * layout.W + 6 * c + u, layout.ext_col(c) + u] = 1.0
    P[G - 1, layout.td_col] = 1.0
    return jnp.asarray(P, dtype), G


def zero_normal(layout: VIOLayout, dtype, pos3d: bool = False) -> Normal:
    D, L = layout.D_pad, layout.L
    G = 6 * layout.W + 6 * layout.C + 1
    z = jnp.zeros((), dtype)
    if pos3d:
        return Normal(
            H=jnp.zeros((D, D), dtype), g=jnp.zeros((D,), dtype),
            hll=jnp.zeros((L, 3, 3), dtype), gl=jnp.zeros((L, 3), dtype),
            Hpl=jnp.zeros((L, 3, G), dtype), cost=z,
        )
    return Normal(
        H=jnp.zeros((D, D), dtype), g=jnp.zeros((D,), dtype),
        hll=jnp.zeros((L,), dtype), gl=jnp.zeros((L,), dtype),
        Hpl=jnp.zeros((L, G), dtype), cost=z,
    )


def add_normals(a: Normal, b: Normal) -> Normal:
    return jax.tree_util.tree_map(jnp.add, a, b)


# ---------------------------------------------------------------------------
# projection factors -> Normal (inverse-depth landmarks)
# ---------------------------------------------------------------------------


def build_proj_normal(
    layout: VIOLayout,
    state: VIOState,
    meas: ProjMeas,
    proj_sqrt_info: float,
    dep_sqrt_info: float,
    huber_delta: float,
) -> Normal:
    """Assemble the projection factors' normal-equation contribution
    without materializing dense rows (module docstring). Exactly the
    sums build_proj_rows + H = J^T J would produce."""
    dtype = state.poses.dtype
    W, C, L, D = layout.W, layout.C, layout.L, layout.D_pad

    tb = jax.vmap(_tangent_base)(meas.ray_j)

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

        # varying-zero seeds: see build_proj_rows on jacrev-under-shard_map
        vz = pose_i[0] * 0
        z6 = jnp.zeros((6,), dtype) + vz
        z1 = jnp.zeros((1,), dtype) + vz
        r = f(z6, z6, z6, z6, z1, z1)
        J_pi, J_pj, J_ei, J_ej, J_l, J_td = jax.jacrev(
            f, argnums=(0, 1, 2, 3, 4, 5)
        )(z6, z6, z6, z6, z1, z1)
        Jm = jnp.concatenate([J_pi, J_pj, J_ei, J_ej, J_td], axis=1)
        return r, Jm, J_l[:, 0]

    m_data = {
        "ray_i": meas.ray_i, "ray_j": meas.ray_j,
        "vel_i": meas.vel_i, "vel_j": meas.vel_j,
        "td_i": meas.td_i, "td_j": meas.td_j,
        "dep_j": meas.dep_j, "tb": tb,
    }
    r, Jm, Jl = jax.vmap(linearize_one)(
        meas.frame_i, meas.frame_j, meas.cam_i, meas.cam_j, meas.lm, m_data
    )  # r: [M,3], Jm: [M,3,25], Jl: [M,3]

    w2 = jnp.asarray(proj_sqrt_info, dtype)
    w3 = jnp.asarray(dep_sqrt_info, dtype)
    valid = meas.valid & state.lm_valid[meas.lm] \
        & take_flags(state.frame_valid, meas.frame_i) \
        & take_flags(state.frame_valid, meas.frame_j)

    sq = jnp.sum((w2 * r[:, :2]) ** 2, axis=-1)
    hw, rho = _huber_weight(sq, huber_delta)
    row_w = jnp.stack(
        [hw * w2, hw * w2, w3 * meas.has_dep.astype(dtype)], axis=-1
    ) * valid[:, None].astype(dtype)  # [M, 3]

    dep_cost = (w3 * r[:, 2]) ** 2 * meas.has_dep.astype(dtype)
    cost = jnp.sum(
        (0.5 * rho + 0.5 * dep_cost) * valid.astype(dtype)
    )

    Jm_w = Jm * row_w[:, :, None]       # [M, 3, 25]
    r_w = r * row_w                     # [M, 3]
    Jl_w = Jl * row_w                   # [M, 3]

    fi, fj, ci, cj, lm = (meas.frame_i, meas.frame_j,
                          meas.cam_i, meas.cam_j, meas.lm)

    # compact [3M, G] rows via BLOCK-level one-hots (G = 6W+6C+1): the
    # padded sb columns never see projection traffic and the placement
    # tensors are [M, W]-sized, not [M, 6, D] — ~10x less HBM traffic
    # than the dense-row path, and H79 = J79^T J79 is one well-shaped
    # MXU GEMM (k = 3M)
    M_ = Jm.shape[0]
    Fi = (fi[:, None] == jnp.arange(W, dtype=fi.dtype)[None, :]).astype(dtype)
    Fj = (fj[:, None] == jnp.arange(W, dtype=fj.dtype)[None, :]).astype(dtype)
    Ci_ = (ci[:, None] == jnp.arange(C, dtype=ci.dtype)[None, :]).astype(dtype)
    Cj_ = (cj[:, None] == jnp.arange(C, dtype=cj.dtype)[None, :]).astype(dtype)
    J_pose = (
        jnp.einsum("mw,mra->mrwa", Fi, Jm_w[:, :, 0:6])
        + jnp.einsum("mw,mra->mrwa", Fj, Jm_w[:, :, 6:12])
    ).reshape(M_, 3, 6 * W)
    J_ext = (
        jnp.einsum("mc,mra->mrca", Ci_, Jm_w[:, :, 12:18])
        + jnp.einsum("mc,mra->mrca", Cj_, Jm_w[:, :, 18:24])
    ).reshape(M_, 3, 6 * C)
    G = 6 * W + 6 * C + 1
    J79 = jnp.concatenate(
        [J_pose, J_ext, Jm_w[:, :, 24:25]], axis=-1
    ).reshape(M_ * 3, G)
    r3 = r_w.reshape(M_ * 3)
    Jl3 = Jl_w.reshape(M_ * 3)

    H79 = J79.T @ J79
    g79 = J79.T @ r3

    P, _ = compact_placement(layout, dtype)
    H = P.T @ (H79 @ P)
    g = g79 @ P

    # landmark couplings — contract the 3 residual rows per measurement
    # FIRST, then one segment GEMM with an [M, L] one-hot (TPU
    # scatter-add with colliding indices serializes; these are MXU
    # matmuls). Hpl stays in the compact G layout (Normal docstring).
    J79m = J79.reshape(M_, 3, G)
    hpvec = jnp.einsum("mr,mrg->mg", Jl_w, J79m)   # [M, G]
    Sl = (lm[:, None] == jnp.arange(L, dtype=lm.dtype)[None, :]).astype(
        dtype
    )  # [M, L]
    hll = Sl.T @ jnp.sum(Jl_w * Jl_w, axis=-1)
    gl = Sl.T @ jnp.sum(Jl_w * r_w, axis=-1)
    Hpl = Sl.T @ hpvec  # [L, G]

    return Normal(H=H, g=g, hll=hll, gl=gl, Hpl=Hpl, cost=cost)


# ---------------------------------------------------------------------------
# projection factors -> Normal (pos3d landmarks)
# ---------------------------------------------------------------------------


def build_proj_normal_pos3d(
    layout: VIOLayout,
    state: VIOState,
    meas: ProjMeas,
    proj_sqrt_info: float,
    dep_sqrt_info: float,
    huber_delta: float,
) -> Normal:
    """pos3d variant (reference landmark_param LM_POS,
    d2vins_params.hpp:70-73): each observation is an independent
    residual of (pose_j, ext_j, lm_pos); compact blocks are
    (pose_j 6 | ext_j 6 | td 1) and the landmark column is a 3-block."""
    dtype = state.poses.dtype
    W, C, L, D = layout.W, layout.C, layout.L, layout.D_pad

    tb = jax.vmap(_tangent_base)(meas.ray_j)

    def linearize_one(fj, cj, lm, m):
        pose_j = take_row(state.poses, fj)
        ext_j = take_row(state.ext, cj)
        pw = take_row(state.lm_pos, lm)
        td = state.td

        def f(d_pj, d_ej, d_l, d_td):
            from d2slam_tpu.geometry.lie import (
                quat_conj,
                quat_normalize,
                quat_rotate,
            )

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

        vz = pose_j[0] * 0
        z6 = jnp.zeros((6,), dtype) + vz
        z3 = jnp.zeros((3,), dtype) + vz
        z1 = jnp.zeros((1,), dtype) + vz
        r = f(z6, z6, z3, z1)
        J_pj, J_ej, J_l, J_td = jax.jacrev(f, argnums=(0, 1, 2, 3))(
            z6, z6, z3, z1
        )
        Jm = jnp.concatenate([J_pj, J_ej, J_td], axis=1)  # [3, 13]
        return r, Jm, J_l

    m_data = {
        "ray_j": meas.ray_j, "vel_j": meas.vel_j,
        "td_j": meas.td_j, "dep_j": meas.dep_j, "tb": tb,
    }
    r, Jm, Jl = jax.vmap(linearize_one)(
        meas.frame_j, meas.cam_j, meas.lm, m_data
    )  # r: [M,3], Jm: [M,3,13], Jl: [M,3,3]

    w2 = jnp.asarray(proj_sqrt_info, dtype)
    w3 = jnp.asarray(dep_sqrt_info, dtype)
    valid = meas.valid & state.lm_valid[meas.lm] \
        & take_flags(state.frame_valid, meas.frame_j)
    sq = jnp.sum((w2 * r[:, :2]) ** 2, axis=-1)
    hw, rho = _huber_weight(sq, huber_delta)
    row_w = jnp.stack(
        [hw * w2, hw * w2, w3 * meas.has_dep.astype(dtype)], axis=-1
    ) * valid[:, None].astype(dtype)
    dep_cost = (w3 * r[:, 2]) ** 2 * meas.has_dep.astype(dtype)
    cost = jnp.sum((0.5 * rho + 0.5 * dep_cost) * valid.astype(dtype))

    Jm_w = Jm * row_w[:, :, None]
    r_w = r * row_w
    Jl_w = Jl * row_w[:, :, None]       # [M, 3, 3] (rows x lm-dims)

    fj, cj, lm = meas.frame_j, meas.cam_j, meas.lm

    # compact [3M, G] rows via block-level one-hots (see
    # build_proj_normal)
    M_ = Jm.shape[0]
    Fj = (fj[:, None] == jnp.arange(W, dtype=fj.dtype)[None, :]).astype(dtype)
    Cj_ = (cj[:, None] == jnp.arange(C, dtype=cj.dtype)[None, :]).astype(dtype)
    J_pose = jnp.einsum("mw,mra->mrwa", Fj, Jm_w[:, :, 0:6]).reshape(
        M_, 3, 6 * W
    )
    J_ext = jnp.einsum("mc,mra->mrca", Cj_, Jm_w[:, :, 6:12]).reshape(
        M_, 3, 6 * C
    )
    G = 6 * W + 6 * C + 1
    J79 = jnp.concatenate(
        [J_pose, J_ext, Jm_w[:, :, 12:13]], axis=-1
    ).reshape(M_ * 3, G)
    r3 = r_w.reshape(M_ * 3)
    Jl3 = Jl_w.reshape(M_ * 3, 3)

    H79 = J79.T @ J79
    g79 = J79.T @ r3
    P, _ = compact_placement(layout, dtype)
    H = P.T @ (H79 @ P)
    g = g79 @ P

    # per-measurement row contraction first, then one [M, L] segment
    # GEMM per landmark tensor; Hpl stays compact (Normal docstring)
    J79m = J79.reshape(M_, 3, G)
    Jlm = Jl3.reshape(M_, 3, 3)
    r3m = r3.reshape(M_, 3)
    Sl = (lm[:, None] == jnp.arange(L, dtype=lm.dtype)[None, :]).astype(
        dtype
    )  # [M, L]
    hll = (Sl.T @ jnp.einsum("mri,mrj->mij", Jlm, Jlm).reshape(
        M_, 9)).reshape(L, 3, 3)
    gl = Sl.T @ jnp.einsum("mri,mr->mi", Jlm, r3m)
    Hpl = (Sl.T @ jnp.einsum("mri,mrg->mig", Jlm, J79m).reshape(
        M_, 3 * G)).reshape(L, 3, G)

    return Normal(H=H, g=g, hll=hll, gl=gl, Hpl=Hpl, cost=cost)


def build_window_normal(
    layout: VIOLayout,
    state: VIOState,
    imu: ImuMeas,
    proj: ProjMeas,
    prior,
    *,
    gravity,
    proj_sqrt_info: float,
    dep_sqrt_info: float,
    huber_delta: float,
    landmark_param: str = "inv_dep",
    consensus=None,
) -> Normal:
    """Full window: projection (compact path) + IMU + prior
    (+ consensus) normal equations."""
    from d2slam_tpu.solver.vio_assembly import (
        build_imu_rows,
        build_prior_rows,
    )

    pos3d = landmark_param == "pos3d"
    build = build_proj_normal_pos3d if pos3d else build_proj_normal
    n = build(layout, state, proj, proj_sqrt_info, dep_sqrt_info,
              huber_delta)

    def fold_rows(n, rb):
        # landmark-free row blocks (IMU/prior/consensus) are small;
        # rows^T rows is the cheap path for them
        return n._replace(
            H=n.H + rb.J.T @ rb.J,
            g=n.g + rb.J.T @ rb.r,
            cost=n.cost + jnp.sum(rb.cost),
        )

    n = fold_rows(n, build_imu_rows(layout, state, imu, gravity))
    if prior is not None:
        n = fold_rows(n, build_prior_rows(layout, state, prior))
    if consensus is not None:
        from d2slam_tpu.parallel.consensus import build_consensus_rows

        ref_poses, tilde, active, rho_T, rho_theta = consensus
        n = fold_rows(n, build_consensus_rows(
            layout, state, ref_poses, tilde, active, rho_T, rho_theta
        ))
    return n
