"""Sliding-window marginalization producing a dense prior, with FEJ.

Reference semantics (d2vins/src/estimator/marginalization/
marginalization.cpp:173-254 + filterResiduals:78-118):
  * only residuals touching removed frames enter the marginalization;
  * removed params = removed frames' pose+speedbias and landmarks whose
    anchor frame is removed; everything else touched is kept;
  * H = J^T J, g = J^T r, Schur complement over removed dims, result
    wrapped as a linear prior on the kept params;
  * FEJ (margin_enable_fej): residuals/Jacobians are evaluated at the
    prior's stored linearization points for kept params.

TPU-native formulation: fixed-shape masked algebra. Removed landmark
columns (diagonal) are eliminated first, then the removed frames' 15-dim
blocks via a masked dense Schur step; the (H,g) result is converted to
prior rows J,r with an eigendecomposition square root (rank-revealing,
rows below threshold masked out).

Observer-removed rows of kept-anchor landmarks follow the reference's
``remove_base_when_margin_remote`` modes (d2vins_params.hpp:108 default
2; ParamResidualInfo.hpp:27 relavant(); marginalization.cpp:94-108):
  * mode 0: only rows whose anchor frame is removed enter — rows whose
    observer alone is removed are dropped (their landmark keeps its
    other observations, losing that information);
  * mode 2 (default): rows whose anchor OR observer is removed enter,
    and every landmark those rows touch is Schur-eliminated into the
    prior — kept-anchor landmarks' removed-observer information is
    absorbed as correlation between the kept frames. The landmark
    itself remains live in the estimator with its surviving
    observations (no base-frame removal, mode 1).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from d2slam_tpu.solver.layout import VIOLayout
from d2slam_tpu.solver.normal_assembly import build_window_normal
from d2slam_tpu.solver.state import ImuMeas, PriorBlock, ProjMeas, VIOState


def marginalize(
    layout: VIOLayout,
    state: VIOState,
    imu: ImuMeas,
    proj: ProjMeas,
    prior: Optional[PriorBlock],
    remove_frames: jax.Array,  # [W] bool
    *,
    gravity,
    proj_sqrt_info: float,
    dep_sqrt_info: float = 20.0,
    huber_delta: float = 1.0,
    eig_eps: float = 1e-8,
    landmark_param: str = "inv_dep",
    remove_base_mode: int = 2,
) -> PriorBlock:
    """Marginalize the frames marked in ``remove_frames`` into a new prior.

    ``state`` should already hold the FEJ linearization values for kept
    params if FEJ is enabled (the estimator maintains that snapshot).
    """
    dtype = state.poses.dtype
    D = layout.D_pad
    L = layout.L
    pos3d = landmark_param == "pos3d"

    # --- row selection -----------------------------------------------------
    lm_anchor_removed = jnp.zeros((L,), bool).at[proj.lm].max(
        remove_frames[proj.frame_i] & proj.valid
    )
    imu_touch = remove_frames[imu.frame_i] | remove_frames[imu.frame_j]
    if remove_base_mode == 0:
        # drop observer-removed rows of kept-anchor landmarks entirely
        proj_touch = lm_anchor_removed[proj.lm]
    else:
        # reference default (mode 2): any row touching a removed frame
        # enters; its landmark is Schur-eliminated below regardless of
        # where its anchor lives (ParamResidualInfo.hpp relavant())
        proj_touch = remove_frames[proj.frame_i] | remove_frames[proj.frame_j]
    proj_sel = proj._replace(valid=proj.valid & proj_touch)
    imu_sel = imu._replace(valid=imu.valid & imu_touch)

    # block-compact normal-equation assembly (normal_assembly.py): the
    # same sums the dense-row path produced, without the [N, D] rows
    from d2slam_tpu.solver.normal_assembly import compact_placement

    n = build_window_normal(
        layout, state, imu_sel, proj_sel, prior,
        gravity=gravity, proj_sqrt_info=proj_sqrt_info,
        dep_sqrt_info=dep_sqrt_info, huber_delta=huber_delta,
        landmark_param=landmark_param,
    )
    H, g = n.H, n.g
    P79, _ = compact_placement(layout, jnp.float32)
    P79 = P79.astype(dtype)

    # --- eliminate touched landmarks (block Schur) -------------------------
    # every landmark column appearing in the selected rows is eliminated:
    # removed-anchor landmarks always, and (mode 2) kept-anchor landmarks
    # seen by a removed observer — matching marginalization.cpp:94-108
    # where LANDMARK params get is_remove=remove_base_when_margin_remote.
    if pos3d:
        hll3, gl3 = n.hll, n.gl
        Hdl3 = jnp.einsum("lig,gd->lid", n.Hpl, P79)  # embed to global
        used = jnp.einsum("lii->l", hll3) > 0
        safe = hll3 + (1.0 - used[:, None, None].astype(dtype)) * jnp.eye(
            3, dtype=dtype
        ) + jnp.asarray(1e-10, dtype) * jnp.eye(3, dtype=dtype)
        inv3 = jnp.linalg.inv(safe)
        H1 = H - jnp.einsum("lid,lij,lje->de", Hdl3, inv3, Hdl3)
        g1 = g - jnp.einsum("lid,lij,lj->d", Hdl3, inv3, gl3)
    else:
        hll, gl = n.hll, n.gl
        Hdl = n.Hpl @ P79  # embed compact [L, G] to global [L, D]
        hll_safe = jnp.where(hll > 0, hll, 1.0)
        H1 = H - (Hdl / hll_safe[:, None]).T @ Hdl
        g1 = g - Hdl.T @ (gl / hll_safe)

    # --- eliminate removed frame dims (masked dense Schur) -----------------
    col_removed = _frame_col_mask(layout, remove_frames, dtype)
    m_r = col_removed
    m_k = 1.0 - col_removed
    # A = H over removed block, identity elsewhere -> block-diag, invertible
    A = H1 * m_r[:, None] * m_r[None, :] + jnp.diag(m_k) \
        + jnp.asarray(1e-10, dtype) * jnp.diag(m_r)
    A_inv = jnp.linalg.inv(A)
    Hkr = H1 * m_k[:, None] * m_r[None, :]
    H_new = H1 * m_k[:, None] * m_k[None, :] - Hkr @ A_inv @ Hkr.T
    g_new = g1 * m_k - Hkr @ (A_inv @ (g1 * m_r))

    # --- square root -> prior rows ----------------------------------------
    H_new = 0.5 * (H_new + H_new.T)
    evals, evecs = jnp.linalg.eigh(H_new)
    good = evals > eig_eps
    s = jnp.sqrt(jnp.where(good, evals, 1.0))
    J_prior = (evecs * jnp.where(good, s, 0.0)[None, :]).T  # [D, D] rows
    # linear residual model: r(x) = J (x [-] x0) + r0 with J^T r0 = g
    r_prior = jnp.where(good, (evecs.T @ g_new) / s, 0.0)

    return PriorBlock(
        J=J_prior,
        r=r_prior,
        lin=state,
        row_valid=good,
    )


def _frame_col_mask(layout: VIOLayout, remove_frames, dtype):
    """[D_pad] float mask: 1.0 on columns of removed frames."""
    per_frame = jnp.repeat(remove_frames.astype(dtype), 15)  # [15W]
    m = jnp.zeros((layout.D_pad,), dtype)
    return m.at[: 15 * layout.W].set(per_frame)


def zero_prior(layout: VIOLayout, dtype) -> PriorBlock:
    """An inert PriorBlock (all rows invalid) standing in for 'no prior'
    — gives the fused solve+marginalize program ONE argument structure
    instead of a None/Block split (each split doubles the compiled and
    transfer-packed variants)."""
    from d2slam_tpu.solver.state import VIOState

    D = layout.D_pad
    return PriorBlock(
        J=jnp.zeros((D, D), dtype),
        r=jnp.zeros((D,), dtype),
        lin=VIOState.zeros(layout, dtype),
        row_valid=jnp.zeros((D,), bool),
    )


def solve_and_marginalize(
    layout: VIOLayout,
    state: VIOState,
    imu: ImuMeas,
    proj: ProjMeas,
    prior: PriorBlock,
    remove_frames,      # [W] bool — frames to marginalize after solving
    do_marg,            # [] bool — False: pass the old prior through
    enable_fej,         # [] bool — linearize kept params at prior.lin
    *,
    gravity,
    col_free,
    proj_sqrt_info: float,
    dep_sqrt_info: float = 20.0,
    huber_delta: float = 1.0,
    max_iters: int = 8,
    landmark_param: str = "inv_dep",
    method: str = "lm",
    refine_steps: int = 0,
    remove_base_mode: int = 2,
    eig_eps: float = 1e-8,
):
    """ONE device program for the keyframe's whole backend step: the
    sliding-window LM solve followed (conditionally) by marginalizing
    ``remove_frames`` into a fresh prior. Fusing them halves the
    host<->device round trips per keyframe — the dominant cost on a
    remote accelerator link (utils/placement.py). Returns
    (new_state, report, new_prior).

    The FEJ linearization state is computed ON DEVICE: kept params
    carried by the prior linearize at the prior's stored points
    (reference replacetoPrevLinearizedPoints, prior_factor.cpp:183+),
    everything else at post-solve values.
    """
    from d2slam_tpu.solver.lm import lm_solve_vio

    new_state, report = lm_solve_vio(
        layout, state, imu, proj, prior,
        gravity=gravity, col_free=col_free,
        proj_sqrt_info=proj_sqrt_info, dep_sqrt_info=dep_sqrt_info,
        huber_delta=huber_delta, max_iters=max_iters,
        landmark_param=landmark_param, method=method,
        refine_steps=refine_steps,
    )

    # FEJ snapshot (device): prior-carried frames at prior.lin values
    carried = prior.lin.frame_valid & enable_fej
    marg_state = new_state._replace(
        poses=jnp.where(carried[:, None], prior.lin.poses, new_state.poses),
        sb=jnp.where(carried[:, None], prior.lin.sb, new_state.sb),
    )
    new_prior = marginalize(
        layout, marg_state, imu, proj, prior, remove_frames,
        gravity=gravity, proj_sqrt_info=proj_sqrt_info,
        dep_sqrt_info=dep_sqrt_info, huber_delta=huber_delta,
        eig_eps=eig_eps, landmark_param=landmark_param,
        remove_base_mode=remove_base_mode,
    )
    out_prior = jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            jnp.reshape(do_marg, (1,) * a.ndim), a, b
        ),
        new_prior, prior,
    )
    return new_state, report, out_prior


def permute_prior_device(
    layout: VIOLayout, prior: PriorBlock, perm
) -> PriorBlock:
    """JAX-traceable ``permute_prior_frames`` (slot_map as a [W] int32
    DEVICE array, -1 resetting a slot). Applied at the START of the
    fused solve program so the dense prior can stay accelerator-
    resident across window shifts (CarryAccelFn): the host records the
    pending slot permutation instead of fetching ~270 KB of J both
    ways every keyframe."""
    W, D = layout.W, layout.D_pad
    perm = jnp.asarray(perm, jnp.int32)
    keep = perm >= 0
    src = jnp.clip(perm, 0, W - 1)
    col_idx = (src[:, None] * 15
               + jnp.arange(15, dtype=jnp.int32)[None, :]).reshape(-1)
    col_src = jnp.concatenate(
        [col_idx, jnp.arange(15 * W, D, dtype=jnp.int32)]
    )
    col_keep = jnp.concatenate(
        [jnp.repeat(keep, 15), jnp.ones((D - 15 * W,), bool)]
    )
    J = prior.J[:, col_src] * col_keep.astype(prior.J.dtype)[None, :]

    lin = prior.lin
    unit_q = jnp.asarray([0, 0, 0, 0, 0, 0, 1], lin.poses.dtype)
    poses = jnp.where(keep[:, None], lin.poses[src], unit_q[None, :])
    sb = jnp.where(keep[:, None], lin.sb[src], 0)
    fv = keep & lin.frame_valid[src]
    return prior._replace(
        J=J,
        lin=lin._replace(poses=poses, sb=sb, frame_valid=fv),
    )


def solve_and_marginalize_carry(
    layout: VIOLayout,
    prior: PriorBlock,   # DEVICE-RESIDENT carry (CarryAccelFn)
    state: VIOState,
    imu: ImuMeas,
    proj: ProjMeas,
    perm,                # [W] int32 pending window-shift slot map
    remove_frames,
    do_marg,
    enable_fej,
    **kw,
):
    """Carry-threaded variant of ``solve_and_marginalize``: the prior
    rides as the device carry (first positional after device_args per
    CarryAccelFn's contract), gets the host's pending window-shift
    permutation applied on device, and the NEW prior is returned as
    the carry — it never crosses the link. Returns
    ``(new_prior, (new_state, report))``."""
    prior = permute_prior_device(layout, prior, perm)
    new_state, report, new_prior = solve_and_marginalize(
        layout, state, imu, proj, prior, remove_frames, do_marg,
        enable_fej, **kw,
    )
    return new_prior, (new_state, report)


def make_pose_prior(
    layout: VIOLayout,
    state: VIOState,
    frame: int,
    pos_sqrt_info: float = 100.0,
    rot_sqrt_info: float = 100.0,
) -> PriorBlock:
    """Strong pose prior pinning one frame — the gauge anchor.

    TPU equivalent of the reference's first-frame prior
    (d2vins/src/estimator/d2vinsstate.cpp:503-555
    createPriorFactor4FirstFrame: the main drone's first frame gets a
    stiff pose prior establishing the reference-frame gauge).
    """
    dtype = state.poses.dtype
    D = layout.D_pad
    J = jnp.zeros((D, D), dtype)
    c0 = 15 * frame
    w = jnp.concatenate(
        [jnp.full((3,), pos_sqrt_info), jnp.full((3,), rot_sqrt_info)]
    ).astype(dtype)
    J = J.at[c0 : c0 + 6, c0 : c0 + 6].set(jnp.diag(w))
    row_valid = jnp.zeros((D,), bool).at[c0 : c0 + 6].set(True)
    return PriorBlock(J=J, r=jnp.zeros((D,), dtype), lin=state, row_valid=row_valid)


def add_gauge_rows(
    layout: VIOLayout,
    prior: PriorBlock,
    state: VIOState,
    frame: int,
    pos_sqrt_info: float = 1.0,
    rot_sqrt_info: float = 1.0,
) -> PriorBlock:
    """Write a 6-dof pose prior on ``frame`` into free rows of an
    existing prior (host side).

    Used when a new drone joins the SOLVE_ALL window: every drone's
    first frame gets a gauge prior, the main drone's 100x stiffer
    (reference createPriorFactor4FirstFrame,
    d2vins/src/estimator/d2vinsstate.cpp:503-555).
    """
    import numpy as np

    J = np.asarray(prior.J).copy()
    r = np.asarray(prior.r).copy()
    rv = np.asarray(prior.row_valid).copy()
    free = np.flatnonzero(~rv)
    if len(free) < 6:
        raise RuntimeError("no free prior rows for gauge prior")
    rows = free[:6]
    c0 = 15 * frame
    w = np.concatenate(
        [np.full(3, pos_sqrt_info), np.full(3, rot_sqrt_info)]
    )
    J[rows, :] = 0.0
    J[rows, c0 : c0 + 6] = np.diag(w)
    r[rows] = 0.0
    rv[rows] = True

    lin = prior.lin
    poses = np.asarray(lin.poses).copy()
    sb = np.asarray(lin.sb).copy()
    fv = np.asarray(lin.frame_valid).copy()
    poses[frame] = np.asarray(state.poses[frame])
    sb[frame] = np.asarray(state.sb[frame])
    fv[frame] = True
    dtype = prior.J.dtype
    return prior._replace(
        J=jnp.asarray(J, dtype),
        r=jnp.asarray(r, dtype),
        row_valid=jnp.asarray(rv),
        lin=lin._replace(
            poses=jnp.asarray(poses, dtype),
            sb=jnp.asarray(sb, dtype),
            frame_valid=jnp.asarray(fv),
        ),
    )


# ---------------------------------------------------------------------------
# Host-side prior column maintenance across window shifts
# ---------------------------------------------------------------------------


def permute_prior_frames(
    layout: VIOLayout, prior: PriorBlock, slot_map
) -> PriorBlock:
    """Re-map prior columns and linearization state after window slots move.

    slot_map: length-W int array; ``slot_map[new] = old`` (use -1 for
    slots that have no predecessor — their columns become zero and their
    lin entries are reset). Extrinsic/td columns are unchanged.
    """
    import numpy as np

    slot_map = np.asarray(slot_map)
    D = layout.D_pad
    col_src = np.arange(D)
    col_keep = np.ones(D, bool)
    for new in range(layout.W):
        old = slot_map[new]
        dst = slice(15 * new, 15 * new + 15)
        if old < 0:
            col_keep[dst] = False
            col_src[dst] = 0
        else:
            col_src[dst] = np.arange(15 * old, 15 * old + 15)
    J = np.asarray(prior.J)[:, col_src] * col_keep[None, :]

    lin = prior.lin
    poses = np.asarray(lin.poses)
    sb = np.asarray(lin.sb)
    fv = np.asarray(lin.frame_valid)
    new_poses, new_sb = np.array(poses), np.array(sb)
    new_fv = np.zeros_like(fv)
    for new in range(layout.W):
        old = slot_map[new]
        if old >= 0:
            new_poses[new], new_sb[new] = poses[old], sb[old]
            new_fv[new] = fv[old]
        else:
            new_poses[new] = [0, 0, 0, 0, 0, 0, 1]
            new_sb[new] = 0
            new_fv[new] = False
    new_lin = lin._replace(
        poses=jnp.asarray(new_poses),
        sb=jnp.asarray(new_sb),
        frame_valid=jnp.asarray(new_fv),
    )
    return prior._replace(J=jnp.asarray(J), lin=new_lin)
