"""Chordal (rotation-matrix) initialization for pose-graph optimization.

Re-expresses the reference's distributed rotation initialization
(reference: d2pgo/src/rot_init/rotation_initialization_base.hpp:89-215):
relative-rotation measurements give linear constraints
``R_a @ R_ab - R_b = 0`` on the 9 rotation-matrix entries per pose;
fixed poses contribute prior rows. The reference assembles a sparse
triplet system solved with SimplicialLLT; pose graphs at swarm scale
(<= a few thousand poses) fit comfortably as a dense normal-equation
Cholesky on TPU, batched over the 3 columns of the unknown matrices.
Solutions are projected back to SO(3) by SVD (solveLinearRot:178-215).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from d2slam_tpu.geometry.lie import quat_to_rotmat, rotmat_to_quat


def chordal_rotation_init(
    poses,        # [N, 7] initial poses (rotations may be garbage)
    valid,        # [N] bool
    edge_i, edge_j,  # [E] int32
    rel_q,        # [E, 4] measured relative rotations (xyzw)
    edge_valid,   # [E] bool
    fixed_mask,   # [N] bool — rotations held at their current value
    fix_weight: float = 100.0,
    gravity_body=None,   # [N, 3] body-frame gravity direction per frame
    gravity_weight: float = 0.0,
):
    """Returns [N, 7] poses with rotations replaced by the chordal LS
    solution (positions untouched; a subsequent PGO solve handles them).

    ``gravity_body``/``gravity_weight`` add the reference's per-frame
    gravity-prior rows (rotation_initialization_base.hpp:131-144
    setupRotInitProblembyGravityPrior): the THIRD row of each R_n —
    the body-frame direction of world z — is pinned to the VIO
    ego-attitude's measured gravity direction
    (``R_ego[2, :]`` = att_odom⁻¹ · ĝ), so noisy loop edges cannot tilt
    the initialized attitudes out of the gravity-aligned gauge. Only the
    r=2 row-system is affected; yaw stays free.
    """
    dtype = poses.dtype
    N = poses.shape[0]

    R_meas = quat_to_rotmat(rel_q)  # [E, 3, 3]
    w_e = edge_valid & valid[edge_i] & valid[edge_j]
    w_e = w_e.astype(dtype)

    # Unknown X: [N, 3, 3] with rows of R stacked; constraint per edge:
    # X_a @ R_ab = X_b  ->  for each of 3 rows r of X: R_ab^T X_a[r] = X_b[r]
    # Build normal equations over the 3N row-vectors (each 3-dim):
    # dims: for pose n, row r -> unknown vector u_{n,r} in R^3.
    # Edge contributes: || R_ab^T u_{a,r} - u_{b,r} ||^2 for r=0,1,2.
    # We solve the 3 "r" systems jointly since the operator is the same.
    # Assemble H [3N, 3N] blockwise (3x3 blocks), right-hand side from
    # fixed-rotation priors.
    H = jnp.zeros((3 * N, 3 * N), dtype)
    b = jnp.zeros((3 * N, 3), dtype)  # three row-systems share H

    A = R_meas.transpose(0, 2, 1)  # [E, 3, 3] = R_ab^T
    I3 = jnp.eye(3, dtype=dtype)

    # H_aa += A^T A ; H_bb += I ; H_ab -= A^T ; H_ba -= A
    AtA = jnp.einsum("eij,eik->ejk", A, A, precision="highest") * w_e[:, None, None]
    At = A.transpose(0, 2, 1) * w_e[:, None, None]
    ii = 3 * edge_i
    jj = 3 * edge_j

    def scatter_block(H, rows, cols, blocks):
        # H[rows[e]+a, cols[e]+b] += blocks[e, a, b]
        a3 = jnp.arange(3, dtype=rows.dtype)
        rr = jnp.broadcast_to(rows[:, None, None] + a3[None, :, None], blocks.shape)
        cc = jnp.broadcast_to(cols[:, None, None] + a3[None, None, :], blocks.shape)
        return H.at[rr.reshape(-1), cc.reshape(-1)].add(blocks.reshape(-1))

    H = scatter_block(H, ii, ii, AtA)
    H = scatter_block(
        H, jj, jj, jnp.broadcast_to(I3, AtA.shape) * w_e[:, None, None]
    )
    H = scatter_block(H, ii, jj, -At)
    H = scatter_block(H, jj, ii, -At.transpose(0, 2, 1))

    # priors on fixed rotations: weight * || u_{n,r} - R_n[r] ||^2
    R0 = quat_to_rotmat(poses[:, 3:])  # [N, 3, 3]
    wf = (fixed_mask & valid).astype(dtype) * fix_weight
    diag_add = jnp.repeat(wf, 3)
    H = H + jnp.diag(diag_add)
    # unknown index 3n+i is component i of u_{n,r} (r = which row-system),
    # so the prior RHS needs R0[n, r, i] laid out as b[3n+i, r] — the
    # per-pose blocks transpose
    b = b + (R0.transpose(0, 2, 1) * wf[:, None, None]).reshape(N * 3, 3)
    # tiny regularization for invalid/unconstrained poses
    inactive = 1.0 - jnp.repeat(valid.astype(dtype), 3)
    H = H + jnp.diag(inactive + jnp.asarray(1e-9, dtype))

    chol = jax.scipy.linalg.cho_factor(H)
    if gravity_weight > 0.0 and gravity_body is not None:
        # the gravity prior only touches the r=2 row-system, which
        # therefore gets its own (diagonal-shifted) factorization
        wg = valid.astype(dtype) * gravity_weight
        H2 = H + jnp.diag(jnp.repeat(wg, 3))
        b2 = b[:, 2] + (
            jnp.asarray(gravity_body, dtype) * wg[:, None]
        ).reshape(3 * N)
        X01 = jax.scipy.linalg.cho_solve(chol, b[:, :2])
        X2 = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(H2), b2
        )
        X = jnp.concatenate([X01, X2[:, None]], axis=1)
    else:
        X = jax.scipy.linalg.cho_solve(chol, b)  # X[3n+i, r] = R_n[r, i]
    R_sol = X.reshape(N, 3, 3).transpose(0, 2, 1)

    R_proj = _project_so3(
        R_sol, gravity_aware=gravity_weight > 0.0 and gravity_body is not None
    )
    q_new = rotmat_to_quat(R_proj)
    q_out = jnp.where(valid[:, None], q_new, poses[:, 3:])
    return jnp.concatenate([poses[:, :3], q_out], axis=-1)


def _project_so3(R_sol, gravity_aware: bool):
    """Project linear-solution matrices back to SO(3)
    (reference solveLinearRot:178-215 uses SVD). With gravity priors the
    plain SVD would smear the noisy-row tilt back into the pinned
    gravity row (each row is an independent linear system; only row 2
    carries the prior), so the gravity-aware path orthonormalizes WITH
    row 2 held fixed: tilt comes from the prior-pinned row, yaw from the
    other rows — keeping the initialized attitudes gravity-consistent,
    which is the point of the prior."""
    dtype = R_sol.dtype

    if not gravity_aware:
        def project(R):
            U, _, Vt = jnp.linalg.svd(R)
            det = jnp.linalg.det(U @ Vt)
            S = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype)).at[2, 2].set(det)
            return U @ S @ Vt

        return jax.vmap(project)(R_sol)

    def project_grav(R):
        r2 = R[2] / jnp.maximum(jnp.linalg.norm(R[2]), 1e-12)
        r0 = R[0] - jnp.dot(R[0], r2) * r2
        r0 = r0 / jnp.maximum(jnp.linalg.norm(r0), 1e-12)
        r1 = jnp.cross(r2, r0)
        return jnp.stack([r0, r1, r2])

    return jax.vmap(project_grav)(R_sol)


def chordal_rotation_init_pcg(
    poses,        # [N, 7] initial poses (rotations may be garbage)
    valid,        # [N] bool
    edge_i, edge_j,  # [E] int32
    rel_q,        # [E, 4] measured relative rotations (xyzw)
    edge_valid,   # [E] bool
    fixed_mask,   # [N] bool — rotations held at their current value
    fix_weight: float = 100.0,
    cg_iters: int = 150,
    cg_rtol: float = 1e-7,
    gravity_body=None,   # [N, 3] body-frame gravity direction per frame
    gravity_weight: float = 0.0,
):
    """Matrix-free variant of ``chordal_rotation_init`` for large graphs.

    Same chordal least squares, but the [3N, 3N] normal matrix is never
    formed: Hessian-matrix products are batched 3x3 block matvecs over
    edges with segment-sum scatters, preconditioned block-Jacobi — the
    O(E)-memory counterpart of the reference's SimplicialLLT sparse
    solve (reference rotation_initialization_base.hpp:146-176
    solveLinear). The three row-systems share the operator and are
    solved jointly (CG on the block RHS with a Frobenius inner product).

    CG is warm-started from the poses' current rotations: with block-
    Jacobi preconditioning, information travels ~one graph hop per CG
    step, so solving from zero needs O(graph diameter) iterations before
    far-from-anchor poses are determined at all. Odometry-chained
    rotations (the normal SLAM input) make this a local correction that
    converges in tens of steps regardless of graph size; for truly
    arbitrary input rotations raise ``cg_iters`` past the diameter.
    """
    dtype = poses.dtype
    N = poses.shape[0]

    A = quat_to_rotmat(rel_q).transpose(0, 2, 1)  # [E, 3, 3] = R_ab^T
    w_e = (edge_valid & valid[edge_i] & valid[edge_j]).astype(dtype)
    Aw = A * w_e[:, None, None]
    AtA = jnp.einsum("eij,eik->ejk", A, Aw, precision="highest")       # [E, 3, 3] w * A^T A

    R0 = quat_to_rotmat(poses[:, 3:])
    wf = (fixed_mask & valid).astype(dtype) * fix_weight
    inactive = 1.0 - valid.astype(dtype)
    diag_w = (wf + inactive + 1e-9)[:, None, None]

    # RHS from fixed-rotation priors; unknown V[n, i, r] = R_n[r, i]
    b = R0.transpose(0, 2, 1) * wf[:, None, None]  # [N, 3, 3]

    # gravity-prior rows (r=2 system only; see chordal_rotation_init)
    wg = (valid.astype(dtype) * gravity_weight
          if gravity_weight > 0.0 and gravity_body is not None
          else jnp.zeros((N,), dtype))
    if gravity_weight > 0.0 and gravity_body is not None:
        b = b.at[:, :, 2].add(jnp.asarray(gravity_body, dtype)
                              * wg[:, None])
    grav_diag = jnp.zeros((N, 1, 3), dtype).at[:, 0, 2].set(wg)

    def hvp(V):  # V: [N, 3, 3]
        Va, Vb = V[edge_i], V[edge_j]
        out_a = (jnp.einsum("eij,ejr->eir", AtA, Va, precision="highest")
                 - jnp.einsum("eji,ejr->eir", Aw, Vb, precision="highest"))   # A^T acting
        out_b = Vb * w_e[:, None, None] - jnp.einsum("eij,ejr->eir", Aw, Va, precision="highest")
        out = (jax.ops.segment_sum(out_a, edge_i, num_segments=N)
               + jax.ops.segment_sum(out_b, edge_j, num_segments=N))
        return out + diag_w * V + grav_diag * V

    # block-Jacobi preconditioner
    I3 = jnp.eye(3, dtype=dtype)
    Hd = (jax.ops.segment_sum(AtA, edge_i, num_segments=N)
          + jax.ops.segment_sum(
              w_e[:, None, None] * I3, edge_j, num_segments=N)
          + diag_w * I3)
    Minv = jnp.linalg.inv(Hd)

    def Minv_apply(V):
        return jnp.einsum("nij,njr->nir", Minv, V, precision="highest")

    X = R0.transpose(0, 2, 1)  # warm start from current rotations
    r = b - hvp(X)
    z = Minv_apply(r)
    p = z
    rz = jnp.sum(r * z)
    tol2 = (cg_rtol ** 2) * jnp.sum(r * r)  # relative to initial residual

    def step(carry, _):
        X, r, p, rz, done = carry
        Ap = hvp(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        X2 = X + alpha * p
        r2 = r - alpha * Ap
        z2 = Minv_apply(r2)
        rz2 = jnp.sum(r2 * z2)
        beta = rz2 / jnp.maximum(rz, 1e-30)
        p2 = z2 + beta * p
        done2 = done | (jnp.sum(r2 * r2) < tol2)
        keep = lambda new, old: jnp.where(done, old, new)
        return (keep(X2, X), keep(r2, r), keep(p2, p),
                jnp.where(done, rz, rz2), done2), None

    (X, _, _, _, _), _ = jax.lax.scan(
        step, (X, r, p, rz, jnp.asarray(False)), None, length=cg_iters
    )
    R_sol = X.transpose(0, 2, 1)  # V[n, i, r] -> R_n[r, i]

    R_proj = _project_so3(
        R_sol, gravity_aware=gravity_weight > 0.0 and gravity_body is not None
    )
    q_new = rotmat_to_quat(R_proj)
    q_out = jnp.where(valid[:, None], q_new, poses[:, 3:])
    return jnp.concatenate([poses[:, :3], q_out], axis=-1)


def linear_translation_init(
    poses,        # [N, 7] poses with initialized rotations
    valid,        # [N] bool
    edge_i, edge_j,  # [E] int32
    rel_t,        # [E, 3] measured relative translations (frame a)
    edge_valid,   # [E] bool
    fixed_mask,   # [N] bool — positions held at their current value
    fix_weight: float = 100.0,
    method: str = "dense",   # dense | cg
    cg_iters: int = 200,
    cg_rtol: float = 1e-8,
):
    """Linear position initialization given rotations (the reference's
    ``solveLinearPose6d(finetune_rot=false)`` stage,
    rotation_initialization_base.hpp:217-245, 331-360): per edge the
    residual ``p_b - p_a - R_a t_ab`` is linear in positions, and fixed
    frames add prior rows. Because every coefficient block is ±I, the
    normal matrix is a scalar [N, N] weighted graph Laplacian applied
    to 3 right-hand-side columns — one small Cholesky (dense path) or a
    Jacobi-preconditioned CG (matrix-free path for large graphs).

    Returns [N, 7] poses with positions replaced by the LS solution
    (rotations untouched).
    """
    dtype = poses.dtype
    N = poses.shape[0]

    Ra = quat_to_rotmat(poses[edge_i, 3:])
    t_world = jnp.einsum("eij,ej->ei", Ra, rel_t)          # R_a t_ab
    w_e = (edge_valid & valid[edge_i] & valid[edge_j]).astype(dtype)

    wf = (fixed_mask & valid).astype(dtype) * (fix_weight ** 2)
    inactive = 1.0 - valid.astype(dtype)
    diag_extra = wf + inactive + 1e-9

    # RHS: edge term scatters -/+ w * t_world; prior term w_f * p0
    b = (jax.ops.segment_sum(-w_e[:, None] * t_world, edge_i,
                             num_segments=N)
         + jax.ops.segment_sum(w_e[:, None] * t_world, edge_j,
                               num_segments=N)
         + wf[:, None] * poses[:, :3])

    diag = (jax.ops.segment_sum(w_e, edge_i, num_segments=N)
            + jax.ops.segment_sum(w_e, edge_j, num_segments=N)
            + diag_extra)

    if method == "dense":
        H = jnp.zeros((N, N), dtype)
        H = H.at[edge_i, edge_j].add(-w_e)
        H = H.at[edge_j, edge_i].add(-w_e)
        H = H + jnp.diag(diag)
        p_new = jax.scipy.linalg.solve(H, b, assume_a="pos")
    else:
        def hvp(x):  # x: [N, 3]
            xa, xb = x[edge_i], x[edge_j]
            d = w_e[:, None] * (xa - xb)
            return (jax.ops.segment_sum(d, edge_i, num_segments=N)
                    + jax.ops.segment_sum(-d, edge_j, num_segments=N)
                    + diag_extra[:, None] * x)

        Minv = (1.0 / diag)[:, None]
        x = poses[:, :3]  # warm start
        r = b - hvp(x)
        z = Minv * r
        p = z
        rz = jnp.sum(r * z)
        tol2 = (cg_rtol ** 2) * jnp.maximum(jnp.sum(b * b), 1e-30)

        def step(carry, _):
            x, r, p, rz, done = carry
            Ap = hvp(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
            x2 = x + alpha * p
            r2 = r - alpha * Ap
            z2 = Minv * r2
            rz2 = jnp.sum(r2 * z2)
            beta = rz2 / jnp.maximum(rz, 1e-30)
            p2 = z2 + beta * p
            done2 = done | (jnp.sum(r2 * r2) < tol2)
            keep = lambda new, old: jnp.where(done, old, new)
            return (keep(x2, x), keep(r2, r), keep(p2, p),
                    jnp.where(done, rz, rz2), done2), None

        (x, _, _, _, _), _ = jax.lax.scan(
            step, (x, r, p, rz, jnp.asarray(False)), None, length=cg_iters)
        p_new = x

    p_out = jnp.where(valid[:, None], p_new, poses[:, :3])
    return jnp.concatenate([p_out, poses[:, 3:]], axis=-1)
