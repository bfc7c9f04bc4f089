"""Large-scale pose-graph optimization: matrix-free LM + PCG.

The dense solver (`pose_graph.solve_pgo`) materializes the [E*dof, N*dof]
Jacobian — the right call at sliding-window scale, but O(N*E) memory
rules it out for city-scale graphs (10k poses -> a ~20 GB Jacobian).
This solver never forms J or H. Per LM iteration it keeps only the
per-edge residuals and the two [dof, dof] Jacobian blocks ([E, dof, dof]
each, a few MB at 100k edges) and solves the damped normal equations

    (J^T J + lam * diag) dx = -J^T r

with preconditioned conjugate gradients:

- Hessian-vector products are two batched block matvecs (gather pose
  blocks by edge endpoints, apply Ja/Jb, scatter-add transposes back
  with `segment_sum`) — pure vectorized work, no sparse formats, no
  data-dependent shapes.
- The preconditioner is the block-Jacobi inverse of the [N, dof, dof]
  diagonal blocks (batched Cholesky), the standard choice for bundle-
  adjustment-style systems.

This is the TPU-native counterpart of the reference's sparse Ceres path
for large graphs (reference: d2pgo/src/d2pgo.cpp:155-328 solve_single
uses Ceres SPARSE_NORMAL_CHOLESKY; rot_init uses Eigen SimplicialLLT).
Cost model: O(E * dof^2) per CG step, O(E + N) memory.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from d2slam_tpu.factors.residuals import relpose4d_residual, relpose_residual
from d2slam_tpu.geometry.lie import pose4d_boxplus, pose_boxplus
from d2slam_tpu.pgo.pose_graph import (
    PGOEdges,
    PGOLayout,
    PGOReport,
    PGOState,
)


def _edge_residual_fn(dof: int):
    if dof == 6:
        def f(pa, pb, rel, sqrt_info, da, db):
            return relpose_residual(
                pose_boxplus(pa, da), pose_boxplus(pb, db), rel, sqrt_info
            )
    else:
        def f(pa, pb, rel, sqrt_info, da, db):
            return relpose4d_residual(
                pose4d_boxplus(pa, da), pose4d_boxplus(pb, db), rel,
                sqrt_info[:4, :4],
            )
    return f


def _edge_linearize(state: PGOState, edges: PGOEdges, dof: int,
                    huber_delta: float, free):
    """Per-edge residuals + Jacobian blocks, Huber-weighted and masked.

    Returns (r [E, dof], Ja [E, dof, dof], Jb [E, dof, dof], cost [E]).
    Columns of fixed/invalid poses are zeroed so they never move.
    """
    dtype = state.poses.dtype
    f = _edge_residual_fn(dof)

    def one(ei, ej, rel, sqrt_info):
        pa, pb = state.poses[ei], state.poses[ej]
        z = jnp.zeros((dof,), dtype)
        r = f(pa, pb, rel, sqrt_info, z, z)
        Ja, Jb = jax.jacfwd(f, argnums=(4, 5))(pa, pb, rel, sqrt_info, z, z)
        return r, Ja, Jb

    r, Ja, Jb = jax.vmap(one)(edges.i, edges.j, edges.rel, edges.sqrt_info)

    valid = edges.valid & state.valid[edges.i] & state.valid[edges.j]
    sq = jnp.sum(r * r, axis=-1)
    d2 = huber_delta * huber_delta
    big = sq > d2
    hw = jnp.where(big, jnp.sqrt(d2 / jnp.maximum(sq, 1e-18)), 1.0)
    rho = jnp.where(
        big, 2 * huber_delta * jnp.sqrt(jnp.maximum(sq, 1e-18)) - d2, sq
    )
    w = (hw * valid.astype(dtype))[:, None]
    cost = 0.5 * rho * valid.astype(dtype)

    r = r * w
    Ja = Ja * w[:, :, None] * free[edges.i][:, None, None].astype(dtype)
    Jb = Jb * w[:, :, None] * free[edges.j][:, None, None].astype(dtype)
    return r, Ja, Jb, cost


def _edge_cost(state: PGOState, edges: PGOEdges, dof: int,
               huber_delta: float):
    dtype = state.poses.dtype
    f = _edge_residual_fn(dof)
    z = jnp.zeros((dof,), dtype)

    def one(ei, ej, rel, sqrt_info):
        return f(state.poses[ei], state.poses[ej], rel, sqrt_info, z, z)

    r = jax.vmap(one)(edges.i, edges.j, edges.rel, edges.sqrt_info)
    valid = edges.valid & state.valid[edges.i] & state.valid[edges.j]
    sq = jnp.sum(r * r, axis=-1)
    d2 = huber_delta * huber_delta
    rho = jnp.where(
        sq > d2, 2 * huber_delta * jnp.sqrt(jnp.maximum(sq, 1e-18)) - d2, sq
    )
    return jnp.sum(0.5 * rho * valid.astype(state.poses.dtype))


def _block_diag_hessian(Ja, Jb, idx_i, idx_j, N: int):
    """[N, dof, dof] diagonal blocks of J^T J via segment sums."""
    Hi = jnp.einsum("eki,ekj->eij", Ja, Ja, precision="highest")
    Hj = jnp.einsum("eki,ekj->eij", Jb, Jb, precision="highest")
    return (jax.ops.segment_sum(Hi, idx_i, num_segments=N)
            + jax.ops.segment_sum(Hj, idx_j, num_segments=N))


def _grad(r, Ja, Jb, idx_i, idx_j, N: int):
    gi = jnp.einsum("eki,ek->ei", Ja, r, precision="highest")
    gj = jnp.einsum("eki,ek->ei", Jb, r, precision="highest")
    return (jax.ops.segment_sum(gi, idx_i, num_segments=N)
            + jax.ops.segment_sum(gj, idx_j, num_segments=N))


def _pcg(hvp, Minv_apply, b, iters: int, rtol: float):
    """Standard PCG on hvp(x) = b, frozen once converged (static trip
    count so the whole solve stays one XLA program)."""
    x = jnp.zeros_like(b)
    r = b
    z = Minv_apply(r)
    p = z
    rz = jnp.sum(r * z)
    b_norm = jnp.sqrt(jnp.sum(b * b))
    tol2 = (rtol * b_norm) ** 2

    def step(carry, _):
        x, r, p, rz, done = carry
        Ap = hvp(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x2 = x + alpha * p
        r2 = r - alpha * Ap
        z2 = Minv_apply(r2)
        rz2 = jnp.sum(r2 * z2)
        beta = rz2 / jnp.maximum(rz, 1e-30)
        p2 = z2 + beta * p
        done2 = done | (jnp.sum(r2 * r2) < tol2)
        keep = lambda new, old: jnp.where(done, old, new)
        return (keep(x2, x), keep(r2, r), keep(p2, p),
                jnp.where(done, rz, rz2), done2), None

    (x, _, _, _, _), _ = jax.lax.scan(
        step, (x, r, p, rz, jnp.asarray(False)), None, length=iters
    )
    return x


@functools.partial(
    jax.jit,
    static_argnames=("layout", "max_iters", "cg_iters", "huber_delta",
                     "lambda_init", "cg_rtol"),
)
def solve_pgo_pcg(
    layout: PGOLayout,
    state: PGOState,
    edges: PGOEdges,
    fixed_mask,  # [N] bool — poses held constant (gauge)
    *,
    max_iters: int = 10,
    cg_iters: int = 60,
    cg_rtol: float = 1e-5,
    huber_delta: float = 0.5,
    lambda_init: float = 1e-6,
):
    """Matrix-free LM pose-graph solve; same contract as ``solve_pgo``
    but O(E) memory — use for graphs beyond a few thousand poses."""
    dof = layout.pose_dof
    dtype = state.poses.dtype
    N = layout.N
    boxplus = pose_boxplus if dof == 6 else pose4d_boxplus

    free_b = state.valid & ~fixed_mask
    free = free_b.astype(dtype)
    eps = jnp.asarray(1e-9, dtype)

    def apply_delta(s: PGOState, dx):
        return s._replace(poses=jax.vmap(boxplus)(s.poses, dx))

    def iteration(carry, _):
        s, cost, lam = carry
        r, Ja, Jb, _ = _edge_linearize(s, edges, dof, huber_delta, free)
        g = _grad(r, Ja, Jb, edges.i, edges.j, N)           # [N, dof]
        Hd = _block_diag_hessian(Ja, Jb, edges.i, edges.j, N)
        diagH = jnp.diagonal(Hd, axis1=1, axis2=2)           # [N, dof]
        damp = lam * diagH + eps

        def hvp(v):  # v: [N, dof]
            u = (jnp.einsum("ekl,el->ek", Ja, v[edges.i], precision="highest")
                 + jnp.einsum("ekl,el->ek", Jb, v[edges.j], precision="highest"))
            out = (jax.ops.segment_sum(
                       jnp.einsum("ekl,ek->el", Ja, u, precision="highest"), edges.i,
                       num_segments=N)
                   + jax.ops.segment_sum(
                       jnp.einsum("ekl,ek->el", Jb, u, precision="highest"), edges.j,
                       num_segments=N))
            return out + damp * v

        # block-Jacobi preconditioner (identity on fixed/invalid blocks)
        M = Hd + jax.vmap(jnp.diag)(damp)
        eye = jnp.eye(dof, dtype=dtype)
        M = jnp.where(free_b[:, None, None], M, eye)
        Minv = jnp.linalg.inv(M)

        def Minv_apply(v):
            return jnp.einsum("nkl,nl->nk", Minv, v, precision="highest")

        dx = _pcg(hvp, Minv_apply, -g, cg_iters, cg_rtol)
        dx = dx * free[:, None]
        cand = apply_delta(s, dx)
        cand_cost = _edge_cost(cand, edges, dof, huber_delta)
        accept = cand_cost < cost
        s2 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), cand, s
        )
        return (
            s2,
            jnp.where(accept, cand_cost, cost),
            jnp.where(accept, lam * 0.25, lam * 10.0),
        ), accept

    cost0 = _edge_cost(state, edges, dof, huber_delta)
    (final, cost, _), accepts = jax.lax.scan(
        iteration, (state, cost0, jnp.asarray(lambda_init, dtype)),
        None, length=max_iters,
    )
    return final, PGOReport(
        initial_cost=cost0, final_cost=cost, accepted=jnp.sum(accepts)
    )


# ---------------------------------------------------------------------------
# anchored variant (ARock local solves at scale)
# ---------------------------------------------------------------------------


def _anchor_resid_fn(dof: int, rho_T: float, rho_theta: float):
    from d2slam_tpu.factors.residuals import consensus_pose_residual
    from d2slam_tpu.geometry.lie import yaw_from_quat

    sT = float(np.sqrt(rho_T))
    sth = float(np.sqrt(rho_theta))

    if dof == 6:
        def f(pose, ref):
            z = jnp.zeros((3,), pose.dtype)
            return consensus_pose_residual(pose, ref, z, z, rho_T, rho_theta)
    else:
        def f(pose, ref):
            dyaw = yaw_from_quat(pose[3:]) - yaw_from_quat(ref[3:])
            dyaw = jnp.arctan2(jnp.sin(dyaw), jnp.cos(dyaw))
            return jnp.concatenate(
                [sT * (pose[:3] - ref[:3]), sth * dyaw[None]]
            )
    return f


@functools.partial(
    jax.jit,
    static_argnames=("layout", "rho_T", "rho_theta", "max_iters",
                     "cg_iters", "huber_delta", "lambda_init", "cg_rtol"),
)
def solve_pgo_pcg_anchored(
    layout: PGOLayout,
    state: PGOState,
    edges: PGOEdges,
    fixed_mask,
    anchor_idx,      # [K] int32 pose slots
    anchor_pose,     # [K, 7] dual poses to anchor at
    anchor_active,   # [K] bool
    *,
    rho_T: float = 0.1,
    rho_theta: float = 2.0,
    max_iters: int = 6,
    cg_iters: int = 60,
    cg_rtol: float = 1e-5,
    huber_delta: float = 1.0,
    lambda_init: float = 1e-6,
):
    """``solve_pgo_anchored`` semantics (consensus anchor rows pulling
    poses toward ARock duals, reference setDualStateFactors
    ARock.cpp:256-314) at ``solve_pgo_pcg`` scale: anchors enter the
    matrix-free normal equations as unary blocks — O(E + N + K) memory,
    no dense Jacobian. This is the long-mission local solve of
    TransportDPGO once the graph outgrows the dense path."""
    dof = layout.pose_dof
    dtype = state.poses.dtype
    N = layout.N
    boxplus = pose_boxplus if dof == 6 else pose4d_boxplus
    aresid = _anchor_resid_fn(dof, rho_T, rho_theta)

    free_b = state.valid & ~fixed_mask
    free = free_b.astype(dtype)
    eps = jnp.asarray(1e-9, dtype)

    def anchor_linearize(s):
        def one(idx, ref, act):
            pose = s.poses[idx]

            def f(d):
                return aresid(boxplus(pose, d), ref)

            z = jnp.zeros((dof,), dtype)
            r = f(z)
            J = jax.jacfwd(f)(z)
            w = act.astype(dtype) * s.valid[idx].astype(dtype)
            return r * w, J * w

        return jax.vmap(one)(anchor_idx, anchor_pose, anchor_active)

    def anchor_cost(s):
        r, _ = anchor_linearize(s)
        return 0.5 * jnp.sum(r * r)

    def total_cost(s):
        return _edge_cost(s, edges, dof, huber_delta) + anchor_cost(s)

    def apply_delta(s: PGOState, dx):
        return s._replace(poses=jax.vmap(boxplus)(s.poses, dx))

    def iteration(carry, _):
        s, cost, lam = carry
        r, Ja, Jb, _ = _edge_linearize(s, edges, dof, huber_delta, free)
        ra, Jan = anchor_linearize(s)                       # [K,dof],[K,dof,dof]
        g = _grad(r, Ja, Jb, edges.i, edges.j, N)
        g = g + jax.ops.segment_sum(
            jnp.einsum("kli,kl->ki", Jan, ra, precision="highest"),
            anchor_idx, num_segments=N,
        )
        Hd = _block_diag_hessian(Ja, Jb, edges.i, edges.j, N)
        Hd = Hd + jax.ops.segment_sum(
            jnp.einsum("kli,klj->kij", Jan, Jan, precision="highest"),
            anchor_idx, num_segments=N,
        )
        diagH = jnp.diagonal(Hd, axis1=1, axis2=2)
        damp = lam * diagH + eps

        def hvp(v):
            u = (jnp.einsum("ekl,el->ek", Ja, v[edges.i], precision="highest")
                 + jnp.einsum("ekl,el->ek", Jb, v[edges.j], precision="highest"))
            out = (jax.ops.segment_sum(
                       jnp.einsum("ekl,ek->el", Ja, u, precision="highest"),
                       edges.i, num_segments=N)
                   + jax.ops.segment_sum(
                       jnp.einsum("ekl,ek->el", Jb, u, precision="highest"),
                       edges.j, num_segments=N))
            ua = jnp.einsum("kli,ki->kl", Jan, v[anchor_idx],
                            precision="highest")
            out = out + jax.ops.segment_sum(
                jnp.einsum("kli,kl->ki", Jan, ua, precision="highest"),
                anchor_idx, num_segments=N,
            )
            return out + damp * v

        M = Hd + jax.vmap(jnp.diag)(damp)
        eye = jnp.eye(dof, dtype=dtype)
        M = jnp.where(free_b[:, None, None], M, eye)
        Minv = jnp.linalg.inv(M)

        def Minv_apply(v):
            return jnp.einsum("nkl,nl->nk", Minv, v, precision="highest")

        dx = _pcg(hvp, Minv_apply, -g, cg_iters, cg_rtol)
        dx = dx * free[:, None]
        cand = apply_delta(s, dx)
        cand_cost = total_cost(cand)
        accept = cand_cost < cost
        s2 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), cand, s
        )
        return (
            s2,
            jnp.where(accept, cand_cost, cost),
            jnp.where(accept, lam * 0.25, lam * 10.0),
        ), accept

    cost0 = total_cost(state)
    (final, cost, _), accepts = jax.lax.scan(
        iteration, (state, cost0, jnp.asarray(lambda_init, dtype)),
        None, length=max_iters,
    )
    return final, (cost0, cost, jnp.sum(accepts))
