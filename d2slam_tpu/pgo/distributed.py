"""Distributed pose-graph optimization over the robot mesh.

SPMD re-formulation of the reference's ARock asynchronous ADMM PGO
(reference: d2common/src/solver/ARock.cpp:140-190 main loop +
d2pgo/src/ARockPGO.cpp): each robot owns a partition of the global pose
array, also estimates the boundary poses it shares loop/odometry edges
with, and exchanges dual state through mesh collectives. The reference's
asynchrony (skip-if-stale, max_wait_steps) exists to tolerate lossy UAV
links; on a TPU slice the rounds are bulk-synchronous and robots signal
non-participation with activity masks instead — the ADMM math (pose
averaging, eta_k dual relaxation) is preserved.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from d2slam_tpu.factors.residuals import consensus_pose_residual
from d2slam_tpu.geometry.lie import pose_boxplus
from d2slam_tpu.parallel.consensus import consensus_average, dual_update
from d2slam_tpu.pgo.pose_graph import PGOEdges, PGOLayout, PGOState, solve_pgo


class ARockPGOCarry(NamedTuple):
    state: PGOState
    tilde: jax.Array  # [N, 6] dual per pose


def arock_pgo_round(
    layout: PGOLayout,
    carry: ARockPGOCarry,
    edges: PGOEdges,
    *,
    axis_name: str,
    est_mask,    # [N] bool — poses this robot estimates (own + boundary)
    own_mask,    # [N] bool — poses this robot owns (gauge & output)
    fixed_mask,  # [N] bool — global gauge poses
    edge_mask,   # [E] bool — edges assigned to THIS robot. Every edge
                 # must belong to exactly one robot (the reference's
                 # per-robot keyframe graphs); double-assignment would
                 # double-count its information in the consensus.
    eta: float = 0.9,     # reference ARockSolverConfig eta_k relaxation
    rho: float = 100.0,
    max_iters: int = 4,
    huber_delta: float = 0.5,
):
    """One bulk-synchronous ARock/ADMM round inside shard_map."""
    state, tilde = carry.state, carry.tilde
    dtype = state.poses.dtype

    global_poses = consensus_average(state.poses, est_mask, axis_name)
    # poses estimated by >= 2 robots are the consensus variables; the
    # penalty applies to EVERY copy (owner included) or information from
    # neighbors' edges could never flow back to the owner
    n_est = jax.lax.psum(est_mask.astype(dtype), axis_name)
    shared = est_mask & (n_est >= 2.0)

    # eta_k relaxation: new duals blend with old (reference
    # updateDualStates ARock.cpp:24-84)
    tilde_full = dual_update(state.poses, global_poses, tilde, shared)
    tilde = eta * tilde_full + (1.0 - eta) * tilde
    new_state, report = _solve_with_consensus(
        layout, state, edges, fixed_mask, global_poses, tilde, shared,
        rho=rho, max_iters=max_iters, huber_delta=huber_delta,
        est_mask=est_mask, edge_mask=edge_mask,
    )
    return ARockPGOCarry(state=new_state, tilde=tilde), report


def distributed_pgo_solve(
    layout: PGOLayout,
    state: PGOState,
    edges: PGOEdges,
    *,
    axis_name: str,
    est_mask,
    own_mask,
    fixed_mask,
    edge_mask,
    rounds: int = 8,
    rot_init: bool = True,
    gravity_body=None,
    gravity_weight: float = 0.0,
    rot_init_rounds: int = 2,
    rot_init_eps: float = 1e-4,
    **round_kw,
):
    """The reference's full far-field sequence inside shard_map:
    chordal rotation initialization (on this robot's known graph) first,
    then ARock/ADMM rounds (reference d2pgo.cpp:155-328 solve_multi:
    RotInit -> waitForRotInitFinish -> ARockPGO). The rot-init result is
    itself consensus-averaged so all robots start the rounds from a
    common attitude field; iteration stops when the cross-robot state
    change drops below ``rot_init_eps`` (the reference's convergence
    detection, d2pgo.cpp:350-360 — the ROT_INIT_FINISH barrier is the
    collective itself in SPMD form). ``gravity_body``/``gravity_weight``
    add the per-frame attitude priors
    (rotation_initialization_base.hpp:131-144) that keep noisy
    multi-robot graphs from tilting the gravity gauge.
    """
    from d2slam_tpu.geometry.lie import pose_boxminus, quat_normalize
    from d2slam_tpu.pgo.rot_init import (
        chordal_rotation_init,
        linear_translation_init,
    )

    poses = state.poses
    if rot_init:
        # initialization uses ALL edges this robot knows about — the
        # per-robot edge split only matters for the consensus objective
        # (double-counting); an initial guess has no such concern
        # (reference: every drone's RotInit runs on its full received
        # graph, rotation_initialization_base.hpp)
        act = edges.valid & est_mask[edges.i] & est_mask[edges.j]
        converged = jnp.asarray(False)
        for _ in range(max(rot_init_rounds, 1)):
            prev = poses
            new = chordal_rotation_init(
                poses, state.valid, edges.i, edges.j,
                quat_normalize(edges.rel[:, 3:]), act, fixed_mask,
                gravity_body=gravity_body, gravity_weight=gravity_weight,
            )
            # linear position init given the new rotations (reference
            # solveLinearPose6d after rot-init, RotInit::solve)
            new = linear_translation_init(
                new, state.valid, edges.i, edges.j, edges.rel[:, :3], act,
                fixed_mask,
            )
            # average the initialized poses across robots (the sync
            # point standing in for the ROT_INIT_FINISH barrier)
            new = consensus_average(new, est_mask, axis_name)
            poses = jnp.where(converged, prev, new)
            d = jax.vmap(pose_boxminus)(poses, prev)
            change = jnp.max(
                jnp.abs(d) * state.valid[:, None].astype(d.dtype)
            )
            change = jax.lax.pmax(change, axis_name)
            converged = converged | (change < rot_init_eps)
        state = state._replace(poses=poses)

    carry = ARockPGOCarry(
        state=state, tilde=jnp.zeros((layout.N, 6), poses.dtype)
    )
    report = None
    for _ in range(rounds):
        carry, report = arock_pgo_round(
            layout, carry, edges, axis_name=axis_name, est_mask=est_mask,
            own_mask=own_mask, fixed_mask=fixed_mask, edge_mask=edge_mask,
            **round_kw,
        )
    return carry.state, report


def _solve_with_consensus(
    layout, state, edges, fixed_mask, ref_poses, tilde, active,
    *, rho, max_iters, huber_delta, est_mask, edge_mask,
):
    """solve_pgo with extra consensus penalty rows, expressed by
    augmenting the edge set with unary consensus 'edges' folded into the
    LM loop via a wrapper build (kept simple: penalty rows are
    implemented as strong relative-pose edges to a virtual fixed anchor
    is NOT equivalent — instead we reuse solve_pgo's machinery by
    appending rows inside a custom iteration here)."""
    import jax.scipy.linalg as jsl

    from d2slam_tpu.pgo.pose_graph import _build_rows

    dof = layout.pose_dof
    dtype = state.poses.dtype
    D = layout.D_pad
    boxplus = pose_boxplus  # consensus only supported in 6-dof mode

    col_free = jnp.zeros((D,), dtype)
    per_pose = (state.valid & est_mask & ~fixed_mask).astype(dtype)
    col_free = col_free.at[: layout.D].set(jnp.repeat(per_pose, dof))

    def consensus_rows(s):
        def one(n, pose, ref, t, act):
            def f(d):
                return consensus_pose_residual(
                    boxplus(pose, d), ref, t[:3], t[3:], rho, rho
                )

            z = jnp.zeros((6,), dtype)
            r = f(z)
            J = jax.jacfwd(f)(z)
            from d2slam_tpu.solver.vio_assembly import place_block

            row = place_block(J, 6 * n, D)
            w = act.astype(dtype)
            return r * w, row * w

        N = layout.N
        r, rows = jax.vmap(one)(
            jnp.arange(N, dtype=jnp.int32), s.poses, ref_poses, tilde,
            active & s.valid,
        )
        return rows.reshape(N * 6, D), r.reshape(-1)

    def build(s):
        J1, r1, cost1 = _build_rows(layout, s, edges, huber_delta)
        # only this robot's assigned edges, and only those whose
        # endpoints it estimates
        edge_act = edge_mask & est_mask[edges.i] & est_mask[edges.j]
        w = jnp.repeat(edge_act.astype(dtype), dof)
        J1, r1 = J1 * w[:, None], r1 * w
        cost1 = cost1 * edge_act.astype(dtype)
        J2, r2 = consensus_rows(s)
        J = jnp.concatenate([J1, J2], axis=0)
        r = jnp.concatenate([r1, r2])
        cost = jnp.sum(cost1) + 0.5 * jnp.sum(r2 * r2)
        return J, r, cost

    def apply_delta(s, dx):
        d = dx[: layout.D].reshape(layout.N, dof)
        return s._replace(poses=jax.vmap(boxplus)(s.poses, d))

    def iteration(carry, _):
        s, cost, lam = carry
        J, r, _ = build(s)
        J = J * col_free[None, :]
        H = J.T @ J
        g = J.T @ r
        H = H + lam * jnp.diag(jnp.diag(H)) + jnp.diag(1.0 - col_free) \
            + 1e-9 * jnp.eye(D, dtype=dtype)
        dx = -jsl.cho_solve(jsl.cho_factor(H), g) * col_free
        cand = apply_delta(s, dx)
        _, _, cand_cost = build(cand)
        accept = cand_cost < cost
        s2 = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, a, b), cand, s)
        return (
            s2, jnp.where(accept, cand_cost, cost),
            jnp.where(accept, lam * 0.25, lam * 10.0),
        ), accept

    _, _, cost0 = build(state)
    vzero = jnp.sum(state.poses) * 0.0
    (final, cost, _), accepts = jax.lax.scan(
        iteration, (state, cost0, jnp.asarray(1e-6, dtype) + vzero),
        None, length=max_iters,
    )
    return final, (cost0, cost, jnp.sum(accepts))
