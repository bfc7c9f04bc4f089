"""Batched pose-graph optimization on TPU.

TPU-native equivalent of the reference's D2PGO Ceres solve
(reference: d2pgo/src/d2pgo.cpp:155-328 solve_single/setupLoopFactors/
setupEgoMotionFactors): all edges — ego-motion odometry and loop
closures, 6-DoF or 4-DoF — are one padded edge array; linearization is
vmapped AD through the retraction; the normal equations are one GEMM
and a dense Cholesky. Same fixed-iteration LM trust-region pattern as
the VIO solver.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from d2slam_tpu.factors.residuals import (
    gravity_prior_residual,
    relpose4d_residual,
    relpose_residual,
)
from d2slam_tpu.geometry.lie import pose_boxplus, pose4d_boxplus


class PGOLayout(NamedTuple):
    N: int          # max poses
    E: int          # max edges
    pose_dof: int = 6   # 6 or 4 (reference PGO_POSE_DOF)

    @property
    def D(self) -> int:
        return self.N * self.pose_dof

    @property
    def D_pad(self) -> int:
        return ((self.D + 127) // 128) * 128


class PGOState(NamedTuple):
    poses: jax.Array  # [N, 7]
    valid: jax.Array  # [N] bool

    @staticmethod
    def zeros(layout: PGOLayout, dtype=jnp.float32) -> "PGOState":
        q = jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1], dtype), (layout.N, 1))
        return PGOState(poses=q, valid=jnp.zeros((layout.N,), bool))


class PGOEdges(NamedTuple):
    """Padded relative-pose edges (odometry + loops)."""

    i: jax.Array          # [E] int32
    j: jax.Array          # [E] int32
    rel: jax.Array        # [E, 7] measured i_T_j
    sqrt_info: jax.Array  # [E, 6, 6] (only [:4,:4] used in 4-DoF mode)
    valid: jax.Array      # [E] bool

    @staticmethod
    def empty(layout: PGOLayout, dtype=jnp.float32) -> "PGOEdges":
        E = layout.E
        return PGOEdges(
            i=jnp.zeros((E,), jnp.int32),
            j=jnp.zeros((E,), jnp.int32),
            rel=jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1], dtype), (E, 1)),
            sqrt_info=jnp.tile(jnp.eye(6, dtype=dtype), (E, 1, 1)),
            valid=jnp.zeros((E,), bool),
        )


class PGOReport(NamedTuple):
    initial_cost: jax.Array
    final_cost: jax.Array
    accepted: jax.Array


def _build_rows(layout: PGOLayout, state: PGOState, edges: PGOEdges,
                huber_delta: float):
    """[E*dof, D_pad] weighted rows + residuals."""
    dof = layout.pose_dof
    dtype = state.poses.dtype
    D = layout.D_pad

    def one(ei, ej, rel, sqrt_info):
        pa, pb = state.poses[ei], state.poses[ej]

        if dof == 6:
            def f(da, db):
                return relpose_residual(
                    pose_boxplus(pa, da), pose_boxplus(pb, db), rel, sqrt_info
                )
        else:
            def f(da, db):
                return relpose4d_residual(
                    pose4d_boxplus(pa, da), pose4d_boxplus(pb, db), rel,
                    sqrt_info[:4, :4],
                )

        z = jnp.zeros((dof,), dtype)
        r = f(z, z)
        Ja, Jb = jax.jacfwd(f, argnums=(0, 1))(z, z)
        from d2slam_tpu.solver.vio_assembly import place_block

        row = place_block(Ja, dof * ei, D) + place_block(Jb, dof * ej, D)
        return r, row

    r, rows = jax.vmap(one)(edges.i, edges.j, edges.rel, edges.sqrt_info)

    valid = edges.valid & state.valid[edges.i] & state.valid[edges.j]
    sq = jnp.sum(r * r, axis=-1)
    d2 = huber_delta * huber_delta
    big = sq > d2
    hw = jnp.where(big, jnp.sqrt(d2 / jnp.maximum(sq, 1e-18)), 1.0)
    rho = jnp.where(big, 2 * huber_delta * jnp.sqrt(jnp.maximum(sq, 1e-18)) - d2, sq)
    w = (hw * valid.astype(dtype))[:, None]
    cost = 0.5 * rho * valid.astype(dtype)
    Eed = edges.i.shape[0]
    return (rows * w[:, :, None]).reshape(Eed * dof, D), (r * w).reshape(-1), cost


def predicted_odometry(optimized_pose, ego_pose_at_opt, ego_pose_now):
    """Extrapolate an optimized pose with the ego-motion accumulated
    since (reference D2PGO::getPredictedOdoms, d2pgo.cpp:663-700: the
    realtime output between PGO updates). All args [..., 7]."""
    from d2slam_tpu.geometry.lie import pose_compose, pose_inverse

    rel = pose_compose(pose_inverse(ego_pose_at_opt), ego_pose_now)
    return pose_compose(optimized_pose, rel)


def solve_pgo(
    layout: PGOLayout,
    state: PGOState,
    edges: PGOEdges,
    fixed_mask,  # [N] bool — poses held constant (gauge, e.g. first frame)
    *,
    max_iters: int = 10,
    huber_delta: float = 0.5,
    lambda_init: float = 1e-6,
):
    """LM pose-graph solve. Returns (new_state, PGOReport)."""
    dof = layout.pose_dof
    dtype = state.poses.dtype
    D = layout.D_pad

    col_free = jnp.zeros((D,), dtype)
    per_pose = (state.valid & ~fixed_mask).astype(dtype)
    col_free = col_free.at[: layout.D].set(jnp.repeat(per_pose, dof))

    boxplus = pose_boxplus if dof == 6 else pose4d_boxplus

    def apply_delta(s: PGOState, dx):
        d = dx[: layout.D].reshape(layout.N, dof)
        return s._replace(poses=jax.vmap(boxplus)(s.poses, d))

    def build(s):
        return _build_rows(layout, s, edges, huber_delta)

    def iteration(carry, _):
        s, cost, lam = carry
        J, r, _ = build(s)
        J = J * col_free[None, :]
        H = J.T @ J
        g = J.T @ r
        H = H + lam * jnp.diag(jnp.diag(H)) + jnp.diag(1.0 - col_free) \
            + 1e-9 * jnp.eye(D, dtype=dtype)
        chol = jax.scipy.linalg.cho_factor(H)
        dx = -jax.scipy.linalg.cho_solve(chol, g) * col_free
        cand = apply_delta(s, dx)
        _, _, cost_terms = build(cand)
        cand_cost = jnp.sum(cost_terms)
        accept = cand_cost < cost
        s2 = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, a, b), cand, s)
        return (
            s2,
            jnp.where(accept, cand_cost, cost),
            jnp.where(accept, lam * 0.25, lam * 10.0),
        ), accept

    _, _, cost0_terms = build(state)
    cost0 = jnp.sum(cost0_terms)
    vzero = jnp.sum(state.poses) * 0.0
    (final, cost, _), accepts = jax.lax.scan(
        iteration, (state, cost0, jnp.asarray(lambda_init, dtype) + vzero),
        None, length=max_iters,
    )
    return final, PGOReport(
        initial_cost=cost0, final_cost=cost, accepted=jnp.sum(accepts)
    )
