"""Pairwise Consistency Maximization (PCM) loop-outlier rejection.

Re-implements the reference's swarm_outlier_rejection
(reference: d2pgo/src/swarm_outlier_rejection/swarm_outlier_rejection.cpp
:199-201 + third_party/fast_max-clique_finder): inter-robot loop edges
are mutually consistent when the cycle formed by two loops and the two
odometry segments between their endpoints has small Mahalanobis norm;
the accepted set is the maximum clique of the consistency graph.

The O(L^2) cycle evaluation is batched on device; the max-clique search
is an exact Bron-Kerbosch with pivoting on the host (clique sizes here
are tens of loops, far below the third_party solver's regime).
"""
from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d2slam_tpu.geometry.lie import pose_boxminus, pose_compose, pose_inverse


def pairwise_consistency(
    loops_rel,   # [L, 7] measured a_T_b per loop
    poses_a,     # [L, 7] odometry pose of endpoint a (in robot A's frame)
    poses_b,     # [L, 7] odometry pose of endpoint b (in robot B's frame)
    sqrt_info_diag,  # [6] per-dof sqrt information for the Mahalanobis norm
):
    """Consistency distance matrix [L, L].

    d(k,l) = || (T_ak^-1 T_al) * rel_l * (T_bk^-1 T_bl)^-1  vs  rel_k ||
    in the tangent space, weighted by sqrt_info_diag.
    """
    def cycle(k, l):
        T_ak_al = pose_compose(pose_inverse(poses_a[k]), poses_a[l])
        T_bk_bl = pose_compose(pose_inverse(poses_b[k]), poses_b[l])
        pred_rel_k = pose_compose(
            pose_compose(T_ak_al, loops_rel[l]), pose_inverse(T_bk_bl)
        )
        d = pose_boxminus(pred_rel_k, loops_rel[k])
        return jnp.linalg.norm(d * sqrt_info_diag)

    L = loops_rel.shape[0]
    idx = jnp.arange(L)
    return jax.vmap(lambda k: jax.vmap(lambda l: cycle(k, l))(idx))(idx)


def max_clique(adj: np.ndarray) -> List[int]:
    """Exact max clique via Bron-Kerbosch with pivoting (host-side)."""
    n = adj.shape[0]
    best: List[int] = []
    neighbors = [set(np.flatnonzero(adj[i]).tolist()) - {i} for i in range(n)]

    def bk(r: set, p: set, x: set):
        nonlocal best
        if not p and not x:
            if len(r) > len(best):
                best = sorted(r)
            return
        if len(r) + len(p) <= len(best):
            return  # bound
        pivot = max(p | x, key=lambda v: len(neighbors[v] & p))
        for v in list(p - neighbors[pivot]):
            bk(r | {v}, p & neighbors[v], x & neighbors[v])
            p = p - {v}
            x = x | {v}

    bk(set(), set(range(n)), set())
    return best


def pcm_filter(
    loops_rel: np.ndarray,
    poses_a: np.ndarray,
    poses_b: np.ndarray,
    thres: float = 1.5,
    sqrt_info_diag=None,
) -> np.ndarray:
    """Returns a boolean keep-mask over loops (reference
    OutlierRejectionLoopEdges with pcm_thres)."""
    L = len(loops_rel)
    if L == 0:
        return np.zeros(0, bool)
    if L == 1:
        return np.ones(1, bool)
    if sqrt_info_diag is None:
        sqrt_info_diag = jnp.asarray([1.0, 1, 1, 3, 3, 3], jnp.float64)
    D = np.asarray(
        pairwise_consistency(
            jnp.asarray(loops_rel), jnp.asarray(poses_a), jnp.asarray(poses_b),
            sqrt_info_diag,
        )
    )
    adj = (np.maximum(D, D.T) < thres) & ~np.eye(L, dtype=bool)
    keep = max_clique(adj.astype(np.uint8))
    mask = np.zeros(L, bool)
    mask[list(keep)] = True
    return mask
