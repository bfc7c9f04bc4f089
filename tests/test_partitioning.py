"""Streaming pose-graph partitioning (FENNEL/LDG) and solver masks."""
import numpy as np
import pytest

from d2slam_tpu.pgo.partitioning import (
    partition_stats,
    partition_to_masks,
    repartition,
    stream_partition,
)


def _chain_with_loops(n=60, loop_stride=11):
    edges = [(k, k + 1) for k in range(n - 1)]
    edges += [(k, k + loop_stride - 1) for k in range(0, n - loop_stride, loop_stride)]
    return n, edges


def test_fennel_balances_and_cuts_little():
    n, edges = _chain_with_loops()
    for method in ("fennel", "ldg"):
        parts = stream_partition(n, edges, 4, method=method)
        s = partition_stats(parts, edges, 4)
        assert sorted(np.unique(parts)) == [0, 1, 2, 3]
        assert s["imbalance"] < 1.5, (method, s)
        # a time-ordered chain should split into near-contiguous arcs:
        # the cut stays a small fraction of the edges
        assert s["cut_ratio"] < 0.25, (method, s)
        assert sum(s["comm_volume"]) >= s["edge_cut"]  # boundary >= cut pairs/2


def test_fennel_capacity_cap():
    # star graph: every vertex adjacent to 0 — greedy-by-affinity would
    # dump everything into vertex 0's part; the nu cap forces spill
    n = 40
    edges = [(0, k) for k in range(1, n)]
    parts = stream_partition(n, edges, 4, method="fennel", nu=1.1)
    sizes = np.bincount(parts, minlength=4)
    assert sizes.max() <= int(1.1 * n / 4) + 1


def test_repartition_stickiness():
    n, edges = _chain_with_loops()
    old = stream_partition(n, edges, 4)
    # graph grows by 12 vertices
    n2 = n + 12
    edges2 = edges + [(k, k + 1) for k in range(n - 1, n2 - 1)]
    new = repartition(n2, edges2, 4, old, sticky_bonus=2.0)
    # old vertices mostly keep their assignment
    keep = np.mean(new[:n] == old)
    assert keep > 0.9, keep
    # new vertices all placed
    assert (new >= 0).all() and new.max() < 4


def test_partition_to_masks_invariants():
    n, edges = _chain_with_loops(n=30, loop_stride=7)
    k = 3
    parts = stream_partition(n, edges, k)
    eidx = np.asarray(edges)
    for mode in ("full", "boundary"):
        est, own, emask = partition_to_masks(parts, eidx, n_pad=32, k=k,
                                             est_mode=mode)
        # each vertex owned exactly once; each edge assigned exactly once
        assert (own[:, :n].sum(0) == 1).all()
        assert (own[:, n:] == 0).all()
        assert (emask.sum(0) == 1).all()
        # owners estimate what they own; edge owners estimate both endpoints
        assert (est >= own).all()
        for r in range(k):
            for e in np.flatnonzero(emask[r]):
                i, j = eidx[e]
                assert est[r, i] and est[r, j]
        if mode == "full":
            assert est[:, :n].all()


def test_single_partition_trivial():
    n, edges = _chain_with_loops(n=10, loop_stride=5)
    parts = stream_partition(n, edges, 1)
    assert (parts == 0).all()
    s = partition_stats(parts, edges, 1)
    assert s["edge_cut"] == 0 and s["imbalance"] == 1.0
