"""PCM outlier rejection + distributed (ARock-style) PGO over the mesh."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from d2slam_tpu.geometry.lie import (
    pose_boxminus,
    pose_boxplus,
    pose_compose,
    pose_inverse,
)
from d2slam_tpu.pgo import PGOEdges, PGOLayout, PGOState, solve_pgo
from d2slam_tpu.pgo.distributed import ARockPGOCarry, arock_pgo_round
from d2slam_tpu.pgo.pcm import max_clique, pcm_filter
from d2slam_tpu.parallel.mesh import robot_mesh

from test_pgo import LAYOUT, accumulate_odometry, make_loop_graph


def test_max_clique_exact():
    # 5-node graph with a 3-clique {0,1,2} and edge (3,4)
    adj = np.zeros((5, 5), np.uint8)
    for a, b in [(0, 1), (0, 2), (1, 2), (3, 4)]:
        adj[a, b] = adj[b, a] = 1
    assert max_clique(adj) == [0, 1, 2]


def test_pcm_rejects_bad_loops():
    rng = np.random.default_rng(0)
    # two robots moving; 8 consistent loops + 3 outliers
    n = 12
    poses_a = np.zeros((n, 7))
    poses_b = np.zeros((n, 7))
    poses_a[:, 6] = poses_b[:, 6] = 1
    for k in range(n):
        poses_a[k, :3] = [k * 1.0, 0, 0]
        poses_b[k, :3] = [k * 1.0, 2.0, 0]
    # true relative transform between the robots' frames: B is at +2m y
    rel_true = []
    for k in range(n):
        rel = pose_compose(
            pose_inverse(jnp.asarray(poses_a[k])), jnp.asarray(poses_b[k])
        )
        rel_true.append(np.asarray(rel))
    loops = np.stack(rel_true)
    loops[:, :3] += rng.normal(0, 0.02, (n, 3))
    # corrupt 3
    bad = [2, 5, 9]
    for b in bad:
        loops[b, :3] += rng.normal(0, 3.0, 3)
    keep = pcm_filter(loops, poses_a, poses_b, thres=1.0)
    assert keep.sum() == n - len(bad)
    assert not keep[bad].any()


def make_two_drone_graph(n_per=18, odo_noise=0.01, rot_noise=0.005, seed=0,
                         n_interloops=8, dtype=jnp.float64):
    """Two drones flying parallel arcs, coupled by inter-drone loop
    edges — the actual D2PGO scenario (each drone owns its trajectory
    and the loops it detected; both estimate the full swarm graph)."""
    rng = np.random.default_rng(seed)
    gt = np.zeros((LAYOUT.N, 7))
    gt[:, 6] = 1
    for k in range(n_per):
        th = np.pi * k / n_per
        q = np.array([0, 0, np.sin(th / 2), np.cos(th / 2)])
        gt[k] = np.concatenate([[8 * np.cos(th), 8 * np.sin(th), 0.0], q])
        gt[n_per + k] = np.concatenate(
            [[10 * np.cos(th), 10 * np.sin(th), 1.0], q]
        )
    n = 2 * n_per
    valid = np.zeros(LAYOUT.N, bool)
    valid[:n] = True

    edge_list = []  # (i, j, owner)
    for k in range(n_per - 1):
        edge_list.append((k, k + 1, 0))
        edge_list.append((n_per + k, n_per + k + 1, 1))
    step = max(n_per // n_interloops, 1)
    for q_, k in enumerate(range(0, n_per, step)):
        edge_list.append((k, n_per + k, q_ % 2))  # alternate detecting drone

    E = PGOEdges.empty(LAYOUT, dtype)
    em = {k: np.array(v) for k, v in E._asdict().items()}
    edge_mask = np.zeros((2, LAYOUT.E), bool)
    for m, (i, j, owner) in enumerate(edge_list):
        rel = pose_compose(
            pose_inverse(jnp.asarray(gt[i])), jnp.asarray(gt[j])
        )
        noise = np.concatenate(
            [rng.normal(0, odo_noise, 3), rng.normal(0, rot_noise, 3)]
        )
        em["i"][m], em["j"][m] = i, j
        em["rel"][m] = np.asarray(pose_boxplus(rel, jnp.asarray(noise)))
        em["valid"][m] = True
        edge_mask[owner, m] = True
    edges = PGOEdges(**{
        k: jnp.asarray(v, dtype) if v.dtype == np.float64 else jnp.asarray(v)
        for k, v in em.items()
    })
    own = np.zeros((2, LAYOUT.N), bool)
    own[0, :n_per] = True
    own[1, n_per:n] = True
    return jnp.asarray(gt, dtype), jnp.asarray(valid), edges, edge_mask, own, n


def test_distributed_pgo_matches_centralized():
    mesh = robot_mesh(2)
    gt, valid, edges, edge_mask, own, n = make_two_drone_graph()
    # drifted init: accumulate each drone's own odometry chain
    n_per = n // 2
    init = np.asarray(gt).copy()
    ei, ej = np.asarray(edges.i), np.asarray(edges.j)
    rel = np.asarray(edges.rel)
    odo = {(int(a), int(b)): rel[m] for m, (a, b) in enumerate(zip(ei, ej))
           if np.asarray(edges.valid)[m]}
    for start in (0, n_per):
        for k in range(start + 1, start + n_per):
            init[k] = np.asarray(
                pose_compose(jnp.asarray(init[k - 1]),
                             jnp.asarray(odo[(k - 1, k)]))
            )
    init = jnp.asarray(init, gt.dtype)
    state = PGOState(poses=init, valid=valid)
    fixed = jnp.zeros(LAYOUT.N, bool).at[0].set(True)

    # centralized reference solution
    central, _ = solve_pgo(LAYOUT, state, edges, fixed, max_iters=12)

    est = np.zeros((2, LAYOUT.N), bool)
    est[:, :n] = True

    R = 2
    batched_state = jax.tree_util.tree_map(
        lambda x: jnp.stack([x, x]), state
    )
    tilde0 = jnp.zeros((R, LAYOUT.N, 6))

    round_fn = functools.partial(
        arock_pgo_round, LAYOUT,
        axis_name="robot", fixed_mask=fixed, eta=0.9, rho=1.0, max_iters=4,
    )

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("robot"),) * 5,
        out_specs=P("robot"),
    )
    def one_round(state_b, tilde_b, est_b, own_b, emask_b):
        carry = ARockPGOCarry(
            state=jax.tree_util.tree_map(lambda x: x[0], state_b),
            tilde=tilde_b[0],
        )
        nc, _ = round_fn(
            carry, edges, est_mask=est_b[0], own_mask=own_b[0],
            edge_mask=emask_b[0],
        )
        return jax.tree_util.tree_map(lambda x: x[None], nc)

    carry = ARockPGOCarry(state=batched_state, tilde=tilde0)
    for _ in range(16):
        carry = one_round(
            carry.state, carry.tilde, jnp.asarray(est), jnp.asarray(own),
            jnp.asarray(edge_mask),
        )

    # stitch: each robot's owned poses vs centralized
    poses = np.asarray(carry.state.poses)
    cen = np.asarray(central.poses)
    errs = []
    stitched = cen.copy()
    for r in range(2):
        for k in np.flatnonzero(own[r]):
            stitched[k] = poses[r, k]
            d = np.asarray(
                pose_boxminus(jnp.asarray(poses[r, k]), jnp.asarray(cen[k]))
            )
            errs.append(np.abs(d).max())
    # finite-round ADMM tracks the centralized optimum closely (exact
    # agreement is asymptotic — the reference runs rounds continuously)
    assert max(errs) < 0.15, f"max dev from centralized {max(errs)}"

    # and the stitched solution is near-optimal on the FULL graph
    from d2slam_tpu.pgo.pose_graph import _build_rows

    def full_cost(p):
        st = PGOState(poses=jnp.asarray(p, jnp.float64), valid=valid)
        _, _, cost = _build_rows(LAYOUT, st, edges, 0.5)
        return float(jnp.sum(cost))

    c_cen, c_dist = full_cost(cen), full_cost(stitched)
    assert c_dist < max(c_cen * 2.0, c_cen + 1e-3), (c_cen, c_dist)


def test_distributed_pgo_with_rot_init():
    """Full far-field sequence (chordal rot-init -> ADMM rounds) with
    badly corrupted initial rotations."""
    import functools

    from d2slam_tpu.geometry.lie import so3_exp_quat
    from d2slam_tpu.pgo.distributed import distributed_pgo_solve

    mesh = robot_mesh(2)
    gt, valid, edges, edge_mask, own, n = make_two_drone_graph(seed=7)
    rng = np.random.default_rng(8)
    bad = np.asarray(gt).copy()
    for k in range(1, n):
        bad[k, 3:] = np.asarray(so3_exp_quat(jnp.asarray(rng.normal(0, 1.0, 3))))
        bad[k, :3] += rng.normal(0, 0.2, 3)
    init = PGOState(poses=jnp.asarray(bad), valid=valid)
    fixed = jnp.zeros(LAYOUT.N, bool).at[0].set(True)
    est = np.zeros((2, LAYOUT.N), bool)
    est[:, :n] = True

    from jax.sharding import PartitionSpec as P

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P("robot"),) * 4,
        out_specs=P("robot"),
    )
    def solve(state_b, est_b, own_b, emask_b):
        s = jax.tree_util.tree_map(lambda x: x[0], state_b)
        out, _ = distributed_pgo_solve(
            LAYOUT, s, edges, axis_name="robot", est_mask=est_b[0],
            own_mask=own_b[0], fixed_mask=fixed, edge_mask=emask_b[0],
            rounds=8, rho=1.0, max_iters=4, huber_delta=2.0,
        )
        return jax.tree_util.tree_map(lambda x: x[None], out)

    batched = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), init)
    out = solve(batched, jnp.asarray(est), jnp.asarray(own),
                jnp.asarray(edge_mask))
    poses = np.asarray(out.poses)
    errs = []
    for r in range(2):
        for k in np.flatnonzero(own[r]):
            d = np.asarray(pose_boxminus(jnp.asarray(poses[r, k]),
                                         jnp.asarray(np.asarray(gt)[k])))
            errs.append(np.abs(d).max())
    # from garbage rotations to near-GT through rot-init + ADMM
    assert max(errs) < 0.3, f"max err {max(errs)}"
