"""Multi-robot distributed-PGO simulation with graph partitioning.

The reference validates its distributed PGO with offline simulations:
partition a pose graph across agents, run ADMM rounds over a simulated
network (with delays/losses), and track convergence against the
centralized solution (reference: d2pgo/scripts/simulate_bdslam.py,
dpgo_DGS_eval.py, pose_graph_partitioning/). This driver is that
experiment on the robot mesh: FENNEL/LDG streaming partitioning
(pgo/partitioning.py), bulk-synchronous ARock rounds under shard_map,
per-round lossy-link dropout via activity masks, and a convergence
table (full-graph cost + inter-robot disagreement per round).

    python examples/simulate_dpgo.py --cpu --robots 4 --rounds 12
    python examples/simulate_dpgo.py --cpu --g2o graph.g2o --method ldg
    python examples/simulate_dpgo.py --cpu --drop-prob 0.3   # lossy links
"""
import argparse
import functools
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g2o", help="g2o pose graph (default: synthetic loop)")
    ap.add_argument("--robots", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=20)
    ap.add_argument("--poses", type=int, default=48, help="synthetic graph size")
    ap.add_argument("--method", choices=["fennel", "ldg"], default="fennel")
    ap.add_argument("--est", choices=["full", "boundary"], default="full",
                    help="full: every robot estimates the whole graph (reference semantics); boundary: own+boundary poses only (lean duals, slow diffusion)")
    ap.add_argument("--drop-prob", type=float, default=0.0,
                    help="per-robot per-round probability of a lost link")
    ap.add_argument("--rho", type=float, default=1.0)
    ap.add_argument("--eta", type=float, default=0.9)
    ap.add_argument("--iters", type=int, default=4, help="local LM iters/round")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="run on virtual CPU devices (one per robot)")
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.robots}"
            ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from d2slam_tpu.geometry.lie import (
        pose_boxminus,
        pose_boxplus,
        pose_compose,
        pose_inverse,
        quat_normalize,
    )
    from d2slam_tpu.parallel.mesh import robot_mesh
    from d2slam_tpu.pgo import PGOEdges, PGOLayout, PGOState, read_g2o, solve_pgo
    from d2slam_tpu.pgo.distributed import ARockPGOCarry, arock_pgo_round
    from d2slam_tpu.pgo.partitioning import (
        partition_stats,
        partition_to_masks,
        stream_partition,
    )
    from d2slam_tpu.pgo.pose_graph import _build_rows
    from d2slam_tpu.pgo.rot_init import chordal_rotation_init

    rng = np.random.default_rng(args.seed)

    # ---- graph -----------------------------------------------------------
    if args.g2o:
        vertices, g2o_edges = read_g2o(args.g2o)
        ids = sorted(vertices)
        id2k = {v: k for k, v in enumerate(ids)}
        n = len(ids)
        gt_list = np.stack([vertices[v] for v in ids])
        edge_list = [(id2k[i], id2k[j]) for i, j, _, _ in g2o_edges]
        rels = np.stack([r for _, _, r, _ in g2o_edges])
    else:
        # the reference's swarm scenario: one circular trajectory per
        # robot (stacked in height), odometry chains along each, loop
        # closures within and between adjacent robots
        K0 = args.robots
        per = max(args.poses // K0, 8)
        n = per * K0
        gt_list = np.zeros((n, 7))
        for r in range(K0):
            for k in range(per):
                th = 2 * np.pi * k / per
                gt_list[r * per + k] = [
                    10 * np.cos(th), 10 * np.sin(th), 1.5 * r,
                    0, 0, np.sin(th / 2), np.cos(th / 2)]
        edge_list = []
        for r in range(K0):
            base = r * per
            edge_list += [(base + k, base + k + 1) for k in range(per - 1)]
            edge_list.append((base + per - 1, base))  # own loop closure
            if r > 0:  # inter-robot loops at matching angles
                edge_list += [((r - 1) * per + k, base + k)
                              for k in range(0, per, 4)]
        rels = []
        for i, j in edge_list:
            rel = np.asarray(pose_compose(
                pose_inverse(jnp.asarray(gt_list[i])), jnp.asarray(gt_list[j])))
            noise = np.concatenate(
                [rng.normal(0, 0.02, 3), rng.normal(0, 0.01, 3)])
            rels.append(np.asarray(pose_boxplus(jnp.asarray(rel),
                                                jnp.asarray(noise))))
        rels = np.stack(rels)

    def pad(x, m=64):
        return -(-x // m) * m

    layout = PGOLayout(N=pad(n), E=pad(len(edge_list)), pose_dof=6)
    dtype = jnp.float64 if args.cpu else jnp.float32

    E = PGOEdges.empty(layout, dtype)
    em = {k: np.array(v) for k, v in E._asdict().items()}
    for m, (i, j) in enumerate(edge_list):
        em["i"][m], em["j"][m] = i, j
        em["rel"][m] = rels[m]
        em["valid"][m] = True
    edges = PGOEdges(**{
        k: jnp.asarray(v, dtype) if v.dtype == np.float64 else jnp.asarray(v)
        for k, v in em.items()})

    valid = np.zeros(layout.N, bool)
    valid[:n] = True
    # drifted init: odometry chain only
    init = gt_list.copy()
    odo = {(i, j): rels[m] for m, (i, j) in enumerate(edge_list)}
    for k in range(1, n):
        if (k - 1, k) in odo:
            init[k] = np.asarray(pose_compose(
                jnp.asarray(init[k - 1]), jnp.asarray(odo[(k - 1, k)])))
    init_pad = np.zeros((layout.N, 7))
    init_pad[:, 6] = 1
    init_pad[:n] = init
    state0 = PGOState(poses=jnp.asarray(init_pad, dtype),
                      valid=jnp.asarray(valid))
    fixed = jnp.zeros(layout.N, bool).at[0].set(True)

    # ---- partition -------------------------------------------------------
    K = args.robots
    parts = stream_partition(n, edge_list, K, method=args.method)
    stats = partition_stats(parts, edge_list, K)
    print(f"partition[{args.method}] k={K}: sizes={stats['sizes']} "
          f"cut={stats['edge_cut']}/{len(edge_list)} "
          f"imbalance={stats['imbalance']:.2f} comm={stats['comm_volume']}")

    eidx = np.stack([em["i"][:len(edge_list)], em["j"][:len(edge_list)]], 1)
    est, own, edge_mask = partition_to_masks(parts, eidx, layout.N, K,
                                          est_mode=args.est)
    emask_pad = np.zeros((K, layout.E), bool)
    emask_pad[:, :len(edge_list)] = edge_mask

    # ---- centralized reference --------------------------------------------
    t0 = time.perf_counter()
    central, rep = solve_pgo(layout, state0, edges, fixed, max_iters=16)
    t_central = time.perf_counter() - t0

    def full_cost(poses):
        st = PGOState(poses=jnp.asarray(poses, dtype),
                      valid=jnp.asarray(valid))
        _, _, cost = _build_rows(layout, st, edges, 0.5)
        return float(jnp.sum(cost))

    c_init, c_central = full_cost(init_pad), full_cost(central.poses)
    print(f"cost: init {c_init:.4f} -> centralized {c_central:.4f} "
          f"({int(rep.accepted)} accepted steps, {t_central*1e3:.0f} ms)")

    # ---- distributed rounds ------------------------------------------------
    mesh = robot_mesh(K)
    # per-robot chordal rot-init on its known subgraph
    act = np.asarray(edges.valid)[None] & est[:, np.asarray(edges.i)] \
        & est[:, np.asarray(edges.j)]
    rot_poses = []
    for r in range(K):
        rot_poses.append(chordal_rotation_init(
            state0.poses, state0.valid, edges.i, edges.j,
            quat_normalize(edges.rel[:, 3:]), jnp.asarray(act[r]), fixed))
    batched = PGOState(
        poses=jnp.stack(rot_poses),
        valid=jnp.stack([state0.valid] * K),
    )
    tilde0 = jnp.zeros((K, layout.N, 6), dtype)

    round_fn = functools.partial(
        arock_pgo_round, layout, axis_name="robot", fixed_mask=fixed,
        eta=args.eta, rho=args.rho, max_iters=args.iters)

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(P("robot"),) * 5,
                       out_specs=P("robot"))
    def one_round(state_b, tilde_b, est_b, own_b, emask_b):
        carry = ARockPGOCarry(
            state=jax.tree_util.tree_map(lambda x: x[0], state_b),
            tilde=tilde_b[0])
        nc, _ = round_fn(carry, edges, est_mask=est_b[0], own_mask=own_b[0],
                         edge_mask=emask_b[0])
        return jax.tree_util.tree_map(lambda x: x[None], nc)

    carry = ARockPGOCarry(state=batched, tilde=tilde0)
    est_j, own_j = jnp.asarray(est), jnp.asarray(own)
    print(f"{'round':>5} {'cost(stitched)':>15} {'vs central':>11} "
          f"{'dev(central)':>13} {'disagreement':>13} {'active':>8}")
    cen_np = np.asarray(central.poses)
    t0 = time.perf_counter()
    for rd in range(args.rounds):
        active = rng.random(K) >= args.drop_prob
        if not active.any():
            active[rng.integers(K)] = True
        # a dropped robot shares nothing this round (timeout semantics:
        # excluded from averaging, keeps stale duals, solves locally)
        est_rd = jnp.asarray(np.where(active[:, None], est, own))
        carry = one_round(carry.state, carry.tilde, est_rd, own_j,
                          jnp.asarray(emask_pad))
        poses = np.asarray(carry.state.poses)
        stitched = np.array(init_pad)
        for r in range(K):
            stitched[own[r]] = poses[r][own[r]]
        c = full_cost(stitched)
        dev = float(np.abs(np.asarray(jax.vmap(pose_boxminus)(
            jnp.asarray(stitched[valid]), jnp.asarray(cen_np[valid])))).max())
        dis = 0.0
        for r in range(1, K):
            sharers = est[0] & est[r] & valid
            if sharers.any():
                d = np.asarray(jax.vmap(pose_boxminus)(
                    jnp.asarray(poses[r][sharers]),
                    jnp.asarray(poses[0][sharers])))
                dis = max(dis, float(np.abs(d).max()))
        print(f"{rd:5d} {c:15.4f} {c / max(c_central, 1e-12):11.3f} "
              f"{dev:13.2e} {dis:13.2e} {int(active.sum()):>4d}/{K}")
    t_rounds = time.perf_counter() - t0

    # ADMM's cost tail converges slowly (the reference runs one step
    # per 0.5 s solver tick, forever, and never waits for the tail);
    # accept when >=95% of the init->centralized cost gap is closed or
    # the poses themselves track the centralized optimum
    gap_closed = (c_init - c) / max(c_init - c_central, 1e-12)
    ok = gap_closed >= 0.95 or dev < 0.25 or c < 2.0 * c_central + 1e-3
    print(f"distributed: {args.rounds} rounds in {t_rounds*1e3:.0f} ms "
          f"-> final cost {c:.4f} ({100*gap_closed:.1f}% of cost gap "
          f"closed), max pose dev vs centralized {dev:.3f} "
          f"({'OK' if ok else 'NOT CONVERGED'})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
