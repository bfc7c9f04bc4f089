"""Transport-based distributed PGO (the reference's ARockPGO → d2comm →
PGO_Sync_Data path): N robot endpoints on the in-memory bus exchange
DPGOData (poses + duals, matched by frame id) and converge to the
centralized solution — including under lossy links and with the
skip-if-stale semantics (reference ARock.cpp:140-190)."""
import numpy as np

import jax.numpy as jnp

from d2slam_tpu.comm.transport import LocalBus
from d2slam_tpu.pgo.dpgo_transport import (
    DPGOData,
    DPGOTransportConfig,
    TransportDPGO,
    decode_dpgo,
    encode_dpgo,
)
from d2slam_tpu.pgo.pose_graph import PGOEdges, PGOLayout, PGOState, solve_pgo
from d2slam_tpu.utils import np_lie
from d2slam_tpu.vins.types import global_frame_id as gid


def test_dpgo_codec_roundtrip():
    d = DPGOData(
        drone_id=3, target_id=1, ref_frame_id=0, msg_type=2, stamp=12.5,
        iteration=7,
        keys=np.array([gid(1, 4), gid(2, 9)], np.int64),
        poses=np.random.default_rng(0).normal(size=(2, 7)).astype(np.float32),
        duals=np.random.default_rng(1).normal(size=(2, 7)).astype(np.float32),
    )
    out = decode_dpgo(encode_dpgo(d))
    assert out is not None
    assert (out.drone_id, out.target_id, out.ref_frame_id) == (3, 1, 0)
    assert (out.msg_type, out.iteration) == (2, 7)
    np.testing.assert_array_equal(out.keys, d.keys)
    np.testing.assert_allclose(out.poses, d.poses)
    np.testing.assert_allclose(out.duals, d.duals)


def _make_swarm_graph(n_robots=2, n_per=8, seed=0):
    """Ground-truth trajectories + noisy ego/loop edges + drifted
    initial guesses. Returns (gt, init, ego_edges, loop_edges) with
    edges as (key_a, key_b, rel, sqrt_info) and keys = gid(robot, k)."""
    rng = np.random.default_rng(seed)
    gt = {}
    for r in range(n_robots):
        for k in range(n_per):
            th = 2 * np.pi * k / n_per
            p = np.array([3 * np.cos(th), 3 * np.sin(th), 0.3 * r])
            yaw = th + np.pi / 2 + 0.3 * r
            q = np.array([0, 0, np.sin(yaw / 2), np.cos(yaw / 2)])
            gt[gid(r, k)] = np.concatenate([p, q])

    def noisy_rel(ka, kb, s_p=0.02, s_th=0.01):
        rel = np_lie.pose_compose(np_lie.pose_inverse(gt[ka]), gt[kb])
        d = np.concatenate([rng.normal(0, s_p, 3), rng.normal(0, s_th, 3)])
        return np_lie.pose_compose(rel, np_lie.pose_exp(d))

    sqrt_info = np.diag([50.0] * 3 + [100.0] * 3)
    ego, loops = [], []
    for r in range(n_robots):
        for k in range(n_per - 1):
            ego.append((gid(r, k), gid(r, k + 1),
                        noisy_rel(gid(r, k), gid(r, k + 1)), sqrt_info))
    for r in range(n_robots - 1):
        for k in range(0, n_per, 2):  # inter-robot loops
            loops.append((gid(r, k), gid(r + 1, k),
                          noisy_rel(gid(r, k), gid(r + 1, k)), sqrt_info))

    # initial guesses: integrate ego edges (drift), first pose at GT
    init = {}
    for r in range(n_robots):
        init[gid(r, 0)] = gt[gid(r, 0)].copy()
    for (ka, kb, rel, _) in ego:
        init[kb] = np_lie.pose_compose(
            init[ka], np_lie.pose_compose(
                rel, np_lie.pose_exp(rng.normal(0, 0.02, 6))
            )
        )
    return gt, init, ego, loops


def _centralized(gt, init, ego, loops):
    keys = sorted(init.keys())
    slot = {k: i for i, k in enumerate(keys)}
    n = len(keys)
    layout = PGOLayout(32, 64, 6)
    poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (32, 1))
    for k, i in slot.items():
        poses[i] = init[k]
    valid = np.zeros(32, bool)
    valid[:n] = True
    ei = np.zeros(64, np.int32); ej = np.zeros(64, np.int32)
    rel = np.tile([0, 0, 0, 0, 0, 0, 1.0], (64, 1))
    si = np.tile(np.eye(6), (64, 1, 1)); ev = np.zeros(64, bool)
    for x, (ka, kb, r, s) in enumerate(ego + loops):
        ei[x], ej[x], rel[x], si[x], ev[x] = slot[ka], slot[kb], r, s, True
    fixed = np.zeros(32, bool)
    fixed[slot[gid(0, 0)]] = True
    out, _ = solve_pgo(
        layout,
        PGOState(jnp.asarray(poses), jnp.asarray(valid)),
        PGOEdges(jnp.asarray(ei), jnp.asarray(ej),
                 jnp.asarray(rel), jnp.asarray(si),
                 jnp.asarray(ev)),
        # huber_delta must match DPGOTransportConfig.huber_delta — the
        # endpoints and this centralized reference must minimize the
        # SAME objective for the comparison to be meaningful
        jnp.asarray(fixed), max_iters=30, huber_delta=1.0,
    )
    res = np.asarray(out.poses, np.float64)
    return {k: res[slot[k]] for k in keys}


def _run_swarm(drop_prob=0.0, rounds=18, seed=0):
    gt, init, ego, loops = _make_swarm_graph(seed=seed)
    bus = LocalBus(drop_prob=drop_prob, seed=seed)
    cfg = DPGOTransportConfig(
        max_poses=32, max_edges=64, max_anchors=32,
        rho_T=1.0, rho_theta=1.0, iters_per_step=4,
    )
    robots = []
    for r in range(2):
        ep = TransportDPGO(bus.endpoint(r), r, cfg)
        for k, p in init.items():
            ep.add_frame(k, owner=k >> 40, pose=p)
        # the reference gives every robot the full edge set it heard
        # about (remote ego chains via frame_remote, loops via
        # SWARM_LOOP_CONN); the duals reconcile the replicated copies
        for (ka, kb, rel, s) in ego + loops:
            ep.add_edge(ka, kb, rel, s)
        robots.append(ep)

    for it in range(rounds):
        for ep in robots:
            ep.updated = True  # new round; reference timer-driven solve
            ep.solve(stamp=float(it))
    return gt, init, ego, loops, robots


def test_transport_dpgo_converges_to_centralized():
    gt, init, ego, loops, robots = _run_swarm()
    cen = _centralized(gt, init, ego, loops)

    # robots agree on shared frames and match the centralized solution.
    # ADMM with finite rounds has residual disagreement; the bound is
    # loose but far below the initial drift (~0.2 m).
    errs_cen, errs_agree = [], []
    for k in cen:
        own = robots[k >> 40].optimized_pose(k)
        other = robots[1 - (k >> 40)].optimized_pose(k)
        errs_cen.append(np.linalg.norm(own[:3] - cen[k][:3]))
        errs_agree.append(np.linalg.norm(own[:3] - other[:3]))
    assert np.max(errs_cen) < 0.08, f"vs centralized {np.max(errs_cen):.3f}"
    assert np.max(errs_agree) < 0.08, f"disagreement {np.max(errs_agree):.3f}"

    # and both improve on the drifted initialization vs ground truth
    def ate(poses):
        return np.sqrt(np.mean([
            np.linalg.norm(poses[k][:3] - gt[k][:3]) ** 2 for k in gt
        ]))

    ate_init = ate(init)
    ate_opt = ate({k: robots[k >> 40].optimized_pose(k) for k in gt})
    assert ate_opt < 0.6 * ate_init, (ate_opt, ate_init)


def test_transport_dpgo_lossy_links():
    """30% packet loss (reference UAV-link tolerance: ARock skips stale
    rounds, duals re-sync when packets get through)."""
    gt, init, ego, loops, robots = _run_swarm(drop_prob=0.3, rounds=30,
                                              seed=3)
    cen = _centralized(gt, init, ego, loops)
    errs = [
        np.linalg.norm(robots[k >> 40].optimized_pose(k)[:3] - cen[k][:3])
        for k in cen
    ]
    assert np.max(errs) < 0.12, f"lossy-link err {np.max(errs):.3f}"


def test_skip_if_stale():
    """A robot with nothing new skips its sub-steps after max_wait_steps
    (reference ARock.cpp:146-162)."""
    gt, init, ego, loops = _make_swarm_graph()
    bus = LocalBus()
    cfg = DPGOTransportConfig(max_poses=32, max_edges=64, max_anchors=32,
                              max_wait_steps=2, iters_per_step=2)
    ep = TransportDPGO(bus.endpoint(0), 0, cfg)
    for k, p in init.items():
        ep.add_frame(k, owner=k >> 40, pose=p)
    for (ka, kb, rel, s) in ego:
        if (ka >> 40) == 0:
            ep.add_edge(ka, kb, rel, s)
    assert ep.solve() == 1      # first call: graph is new -> solves
    assert ep.solve() == 0      # nothing new arrived -> skipped


def test_rot_init_finish_barrier():
    """ROT_INIT_FINISH gate (reference waitForRotInitFinish,
    d2pgo.cpp:130-153): with available_robots set, a robot holds its
    ARock rounds after local rot-init until every listed robot has
    signalled, re-announcing while it waits."""
    gt, init, ego, loops = _make_swarm_graph()
    bus = LocalBus()
    cfg = DPGOTransportConfig(max_poses=32, max_edges=64, max_anchors=32,
                              iters_per_step=2)
    eps = []
    for r in range(2):
        ep = TransportDPGO(bus.endpoint(r), r, cfg)
        ep.set_available_robots([0, 1])
        for k, p in init.items():
            ep.add_frame(k, owner=k >> 40, pose=p)
        for (ka, kb, rel, s) in ego + loops:
            ep.add_edge(ka, kb, rel, s)
        eps.append(ep)
    a, b = eps

    # robot 0 alone: rot-init runs, but ARock holds for robot 1
    assert a.solve() == 0
    assert a._rot_inited and not a._rot_barrier_passed
    # robot 1: hears 0's signal, rot-inits, signals, barrier satisfied
    assert b.solve() == 1
    assert b._rot_barrier_passed
    # robot 0 now hears 1's signal and proceeds
    a.updated = True
    assert a.solve() == 1
    assert a._rot_barrier_passed


def test_rot_init_barrier_timeout():
    """A robot whose peers never answer proceeds after the timeout
    budget (reference rot_init_timeout)."""
    gt, init, ego, loops = _make_swarm_graph()
    bus = LocalBus()
    cfg = DPGOTransportConfig(max_poses=32, max_edges=64, max_anchors=32,
                              iters_per_step=2, rot_init_timeout_rounds=2)
    ep = TransportDPGO(bus.endpoint(0), 0, cfg)
    ep.set_available_robots([0, 1])   # robot 1 will never exist
    for k, p in init.items():
        ep.add_frame(k, owner=k >> 40, pose=p)
    for (ka, kb, rel, s) in ego + loops:
        ep.add_edge(ka, kb, rel, s)
    held = 0
    for _ in range(3):
        if ep.solve() == 0:
            held += 1
            ep.updated = True
        else:
            break
    assert held == 2           # waited out the budget
    assert ep.solve() >= 0 and ep._rot_barrier_passed


def test_multi_process_swarm(tmp_path):
    """The docker-emulation deployment shape: one OS process per robot,
    joined only by real UDP multicast (examples/run_swarm_processes.py).
    Asserts inter-robot agreement and ATE improvement end-to-end across
    process boundaries."""
    import json as _json
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parents[1]
    env = dict(**__import__("os").environ)
    env["PYTHONPATH"] = f"{root}:{env.get('PYTHONPATH', '')}"
    out = subprocess.run(
        [sys.executable, str(root / "examples/run_swarm_processes.py"),
         "--rounds", "10", "--port", "7695"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    summary = _json.loads(line)
    assert summary["max_disagreement_m"] < 0.15
    assert summary["ate_optimized_m"] < summary["ate_odometry_m"]


def test_barrier_signals_wake_held_robots():
    """Regression: a robot held at the ROT_INIT_FINISH barrier must be
    woken by arriving signals alone (no dual data flows pre-ARock). A
    three-robot swarm where solve() is NOT manually re-armed would
    otherwise deadlock with every robot holding."""
    gt, init, ego, loops = _make_swarm_graph(n_robots=3, n_per=6)
    bus = LocalBus()
    cfg = DPGOTransportConfig(max_poses=32, max_edges=64, max_anchors=32,
                              iters_per_step=2)
    eps = []
    for r in range(3):
        ep = TransportDPGO(bus.endpoint(r), r, cfg)
        ep.set_available_robots([0, 1, 2])
        for k, p in init.items():
            ep.add_frame(k, owner=k >> 40, pose=p)
        for (ka, kb, rel, s) in ego + loops:
            ep.add_edge(ka, kb, rel, s)
        eps.append(ep)

    # round 1: robots 0 and 1 hold (signals incomplete), robot 2 passes
    assert eps[0].solve() == 0
    assert eps[1].solve() == 0
    assert eps[2].solve() == 1
    # round 2 WITHOUT manual re-arm: the late signals alone must wake 0/1
    assert eps[0].solve() == 1
    assert eps[1].solve() == 1
    assert all(ep._rot_barrier_passed for ep in eps)


def test_transport_dpgo_4dof():
    """4-DoF (x/y/z/yaw) mode — the reference's default for real swarms
    (d2pgo_node.cpp is_4dof=true): robots converge to the centralized
    4-DoF solution; roll/pitch stay pinned to the VIO attitudes."""
    gt, init, ego, loops = _make_swarm_graph(seed=1)
    bus = LocalBus()
    cfg = DPGOTransportConfig(max_poses=32, max_edges=64, max_anchors=32,
                              rho_T=1.0, rho_theta=1.0, iters_per_step=4,
                              pose_dof=4)
    robots = []
    for r in range(2):
        ep = TransportDPGO(bus.endpoint(r), r, cfg)
        for k, p in init.items():
            ep.add_frame(k, owner=k >> 40, pose=p)
        for (ka, kb, rel, s) in ego + loops:
            ep.add_edge(ka, kb, rel, s)
        robots.append(ep)
    for it in range(18):
        for ep in robots:
            ep.updated = True
            ep.solve(stamp=float(it))

    # centralized 4-DoF reference
    keys = sorted(init.keys())
    slot = {k: i for i, k in enumerate(keys)}
    layout = PGOLayout(32, 64, 4)
    poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (32, 1))
    for k, i in slot.items():
        poses[i] = init[k]
    valid = np.zeros(32, bool); valid[:len(keys)] = True
    ei = np.zeros(64, np.int32); ej = np.zeros(64, np.int32)
    rel = np.tile([0, 0, 0, 0, 0, 0, 1.0], (64, 1))
    si = np.tile(np.eye(4), (64, 1, 1)); ev = np.zeros(64, bool)
    sel4 = np.ix_([0, 1, 2, 5], [0, 1, 2, 5])
    for x, (ka, kb, r, s) in enumerate(ego + loops):
        ei[x], ej[x], rel[x], si[x], ev[x] = (
            slot[ka], slot[kb], r, s[sel4], True)
    fixed = np.zeros(32, bool); fixed[slot[gid(0, 0)]] = True
    out, _ = solve_pgo(
        layout, PGOState(jnp.asarray(poses), jnp.asarray(valid)),
        PGOEdges(jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(rel),
                 jnp.asarray(si), jnp.asarray(ev)),
        jnp.asarray(fixed), max_iters=30, huber_delta=1.0,
    )
    cen = {k: np.asarray(out.poses[slot[k]], np.float64) for k in keys}

    errs, agree = [], []
    for k in cen:
        own = robots[k >> 40].optimized_pose(k)
        other = robots[1 - (k >> 40)].optimized_pose(k)
        errs.append(np.linalg.norm(own[:3] - cen[k][:3]))
        agree.append(np.linalg.norm(own[:3] - other[:3]))
    assert np.max(errs) < 0.1, f"vs centralized 4dof {np.max(errs):.3f}"
    assert np.max(agree) < 0.1, f"disagreement {np.max(agree):.3f}"
