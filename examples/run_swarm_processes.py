#!/usr/bin/env python
"""Real multi-PROCESS swarm DPGO: one OS process per robot, joined only
by UDP multicast — the reference's docker-emulation deployment shape
(reference README.md:199-215: one container per drone on LCM multicast
udpm://224.0.0.251:7667; here each process runs a TransportDPGO
endpoint exchanging DPGOData over the native C++ multicast transport,
comm/native/udp_transport.cpp).

Each robot owns half of a two-ring pose graph, knows all edges it
"heard about" (remote ego chains + inter-robot loops, as the reference
replicates via frame_remote/SWARM_LOOP_CONN), runs chordal rot-init,
the ROT_INIT_FINISH barrier, then ARock rounds with eta_k-relaxed
duals. The parent process checks that the robots' solutions agree and
improve on the drifted odometry initialization.

Usage: PYTHONPATH=.:$PYTHONPATH python examples/run_swarm_processes.py \
           [--robots 2] [--rounds 12] [--port 7677]
"""
import argparse
import json
import multiprocessing as mp
import os
import sys


def make_graph(n_robots: int, n_per: int, seed: int = 0):
    """Ground truth + noisy edges + drifted init (keys = robot<<40 | k)."""
    import numpy as np

    from d2slam_tpu.utils import np_lie

    def gid(r, k):
        return (r << 40) | k

    rng = np.random.default_rng(seed)
    gt = {}
    for r in range(n_robots):
        for k in range(n_per):
            th = 2 * np.pi * k / n_per
            p = np.array([3 * np.cos(th), 3 * np.sin(th), 0.3 * r])
            yaw = th + np.pi / 2 + 0.3 * r
            q = np.array([0, 0, np.sin(yaw / 2), np.cos(yaw / 2)])
            gt[gid(r, k)] = np.concatenate([p, q])

    def noisy_rel(ka, kb):
        rel = np_lie.pose_compose(np_lie.pose_inverse(gt[ka]), gt[kb])
        d = np.concatenate([rng.normal(0, 0.02, 3), rng.normal(0, 0.01, 3)])
        return np_lie.pose_compose(rel, np_lie.pose_exp(d))

    sqrt_info = np.diag([50.0] * 3 + [100.0] * 3)
    ego, loops = [], []
    for r in range(n_robots):
        for k in range(n_per - 1):
            ego.append((gid(r, k), gid(r, k + 1),
                        noisy_rel(gid(r, k), gid(r, k + 1)), sqrt_info))
    for r in range(n_robots - 1):
        for k in range(0, n_per, 2):
            loops.append((gid(r, k), gid(r + 1, k),
                          noisy_rel(gid(r, k), gid(r + 1, k)), sqrt_info))

    init = {gid(r, 0): gt[gid(r, 0)].copy() for r in range(n_robots)}
    for (ka, kb, rel, _) in ego:
        init[kb] = np_lie.pose_compose(
            init[ka],
            np_lie.pose_compose(rel, np_lie.pose_exp(rng.normal(0, 0.02, 6))),
        )
    return gt, init, ego, loops


def robot_main(robot_id: int, n_robots: int, rounds: int, port: int,
               out_q) -> None:
    """One robot process: TransportDPGO over real UDP multicast."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import time

    import numpy as np

    from d2slam_tpu.comm.transport import UDPMulticastTransport
    from d2slam_tpu.pgo.dpgo_transport import (
        DPGOTransportConfig,
        TransportDPGO,
    )
    from d2slam_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    gt, init, ego, loops = make_graph(n_robots, n_per=8)

    t = UDPMulticastTransport(self_id=robot_id, port=port)
    cfg = DPGOTransportConfig(max_poses=64, max_edges=128, max_anchors=64,
                              rho_T=1.0, rho_theta=1.0, iters_per_step=4)
    ep = TransportDPGO(t, robot_id, cfg)
    ep.set_available_robots(range(n_robots))
    for k, p in init.items():
        ep.add_frame(k, owner=k >> 40, pose=p)
    for (ka, kb, rel, s) in ego + loops:
        ep.add_edge(ka, kb, rel, s)

    for it in range(rounds):
        ep.updated = True
        ep.solve(stamp=float(it))
        time.sleep(0.05)  # real processes are not lockstep; let peers talk

    out_q.put((robot_id, {int(k): ep.optimized_pose(k).tolist()
                          for k in init}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--port", type=int, default=7677)
    args = ap.parse_args()

    ctx = mp.get_context("spawn")  # fresh interpreters: no inherited JAX
    out_q = ctx.Queue()
    procs = [
        ctx.Process(target=robot_main,
                    args=(r, args.robots, args.rounds, args.port, out_q))
        for r in range(args.robots)
    ]
    for p in procs:
        p.start()
    results = {}
    for _ in procs:
        rid, poses = out_q.get(timeout=600)
        results[rid] = poses
    for p in procs:
        p.join(timeout=60)

    import numpy as np

    gt, init, _, _ = make_graph(args.robots, n_per=8)
    agree, err_gt, err_init = [], [], []
    for k, g in gt.items():
        own = np.asarray(results[k >> 40][k])
        err_gt.append(np.linalg.norm(own[:3] - g[:3]))
        err_init.append(np.linalg.norm(np.asarray(init[k])[:3] - g[:3]))
        for rid, poses in results.items():
            if rid != (k >> 40):
                agree.append(
                    np.linalg.norm(own[:3] - np.asarray(poses[k])[:3]))
    summary = {
        "robots": args.robots,
        "max_disagreement_m": round(float(np.max(agree)), 4),
        "ate_optimized_m": round(float(np.sqrt(np.mean(np.square(err_gt)))), 4),
        "ate_odometry_m": round(
            float(np.sqrt(np.mean(np.square(err_init)))), 4),
    }
    print(json.dumps(summary))
    ok = (summary["max_disagreement_m"] < 0.15
          and summary["ate_optimized_m"] < summary["ate_odometry_m"])
    print("multi-process swarm DPGO:", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
