#!/usr/bin/env python
"""SERVER estimation mode across real OS processes: N robot processes
run full VIO and broadcast codec-v2 keyframe packets over UDP
multicast; ONE ground-station process (no sensors) ingests every
packet and jointly estimates the whole swarm (reference
ESTIMATION_MODE SERVER, d2common/include/d2common/d2basetypes.h:38-44,
solve path d2vins/src/estimator/d2estimator.cpp:700-736).

Usage: PYTHONPATH=.:$PYTHONPATH python examples/run_server_mode.py \
           [--robots 2] [--frames 14] [--port 7687] [--cpu]
"""
import argparse
import json
import multiprocessing as mp
import os
import sys


def _common_env(cpu: bool):
    if cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"


def _make_system(drone_id, sim, port, mode="single", max_drones=3,
                 broadcast=True):
    import numpy as np

    from d2slam_tpu.comm.transport import (
        BufferedTransport,
        UDPMulticastTransport,
    )
    from d2slam_tpu.config import D2Config
    from d2slam_tpu.frontend.loop_detector import LoopDetectorConfig
    from d2slam_tpu.runtime.system import D2SLAMSystem, SystemConfig

    cfg = D2Config()
    cfg.estimator.max_sld_win_size = 8
    cfg.estimator.min_solve_frames = 4
    cfg.estimator.max_lm_slots = 128
    cfg.estimator.max_solve_measurements = 512
    cfg.estimator.max_imu_samples = 128
    cfg.estimator.max_solver_iters = 5
    sys_cfg = SystemConfig(
        drone_id=drone_id, estimation_mode=mode, max_drones=max_drones,
        assume_common_world=True, broadcast=broadcast,
        enable_loop_detection=False, enable_pgo=False,
    )
    t = BufferedTransport(UDPMulticastTransport(drone_id, port=port))
    return D2SLAMSystem(
        cfg, sys_cfg, sim.ext, cameras=None,
        extract_fn=lambda img, cam: None,
        transport=t,
        loop_cfg=LoopDetectorConfig(desc_dim=8, gdesc_dim=16),
    ), t


def robot_main(rid, n_frames, port, cpu, q):
    _common_env(cpu)
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from d2slam_tpu.utils.sim import CircleSim

    sim = CircleSim(n_landmarks=200, seed=3, phase=0.25 * rid)
    system, transport = _make_system(rid, sim, port)
    for (t, a, g) in sim.imu_samples(-0.3, 0.0):
        system.input_imu(t, a, g)
    t_prev = 0.0
    for k in range(n_frames):
        t = k / sim.frame_hz
        if k:
            for (ts, a, g) in sim.imu_samples(t_prev + 1e-6, t + 1e-6):
                system.input_imu(ts, a, g)
        t_prev = t
        system.input_frame(sim.frame(k), gdesc=np.zeros(16, np.float32))
    od = system.odometry
    q.put(("robot", rid, od.pose.tolist() if od is not None else None))
    transport.close()


def server_main(n_robots, n_frames, port, cpu, q):
    _common_env(cpu)
    import time

    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from d2slam_tpu.utils.sim import CircleSim

    sim = CircleSim(n_landmarks=200, seed=3)  # geometry only (ext)
    system, transport = _make_system(
        99, sim, port, mode="server", max_drones=n_robots,
        broadcast=False,
    )
    deadline = time.time() + 600.0
    last_pkt = time.time()
    while time.time() < deadline:
        n = system.poll_network(now=time.time(), timeout_ms=200)
        if n:
            last_pkt = time.time()
            continue  # drain everything queued before solving again
        fused = {}
        try:
            fused = system.solve_server()
        except Exception as e:
            print("solve_server error:", repr(e)[:200], flush=True)
        if fused and time.time() - last_pkt > 5.0:
            break  # robots went quiet and we have estimates
    system.poll_network(now=time.time(), timeout_ms=500)
    fused = system.solve_server()
    est = system.estimator
    diag = {}
    for f in est.frames:
        d = f.drone_id
        diag.setdefault(d, []).append(int(f.frame_id & 0xffffffff))
    print("server window per drone:",
          {d: (len(v), min(v), max(v)) for d, v in diag.items()},
          flush=True)
    q.put(("server", 99, {
        str(d): od.pose.tolist() for d, od in fused.items()
    }))
    transport.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", type=int, default=2)
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--port", type=int, default=7687)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    server = ctx.Process(target=server_main,
                         args=(args.robots, args.frames, args.port,
                               args.cpu, q))
    server.start()
    robots = []
    for r in range(args.robots):
        p = ctx.Process(target=robot_main,
                        args=(r, args.frames, args.port, args.cpu, q))
        p.start()
        robots.append(p)

    results = {}
    for _ in range(args.robots + 1):
        kind, rid, payload = q.get(timeout=240)
        results[(kind, rid)] = payload
    for p in robots:
        p.join(timeout=30)
    server.join(timeout=60)

    import numpy as np

    srv = results[("server", 99)]
    print(f"server estimated drones: {sorted(srv)}")
    ok = True
    for r in range(args.robots):
        own = results.get(("robot", r))
        est = srv.get(str(r))
        if own is None or est is None:
            print(f"drone {r}: MISSING (own={own is not None}, "
                  f"server={est is not None})")
            ok = False
            continue
        err = float(np.linalg.norm(np.asarray(own[:3]) - np.asarray(est[:3])))
        print(f"drone {r}: server-vs-onboard position diff {err*100:.1f} cm")
        ok &= err < 0.5
    print("SERVER-mode swarm:", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
