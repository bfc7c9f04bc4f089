#!/usr/bin/env python
"""Two-drone swarm demo: keyframe exchange over UDP multicast ->
inter-drone loop edges + map alignment -> joint pose-graph optimization.

Usage: PYTHONPATH=.:$PYTHONPATH python examples/run_swarm_pgo.py [--cpu]
"""
import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from d2slam_tpu.comm.codec import (
        RemoteKeyframePacket, decode_keyframe, encode_keyframe,
    )
    from d2slam_tpu.comm.transport import CH_VIOKF_HEADER, UDPMulticastTransport
    from d2slam_tpu.frontend.loop_detector import (
        KeyframeEntry, LoopDetector, LoopDetectorConfig,
    )
    from d2slam_tpu.pgo import PGOEdges, PGOLayout, PGOState, solve_pgo
    from d2slam_tpu.utils import np_lie
    from d2slam_tpu.utils.sim import default_extrinsics
    from d2slam_tpu.vins.swarm import SwarmManager

    rng = np.random.default_rng(0)
    ext = default_extrinsics()

    # ----- world: landmarks ahead of drone A's first pose -----
    n = 80
    lms = np.concatenate(
        [rng.uniform(6, 14, (n, 1)), rng.uniform(-5, 5, (n, 1)),
         rng.uniform(0, 4, (n, 1))], axis=1
    )
    descs = rng.normal(0, 1, (n, 64)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=1, keepdims=True)
    gdesc = rng.normal(0, 1, 1024).astype(np.float32)
    gdesc /= np.linalg.norm(gdesc)

    # drone B's world frame is offset from A's by yaw+translation
    yaw = 0.5
    A_T_B = np.array([2.0, -1.0, 0.3, 0, 0, np.sin(yaw / 2), np.cos(yaw / 2)])

    det = LoopDetector(
        LoopDetectorConfig(min_gap_frames=2, min_inliers=20,
                           min_match_per_dir=10, gdesc_dim=1024), ext,
    )
    mgr = SwarmManager(0, det)

    # drone A's keyframe with known landmark positions
    pose_A = np.array([0.0, 0, 0, 0, 0, 0, 1])
    T_cam = np_lie.pose_compose(pose_A, ext[0])
    R = np_lie.quat_to_rotmat(T_cam[3:])
    pc = (lms - T_cam[:3]) @ R
    rays_A = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    mgr.add_local_keyframe(
        KeyframeEntry(frame_id=0, drone_id=0, stamp=0.0, pose=pose_A,
                      kpt_rays=rays_A, kpt_cam=np.zeros(n, np.int32),
                      kpt_desc=descs, kpt_valid=np.ones(n, bool),
                      lm_positions=lms),
        gdesc, stamp=0.0,
    )

    # ----- drone B broadcasts its keyframe over real UDP multicast -----
    try:
        t_b = UDPMulticastTransport(self_id=2, port=17673)
        t_a = UDPMulticastTransport(self_id=1, port=17673)
        use_net = True
    except OSError:
        use_net = False
        print("(multicast unavailable; passing packet in-process)")

    pose_B_inA = np.array([0.6, 0.3, 0.1, 0, 0, np.sin(0.05), np.cos(0.05)])
    pose_B_ego = np_lie.pose_compose(np_lie.pose_inverse(A_T_B), pose_B_inA)
    T_camB = np_lie.pose_compose(pose_B_inA, ext[0])
    RB = np_lie.quat_to_rotmat(T_camB[3:])
    pcB = (lms - T_camB[:3]) @ RB
    rays_B = (pcB / np.linalg.norm(pcB, axis=1, keepdims=True)).astype(
        np.float32
    )
    descsB = descs + rng.normal(0, 0.03, descs.shape).astype(np.float32)
    descsB /= np.linalg.norm(descsB, axis=1, keepdims=True)
    gB = gdesc + rng.normal(0, 0.005, 1024).astype(np.float32)
    gB /= np.linalg.norm(gB)

    pkt = RemoteKeyframePacket(
        drone_id=1, frame_id=100, stamp=5.0, is_keyframe=True,
        pose=pose_B_ego.astype(np.float32), gdesc=gB,
        lm_ids=np.arange(1000, 1000 + n), lm_cam=np.zeros(n, np.uint8),
        lm_rays=rays_B, lm_vels=np.zeros((n, 3), np.float32),
        lm_desc=descsB,
    )
    payload = encode_keyframe(pkt)
    if use_net:
        t_b.send(CH_VIOKF_HEADER, payload)
        got = t_a.recv(timeout_ms=3000)
        assert got is not None, "keyframe lost on the wire"
        payload = got[2]
        print(f"keyframe received over multicast: {len(payload)} bytes "
              f"(int8 descriptors)")
    edge = mgr.on_remote_keyframe(decode_keyframe(payload))
    assert edge is not None, "no inter-drone loop found"
    print(f"inter-drone loop: drones {edge.drone_id_a}->{edge.drone_id_b}, "
          f"{edge.inliers} PnP inliers")
    T = mgr.alignments[1].transform
    print(f"map alignment A_T_B: est {np.round(T[:3], 3)} "
          f"true {A_T_B[:3]}  yaw est "
          f"{2 * np.arctan2(T[5], T[6]):.3f} true {yaw:.3f}")

    # ----- joint PGO over both drones' frames + the loop edge -----
    layout = PGOLayout(N=8, E=16, pose_dof=6)
    poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (layout.N, 1))
    poses[0] = pose_A
    poses[1] = mgr.transform_remote_pose(1, pose_B_ego)  # B in A's frame
    valid = np.zeros(layout.N, bool)
    valid[:2] = True
    E = PGOEdges.empty(layout, jnp.float64)
    em = {k: np.array(v) for k, v in E._asdict().items()}
    em["i"][0], em["j"][0] = 0, 1
    em["rel"][0] = edge.rel_pose
    em["valid"][0] = True
    edges = PGOEdges(**{
        k: jnp.asarray(v) for k, v in em.items()
    })
    state = PGOState(poses=jnp.asarray(poses), valid=jnp.asarray(valid))
    fixed = jnp.zeros(layout.N, bool).at[0].set(True)
    new_state, rep = solve_pgo(layout, state, edges, fixed, max_iters=5)
    print(f"PGO cost {float(rep.initial_cost):.2e} -> "
          f"{float(rep.final_cost):.2e}")
    err = np.linalg.norm(
        np.asarray(new_state.poses[1])[:3] - pose_B_inA[:3]
    )
    print(f"drone B joint-map position error: {err * 100:.1f} cm")
    if use_net:
        t_a.close()
        t_b.close()
    return 0 if err < 0.2 else 1


if __name__ == "__main__":
    sys.exit(main())
