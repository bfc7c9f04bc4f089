"""Swarm manager: remote keyframe -> loop edge -> map alignment, with
the wire codec in the path (two robots whose world frames differ by a
yaw + translation offset)."""
import numpy as np

from d2slam_tpu.comm.codec import (
    RemoteKeyframePacket,
    decode_keyframe,
    encode_keyframe,
)
from d2slam_tpu.frontend.loop_detector import (
    KeyframeEntry,
    LoopDetector,
    LoopDetectorConfig,
)
from d2slam_tpu.utils import np_lie
from d2slam_tpu.utils.sim import default_extrinsics
from d2slam_tpu.vins.swarm import SwarmConfig, SwarmManager


def test_swarm_alignment_and_unification():
    rng = np.random.default_rng(0)
    ext = default_extrinsics()
    n = 80
    # landmarks ahead of robot A (A's cam0 looks along +x at origin)
    lms_wA = np.concatenate(
        [rng.uniform(6, 14, (n, 1)), rng.uniform(-5, 5, (n, 1)),
         rng.uniform(0, 4, (n, 1))], axis=1
    )
    descs = rng.normal(0, 1, (n, 64)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=1, keepdims=True)
    gdesc = rng.normal(0, 1, 1024).astype(np.float32)
    gdesc /= np.linalg.norm(gdesc)

    # B's world frame differs from A's by this transform (A_T_Bworld)
    yaw = 0.6
    A_T_B = np.array(
        [3.0, -1.0, 0.5, 0, 0, np.sin(yaw / 2), np.cos(yaw / 2)]
    )

    det = LoopDetector(
        LoopDetectorConfig(min_gap_frames=2, min_inliers=20,
                           min_match_per_dir=10, gdesc_dim=1024),
        ext,
    )
    mgr = SwarmManager(0, det, SwarmConfig())

    # --- local keyframe of robot A at origin, landmarks known ---
    pose_A = np.array([0.0, 0, 0, 0, 0, 0, 1])
    T_camA = np_lie.pose_compose(pose_A, ext[0])
    RA = np_lie.quat_to_rotmat(T_camA[3:])
    pcA = (lms_wA - T_camA[:3]) @ RA
    raysA = pcA / np.linalg.norm(pcA, axis=1, keepdims=True)
    mgr.add_local_keyframe(
        KeyframeEntry(
            frame_id=0, drone_id=0, stamp=0.0, pose=pose_A,
            kpt_rays=raysA, kpt_cam=np.zeros(n, np.int32),
            kpt_desc=descs, kpt_valid=np.ones(n, bool),
            lm_positions=lms_wA,
            lm_ids=np.arange(n, dtype=np.int64),
        ),
        gdesc, stamp=0.0,
    )

    # --- remote keyframe of robot B observing the same landmarks ---
    # B's true pose in A's world:
    pose_B_inA = np.array([0.8, 0.4, 0.1, 0, 0, np.sin(0.05), np.cos(0.05)])
    # B's ego pose in B's own world: B_w = (A_T_B)^-1 * A_w
    pose_B_ego = np_lie.pose_compose(np_lie.pose_inverse(A_T_B), pose_B_inA)
    T_camB = np_lie.pose_compose(pose_B_inA, ext[0])
    RB = np_lie.quat_to_rotmat(T_camB[3:])
    pcB = (lms_wA - T_camB[:3]) @ RB
    raysB = (pcB / np.linalg.norm(pcB, axis=1, keepdims=True)).astype(np.float32)
    descsB = descs + rng.normal(0, 0.03, descs.shape).astype(np.float32)
    descsB /= np.linalg.norm(descsB, axis=1, keepdims=True)
    gdescB = gdesc + rng.normal(0, 0.005, 1024).astype(np.float32)
    gdescB /= np.linalg.norm(gdescB)

    pkt = RemoteKeyframePacket(
        drone_id=1, frame_id=100, stamp=5.0, is_keyframe=True,
        pose=pose_B_ego.astype(np.float32), gdesc=gdescB,
        lm_ids=np.arange(1000, 1000 + n),
        lm_cam=np.zeros(n, np.uint8),
        lm_rays=raysB, lm_vels=np.zeros((n, 3), np.float32),
        lm_desc=descsB,
    )
    # through the wire codec (int8 quantization in the path)
    pkt = decode_keyframe(encode_keyframe(pkt))

    edge = mgr.on_remote_keyframe(pkt)
    assert edge is not None, "inter-drone loop not detected"
    assert edge.drone_id_a == 0 and edge.drone_id_b == 1

    # map alignment recovered
    assert 1 in mgr.alignments
    T = mgr.alignments[1].transform
    np.testing.assert_allclose(T[:3], A_T_B[:3], atol=0.1)
    dq = np_lie.quat_mul(np_lie.quat_conj(T[3:]), A_T_B[3:])
    assert abs(dq[3]) > 0.999, f"alignment rotation off: {T}"

    # remote pose mapping works
    mapped = mgr.transform_remote_pose(1, pose_B_ego)
    np.testing.assert_allclose(mapped[:3], pose_B_inA[:3], atol=0.1)

    # landmarks unified with ownership by discovery time (A first)
    n_uni = sum(
        1 for k, v in mgr.lm_unify.items() if k[0] == 1 and v[0] == 0
    )
    assert n_uni >= 10, f"only {n_uni} unified"
