"""SOLVE_ALL / SERVER estimation modes: one estimator holding every
drone's sliding window (reference ESTIMATION_MODE SOLVE_ALL/SERVER,
d2estimator.cpp addFrameRemote/setupImuFactors over remote windows)."""
import numpy as np

from d2slam_tpu.comm.codec import (
    RemoteKeyframePacket,
    decode_keyframe,
    encode_keyframe,
)
from d2slam_tpu.config import D2Config
from d2slam_tpu.utils.sim import CircleSim
from d2slam_tpu.vins.solve_all import SolveAllEstimator


def small_cfg():
    cfg = D2Config()
    cfg.estimator.max_sld_win_size = 6
    cfg.estimator.min_solve_frames = 4
    cfg.estimator.max_lm_slots = 96
    cfg.estimator.max_solve_measurements = 384
    cfg.estimator.max_imu_samples = 128
    cfg.estimator.max_solver_iters = 5
    return cfg


def remote_packet(sim, k, prev_t, drone_id, win_ids):
    """Build the wire packet a remote drone would broadcast for frame k
    (ego pose from its own VIO — here ground truth — plus the IMU
    samples since its previous keyframe, per the v2 state block)."""
    t = k / sim.frame_hz
    pose, vel = sim.gt_pose(t)
    ff = sim.frame(k)
    ids, cams, rays, vels = [], [], [], []
    for co in ff.observations:
        ids.extend(int(i) for i in co.landmark_ids)
        cams.extend([co.cam_id] * len(co.landmark_ids))
        rays.extend(co.rays)
        vels.extend(co.ray_vels)
    samples = sim.imu_samples(prev_t + 1e-6, t + 1e-6)
    n = len(ids)
    return RemoteKeyframePacket(
        drone_id=drone_id, frame_id=k, stamp=t, is_keyframe=True,
        pose=pose.astype(np.float32),
        gdesc=np.zeros(16, np.float32),
        lm_ids=np.asarray(ids, np.int64),
        lm_cam=np.asarray(cams, np.uint8),
        lm_rays=np.asarray(rays, np.float32).reshape(n, 3),
        lm_vels=np.asarray(vels, np.float32).reshape(n, 3),
        lm_desc=np.zeros((n, 8), np.float32),
        vel=vel.astype(np.float32),
        imu_t=np.asarray([s[0] for s in samples]),
        imu_acc=np.asarray([s[1] for s in samples], np.float32),
        imu_gyr=np.asarray([s[2] for s in samples], np.float32),
        sld_win=np.asarray(win_ids, np.int64),
    )


def test_codec_v2_roundtrip():
    sim = CircleSim(phase=np.pi / 2, seed=0)
    pkt = remote_packet(sim, 3, 2 / sim.frame_hz, drone_id=2,
                        win_ids=[1, 2, 3])
    out = decode_keyframe(encode_keyframe(pkt))
    assert out is not None
    np.testing.assert_array_equal(out.sld_win, pkt.sld_win)
    np.testing.assert_allclose(out.imu_t, pkt.imu_t)
    np.testing.assert_allclose(out.imu_acc, pkt.imu_acc, atol=1e-6)
    np.testing.assert_allclose(out.vel, pkt.vel, atol=1e-6)
    assert len(out.lm_ids) == len(pkt.lm_ids)


def run_two_drone(n_frames=16):
    cfg = small_cfg()
    sim1 = CircleSim(seed=0)
    sim2 = CircleSim(seed=0, phase=np.pi / 2)  # same landmark ring
    est = SolveAllEstimator(
        cfg, sim1.ext, max_drones=2,
        lm_id_map=lambda d, l: l,  # sim shares global landmark ids
    )
    for (t, a, g) in sim1.imu_samples(-0.3, 0.0):
        est.input_imu(t, a, g)

    from d2slam_tpu.utils import np_lie

    t_prev = 0.0
    outs1, outs2 = [], []
    win2 = []
    estw_T_gtw = None  # estimator-world from GT-world (gauge alignment)
    for k in range(n_frames):
        t = k / sim1.frame_hz
        if k > 0:
            for (ts, a, g) in sim1.imu_samples(t_prev + 1e-6, t + 1e-6):
                est.input_imu(ts, a, g)
        odom = est.input_frame(sim1.frame(k))
        if odom is not None:
            if estw_T_gtw is None:
                # both worlds gravity-aligned; the estimator gauges
                # yaw+position at its first frame — recover the offset
                # (this is what the reference's map alignment / PnP
                # init provides for real swarms)
                estw_T_gtw = np_lie.pose_compose(
                    odom.pose.astype(np.float64),
                    np_lie.pose_inverse(sim1.gt_pose(t)[0]),
                )
            gt_in_est = np_lie.pose_compose(estw_T_gtw, sim1.gt_pose(t)[0])
            outs1.append((odom.pose, gt_in_est))

        if estw_T_gtw is not None:
            win2 = (win2 + [k])[-cfg.estimator.max_sld_win_size:]
            pkt = remote_packet(sim2, k, t_prev, drone_id=2, win_ids=win2)
            ro = est.input_remote_frame(pkt, world_T_other=estw_T_gtw)
            if ro is not None:
                gt_in_est = np_lie.pose_compose(
                    estw_T_gtw, sim2.gt_pose(t)[0]
                )
                outs2.append((ro.pose, gt_in_est))
        t_prev = t
    return est, outs1, outs2, sim2, estw_T_gtw


def test_two_drone_joint_window():
    est, outs1, outs2, sim2, estw_T_gtw = run_two_drone()
    # both windows live in the pool, each capped at W_per
    mine = est._drone_slots(est.cfg.self_id)
    theirs = est._drone_slots(2)
    assert 1 <= len(mine) <= est.W_per
    assert 1 <= len(theirs) <= est.W_per
    assert est.solve_count >= 10

    # remote trajectory tracked in the fused frame (shared world here)
    errs2 = [np.linalg.norm(p[:3] - gt[:3]) for p, gt in outs2]
    assert np.median(errs2) < 0.15, f"remote err {np.median(errs2)}"
    # own trajectory unaffected by the joint solve
    errs1 = [np.linalg.norm(p[:3] - gt[:3]) for p, gt in outs1]
    assert np.median(errs1) < 0.1, f"self err {np.median(errs1)}"

    # cross-drone landmark fusion: some landmark must carry
    # observations from frames of BOTH drones
    fused = 0
    slots = {f.frame_id: f.drone_id for f in est.frames}
    for lm in est.lmanager.db.values():
        drones = {slots.get(o.frame_id) for o in lm.obs} - {None}
        if len(drones) > 1:
            fused += 1
    assert fused >= 5, f"only {fused} cross-drone landmarks"

    # remote solved odometry agrees with that drone's GT (est world)
    from d2slam_tpu.utils import np_lie

    ro = est.drone_odometry(2)
    gt, gv = sim2.gt_pose(ro.stamp)
    gt_in_est = np_lie.pose_compose(estw_T_gtw, gt)
    gv_in_est = np_lie.quat_rotate(estw_T_gtw[3:], gv)
    assert np.linalg.norm(ro.pose[:3] - gt_in_est[:3]) < 0.15
    assert np.linalg.norm(ro.vel - gv_in_est) < 0.3


def test_server_mode():
    """SERVER mode: no own frames; the estimator fuses two remote
    drones' packets only (reference ESTIMATION_MODE::SERVER_MODE)."""
    cfg = small_cfg()
    sim1 = CircleSim(seed=0)
    sim2 = CircleSim(seed=0, phase=np.pi)
    est = SolveAllEstimator(
        cfg, sim1.ext, max_drones=2, server_mode=True,
        lm_id_map=lambda d, l: l,
    )
    t_prev = 0.0
    wins = {1: [], 2: []}
    errs = []
    for k in range(12):
        t = k / sim1.frame_hz
        for did, sim in ((1, sim1), (2, sim2)):
            wins[did] = (wins[did] + [k])[-cfg.estimator.max_sld_win_size:]
            pkt = remote_packet(sim, k, t_prev, drone_id=did,
                                win_ids=wins[did])
            est.input_remote_frame(pkt)
        est.solve_remote_only()
        for did, sim in ((1, sim1), (2, sim2)):
            od = est.drone_odometry(did)
            if od is not None:
                errs.append(np.linalg.norm(od.pose[:3] - sim.gt_pose(t)[0][:3]))
        t_prev = t
    assert est.solve_count >= 6
    assert np.median(errs) < 0.2, f"server fused err {np.median(errs)}"
