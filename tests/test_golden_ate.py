"""Golden ATE regression pack: fixed-seed end-to-end scenarios with
HARD accuracy thresholds pinned well below failure but close enough to
catch quality regressions between rounds (the reference's acceptance
methodology is dataset ATE tables, data_analysis/local_plot.py:217-280;
real TUM/GRACO data does not exist in this container, so these pinned
synthetic scenes are the regression contract)."""
import subprocess
import sys

import numpy as np
import pytest

from d2slam_tpu.config import D2Config
from d2slam_tpu.utils import np_lie
from d2slam_tpu.utils.sim import CircleSim, quadcam_extrinsics
from d2slam_tpu.vins.estimator import D2Estimator

# pinned golden thresholds (meters) — regression tripwires, not quality
# claims. Observed at pin time (seed 7, first-pose gauge alignment):
# stereo full-run RMSE 0.035, quadcam 0.034, swarm joint RMSE ~0.35.
GOLDEN_STEREO_ATE = 0.05
GOLDEN_QUADCAM_ATE = 0.05
GOLDEN_SWARM_RMSE = 0.45     # observed 0.35 (was 0.70: a 2x quality
#                              regression could hide under that pin)
GOLDEN_DPGO_VS_CENTRAL = 0.15  # transport-ARock vs centralized optimum
GOLDEN_QUADCAM_DISP_RMS = 0.35  # px, rendered virtual-stereo pair


def run_vio(sim, cfg, ext, n_frames=16):
    est = D2Estimator(cfg, ext)
    for (t, a, g) in sim.imu_samples(-0.3, 0.0):
        est.input_imu(t, a, g)
    t_prev, errs, align = 0.0, [], None
    for k in range(n_frames):
        t = k / sim.frame_hz
        if k:
            for (ts, a, g) in sim.imu_samples(t_prev + 1e-6, t + 1e-6):
                est.input_imu(ts, a, g)
        t_prev = t
        od = est.input_frame(sim.frame(k))
        if od is None:
            continue
        gt, _ = sim.gt_pose(t)
        if align is None:
            align = np_lie.pose_compose(
                od.pose.astype(np.float64), np_lie.pose_inverse(gt)
            )
        errs.append(np.linalg.norm(
            od.pose[:3] - np_lie.pose_compose(align, gt)[:3]
        ))
    return est, np.sqrt(np.mean(np.square(errs)))


def small_cfg(num_cams=2):
    cfg = D2Config()
    cfg.num_cams = num_cams
    e = cfg.estimator
    e.max_sld_win_size = 8
    e.min_solve_frames = 4
    e.max_lm_slots = 96
    e.max_solve_measurements = 384
    e.max_imu_samples = 128
    e.max_solver_iters = 5
    return cfg


def test_golden_stereo_vio():
    sim = CircleSim(pix_noise_rad=0.5 / 460.0, seed=7)
    est, ate = run_vio(sim, small_cfg(), sim.ext)
    assert est.solve_count >= 10
    assert ate < GOLDEN_STEREO_ATE, f"stereo ATE regressed: {ate:.4f}"


def test_golden_quadcam_vio():
    ext = quadcam_extrinsics()
    sim = CircleSim(pix_noise_rad=0.5 / 460.0, seed=7, extrinsics=ext,
                    fov_cos=0.55, max_obs_per_frame=40)
    est, ate = run_vio(sim, small_cfg(4), ext)
    assert est.solve_count >= 10
    assert ate < GOLDEN_QUADCAM_ATE, f"quadcam ATE regressed: {ate:.4f}"


@pytest.mark.slow
def test_golden_two_robot_swarm():
    """2-robot swarm with inter-drone loops + joint PGO: drone B's
    optimized trajectory in A's graph vs ground truth."""
    from test_system import bag_gdesc, make_entry, make_system

    from d2slam_tpu.comm.transport import LocalBus

    bus = LocalBus()
    sim_a = CircleSim(n_landmarks=300, seed=3, phase=0.0)
    sim_b = CircleSim(n_landmarks=300, seed=3, phase=0.25)
    sys_a = make_system(0, sim_a, transport=bus.endpoint(0))
    sys_b = make_system(1, sim_b, transport=bus.endpoint(1))
    for s, sim in ((sys_a, sim_a), (sys_b, sim_b)):
        for (t, a, g) in sim.imu_samples(-0.3, 0.0):
            s.input_imu(t, a, g)
    t_prev = 0.0
    for k in range(18):
        t = k / sim_a.frame_hz
        for s, sim in ((sys_a, sim_a), (sys_b, sim_b)):
            if k > 0:
                for (ts, a, g) in sim.imu_samples(t_prev + 1e-6, t + 1e-6):
                    s.input_imu(ts, a, g)
            ff = sim.frame(k)
            hint = s.odometry.pose if s.odometry is not None \
                else np.array([0, 0, 0, 0, 0, 0, 1.0])
            s.input_frame(ff,
                          gdesc=bag_gdesc(ff.observations[0].landmark_ids),
                          kf_entry=make_entry(ff, s.drone_id, hint))
        t_prev = t
        sys_a.poll_network(now=t)
        sys_b.poll_network(now=t)
    sys_a.solve_pgo()
    stamps_a, ego_a = sys_a.trajectory(drone_id=0, optimized=False)
    gt_a0, _ = sim_a.gt_pose(stamps_a[0])
    T = np_lie.pose_compose(gt_a0, np_lie.pose_inverse(ego_a[0]))
    stamps_b, opt_b = sys_a.trajectory(drone_id=1)
    assert len(stamps_b) >= 8
    errs = [
        np.linalg.norm(np_lie.pose_compose(T, p)[:3] - sim_b.gt_pose(t)[0][:3])
        for t, p in zip(stamps_b, opt_b)
    ]
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert rmse < GOLDEN_SWARM_RMSE, f"swarm joint RMSE regressed: {rmse:.3f}"


def test_golden_quadcam_disparity():
    """Rendered virtual-stereo pair through the quadcam pipeline: the
    block-matcher disparity must stay within a pinned RMS of the
    analytic ground truth (regression guard on the remap + disparity
    stack; the trained-HitNet path is covered by test_onnx_jax)."""
    import jax.numpy as jnp

    from d2slam_tpu.depth.fisheye_undist import remap_bilinear
    from d2slam_tpu.depth.quadcam import QuadcamConfig, build_virtual_stereo
    from d2slam_tpu.depth.stereo import disparity
    from d2slam_tpu.geometry.cameras import KBParams, kb_lift
    from d2slam_tpu.geometry.lie import so3_exp

    HF, WF, R_WALL = 240, 320, 5.0
    rng = np.random.default_rng(7)
    tex = rng.uniform(0, 1, (64, 512))
    from numpy.lib.stride_tricks import sliding_window_view

    tex = (sliding_window_view(np.pad(tex, 2, mode="wrap"), (5, 5))
           / 25).sum(axis=(2, 3))

    fisheyes = [KBParams.make(95.0, 95.0, WF / 2, HF / 2, k2=0.005)
                for _ in range(4)]
    # quadrotor-arm ring: each camera displaced ALONG its optical axis,
    # so adjacent virtual pairs are rectified (baseline perpendicular
    # to the bisector view direction)
    radius = 0.3 / np.sqrt(2.0)
    ext = np.zeros((4, 7))
    for i in range(4):
        yaw = np.deg2rad(90.0 * i)
        R = np_lie.quat_to_rotmat(
            np.array([0, np.sin(yaw / 2), 0, np.cos(yaw / 2)]))
        ext[i] = np.concatenate(
            [R @ [0.0, 0.0, radius], np_lie.rotmat_to_quat(R)])

    def render(fisheye, T_body_cam):
        ys, xs = np.meshgrid(np.arange(HF), np.arange(WF), indexing="ij")
        uv = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2), jnp.float32)
        rays = np.asarray(kb_lift(uv, fisheye))
        R = np_lie.quat_to_rotmat(T_body_cam[3:])
        rays_b = rays @ R.T
        c = T_body_cam[:3]
        dx, dz = rays_b[:, 0], rays_b[:, 2]
        a = dx * dx + dz * dz
        b = 2 * (c[0] * dx + c[2] * dz)
        cc = c[0] ** 2 + c[2] ** 2 - R_WALL ** 2
        t = (-b + np.sqrt(np.maximum(b * b - 4 * a * cc, 0.0))) \
            / np.maximum(2 * a, 1e-9)
        pts = c + rays_b * t[:, None]
        th = np.arctan2(pts[:, 0], pts[:, 2])
        ui = ((th + np.pi) / (2 * np.pi) * 512).astype(int) % 512
        vi = np.clip(((pts[:, 1] + 2.0) / 4.0 * 64).astype(int), 0, 63)
        return tex[vi, ui].reshape(HF, WF).astype(np.float32), \
            pts.reshape(HF, WF, 3)

    cfg = QuadcamConfig(out_hw=(120, 160), min_z=1.0, max_z=20.0,
                        max_disp=32, block=7)
    pairs = build_virtual_stereo(fisheyes, ext, cfg)
    p = pairs[0]
    imgs = {i: render(fisheyes[i], ext[i])[0] for i in (0, 1)}
    left = remap_bilinear(jnp.asarray(imgs[0]), p.map_left)
    right = remap_bilinear(jnp.asarray(imgs[1]), p.map_right)
    disp, ok = disparity(left, right, max_disp=cfg.max_disp,
                         block=cfg.block)
    disp, ok = np.asarray(disp), np.asarray(ok)

    # analytic GT disparity: depth of the wall along each virtual ray
    H, W = cfg.out_hw
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    rays_v = np.stack([(xs - W / 2.0) / p.focal,
                       (ys - H / 2.0) / p.focal,
                       np.ones_like(xs, np.float64)], axis=-1)
    a45 = np.deg2rad(45.0)
    Rl = np_lie.quat_to_rotmat(ext[0][3:]) @ np.asarray(
        np_lie.quat_to_rotmat(
            np.array([0, np.sin(a45 / 2), 0, np.cos(a45 / 2)])))
    rays_b = rays_v @ Rl.T
    c = ext[0][:3]
    dx, dz = rays_b[..., 0], rays_b[..., 2]
    a = dx * dx + dz * dz
    b = 2 * (c[0] * dx + c[2] * dz)
    cc = c[0] ** 2 + c[2] ** 2 - R_WALL ** 2
    t = (-b + np.sqrt(np.maximum(b * b - 4 * a * cc, 0.0))) \
        / np.maximum(2 * a, 1e-9)
    z_gt = t * rays_v[..., 2]  # depth along the virtual optical axis
    disp_gt = p.focal * p.baseline / np.maximum(z_gt, 1e-6)

    sel = ok & (disp > 0.5) & (disp_gt < cfg.max_disp - 1)
    sel[:, :8] = False  # left occlusion band
    assert sel.mean() > 0.3, f"too few valid disparities ({sel.mean():.2f})"
    rms = float(np.sqrt(np.mean((disp[sel] - disp_gt[sel]) ** 2)))
    assert rms < GOLDEN_QUADCAM_DISP_RMS, f"disparity RMS regressed: {rms:.3f} px"


@pytest.mark.slow
def test_dataset_dry_run_contract(tmp_path):
    """The real-data path (EuRoC layout -> calib -> track -> solve) is
    turnkey: the moment real weights/datasets exist, this is the parity
    entry point."""
    from test_dataset_e2e import build_dataset

    import os

    root, ext = build_dataset(tmp_path)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "examples/run_dataset_vio.py", str(root),
         "--cpu", "--dry-run"],
        capture_output=True, text=True, cwd=".", timeout=900, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dry-run" in out.stdout, out.stdout[-2000:]
