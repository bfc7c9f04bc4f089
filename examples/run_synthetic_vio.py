#!/usr/bin/env python
"""Run the sliding-window VIO on a synthetic circle flight and report ATE.

Observation-level pipeline (exact feature measurements from the
simulator): IMU at 400 Hz + stereo landmark observations at 8 Hz ->
D2Estimator -> trajectory vs ground truth.

Usage:  PYTHONPATH=. python examples/run_synthetic_vio.py [--frames 30]
        [--noisy] [--cpu]
"""
import argparse
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--noisy", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend (default uses the session's)")
    ap.add_argument("--out", default="", help="write TUM trajectory CSV")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import numpy as np

    from d2slam_tpu.config import D2Config
    from d2slam_tpu.utils.evaluation import ate_rmse, write_trajectory_csv
    from d2slam_tpu.utils.sim import CircleSim
    from d2slam_tpu.vins.estimator import D2Estimator

    cfg = D2Config()
    if not args.cpu:
        cfg.dtype = "float32"
    cfg.estimator.max_imu_samples = 128
    sim_kw = {}
    if args.noisy:
        sim_kw = dict(
            pix_noise_rad=0.5 / 460.0, acc_noise=0.05, gyr_noise=0.004,
            acc_bias=(0.05, -0.03, 0.02), gyr_bias=(0.002, 0.001, -0.002),
        )
    sim = CircleSim(**sim_kw)
    est = D2Estimator(cfg, sim.ext)

    for (t, a, g) in sim.imu_samples(-0.3, 0.0):
        est.input_imu(t, a, g)

    stamps, poses, gt_stamps, gt_poses = [], [], [], []
    t_prev = 0.0
    t_start = time.perf_counter()
    for k in range(args.frames):
        t = k / sim.frame_hz
        if k:
            for (ts, a, g) in sim.imu_samples(t_prev + 1e-6, t + 1e-6):
                est.input_imu(ts, a, g)
        t_prev = t
        od = est.input_frame(sim.frame(k))
        if od is not None:
            gt_pose, _ = sim.gt_pose(t)
            stamps.append(t)
            poses.append(od.pose)
            gt_stamps.append(t)
            gt_poses.append(gt_pose)
    wall = time.perf_counter() - t_start

    rmse, _ = ate_rmse(stamps, np.asarray(poses), gt_stamps,
                       np.asarray(gt_poses))
    print(f"frames: {len(stamps)}  solves: {est.solve_count}  "
          f"margins: {est.margin_count}")
    print(f"ATE-RMSE: {rmse * 100:.2f} cm   "
          f"({wall / max(len(stamps), 1) * 1000:.0f} ms/frame incl. host)")
    if args.out:
        write_trajectory_csv(args.out, stamps, poses)
        print(f"trajectory written to {args.out}")
    return 0 if rmse < 0.5 else 1


if __name__ == "__main__":
    sys.exit(main())
