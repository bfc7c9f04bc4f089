#!/usr/bin/env python
"""Run the full image pipeline (SuperPoint tracker -> estimator) on an
EuRoC-ASL dataset directory (EuRoC MAV / TUM-VI / the synthetic writer's
output) and report ATE against ground truth when available.

Usage:
  PYTHONPATH=.:$PYTHONPATH python examples/run_dataset_vio.py <dataset_root>
      [--cpu] [--frames N] [--stride K] [--fx F --fy F --cx C --cy C]
      [--baseline B] [--sp-weights superpoint.npz] [--out traj.csv]

<dataset_root> may also be a ROS1 .bag file (the reference's native
dataset format) — topics via --imu-topic/--cam-topics.

Notes: with --sp-weights pointing at converted SuperPoint weights the
pipeline runs the real detector; without weights the random-init network
produces repeatable but 3D-inconsistent keypoints (see BASELINE.md) —
useful as a smoke run only.
"""
import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=0, help="0 = all")
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--fx", type=float, default=0.0)
    ap.add_argument("--fy", type=float, default=0.0)
    ap.add_argument("--cx", type=float, default=0.0)
    ap.add_argument("--cy", type=float, default=0.0)
    ap.add_argument("--baseline", type=float, default=0.1)
    ap.add_argument("--camchain", default="", help="kalibr camchain YAML "
                    "(cameras + imu-cam extrinsics; overrides --fx/--baseline)")
    ap.add_argument("--extrinsic-type", type=int, default=0,
                    help="camchain T_cam_imu convention (reference "
                    "extrinsic_parameter_type; 0 inverts)")
    ap.add_argument("--sp-weights", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--dry-run", action="store_true",
                    help="validate the real-data path (calib load -> "
                         "undistort/lift -> track -> solve) on a few "
                         "frames and exit")
    ap.add_argument("--imu-topic", default="/imu0")
    ap.add_argument("--cam-topics", nargs="+",
                    default=["/cam0/image_raw", "/cam1/image_raw"])
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from d2slam_tpu.config import D2Config
    from d2slam_tpu.datasets import EuRoCDataset
    from d2slam_tpu.frontend.superpoint import (
        SuperPointConfig, load_params, superpoint_init,
    )
    from d2slam_tpu.frontend.tracker import FeatureTracker, TrackerConfig
    from d2slam_tpu.geometry.cameras import PinholeParams
    from d2slam_tpu.utils.evaluation import ate_rmse, write_trajectory_csv
    from d2slam_tpu.utils.sim import default_extrinsics
    from d2slam_tpu.vins.estimator import D2Estimator

    is_bag = args.root.endswith(".bag")
    if is_bag:
        from d2slam_tpu.datasets.rosbag import RosbagReader

        ds = None
        bag = RosbagReader(args.root)
        print(f"bag topics: {bag.topics}")
        first = next(
            (m for _, _, m in bag.read_messages([args.cam_topics[0]])), None)
        if first is None or first.get("image") is None:
            print("no decodable images on", args.cam_topics[0])
            return 1
        img0 = np.asarray(first["image"], np.float32)
        n_total = "?"
        gt_avail = False
    else:
        ds = EuRoCDataset(args.root)
        print(f"dataset: {len(ds.frames)} frames, {len(ds.imu)} IMU "
              f"samples, gt={'yes' if ds.ground_truth is not None else 'no'}")
        if not ds.frames:
            print("no frames found")
            return 1
        img0 = ds.load_image(ds.frames[0][1][0])
        gt_avail = ds.ground_truth is not None

    # intrinsics: camchain > CLI > sensor.yaml > guess from image size
    H, W = img0.shape[:2]
    chain = None
    if args.camchain:
        from d2slam_tpu.geometry.kalibr import load_camchain

        chain = load_camchain(args.camchain, args.extrinsic_type)
        print(f"camchain: {[(c.name, c.model) for c in chain]}")
        fx = float(getattr(chain[0].params, "fx"))
        fy, cx, cy = (float(chain[0].params.fy), float(chain[0].params.cx),
                      float(chain[0].params.cy))
    fx = args.fx if chain is None else fx
    if not fx:
        calib = (ds.calib.get("cam0") or {}) if ds is not None else {}
        intr = (calib.get("intrinsics") or [])
        if len(intr) >= 4:
            fx, fy, cx, cy = intr[:4]
        else:
            fx = fy = 0.9 * W
            cx, cy = W / 2, H / 2
            print(f"(no intrinsics found; guessing fx={fx:.0f})")
    else:
        fy, cx, cy = args.fy or fx, args.cx or W / 2, args.cy or H / 2

    cfg = D2Config()
    cfg.estimator.focal_length = fx
    cfg.estimator.max_imu_samples = 256
    if args.cpu:
        cfg.dtype = "float64"
    if chain is not None:
        ext = np.stack([c.extrinsic for c in chain[:2]])
    else:
        ext = default_extrinsics(args.baseline)
    est = D2Estimator(cfg, ext)

    sp_cfg = SuperPointConfig(max_keypoints=200, threshold=1e-4)
    if args.sp_weights:
        sp_params = load_params(args.sp_weights, sp_cfg)
        print(f"loaded SuperPoint weights from {args.sp_weights}")
    else:
        sp_params = superpoint_init(jax.random.PRNGKey(0), sp_cfg)
        print("WARNING: random-init SuperPoint (smoke run; pass "
              "--sp-weights for real accuracy)")
    if chain is not None:
        cams = list(chain[:2]) if len(chain) > 1 else [chain[0]] * 2
    else:
        cams = [PinholeParams.make(fx, fy, cx, cy, dtype=jnp.float32)] * 2
    if ds is not None:
        frame_dt = (
            (ds.frames[-1][0] - ds.frames[0][0]) / max(len(ds.frames) - 1, 1)
        )
        events = ds.play(frame_stride=args.stride)
    else:
        frame_dt = 0.05
        events = bag.play_vio(args.imu_topic, args.cam_topics)
    tracker = FeatureTracker(
        sp_params, sp_cfg, cams, TrackerConfig(),
        frame_rate=1.0 / max(frame_dt * args.stride, 1e-3),
    )

    stamps, poses = [], []
    n_done = 0
    frame_id = 0
    for ev in events:
        if ev[0] == "imu":
            est.input_imu(ev[1], ev[2], ev[3])
            continue
        _, t, imgs = ev
        imgs = [np.asarray(im, np.float32) / 255.0
                if np.asarray(im).dtype == np.uint8 else im for im in imgs]
        ff = tracker.process_stereo(
            t, frame_id, imgs[0], imgs[1] if len(imgs) > 1 else imgs[0]
        )
        frame_id += 1
        if ff is None:
            continue
        od = est.input_frame(ff)
        if od is not None:
            stamps.append(t)
            poses.append(od.pose)
        n_done += 1
        if args.dry_run and n_done >= 6:
            print("dry-run: calib -> track -> solve path OK "
                  f"({n_done} frames, {est.solve_count} solves)")
            break
        if args.frames and n_done >= args.frames:
            break

    print(f"processed {n_done} keyframes, {est.solve_count} solves, "
          f"{est.margin_count} marginalizations")
    print(est.perf.summary())
    if args.out and stamps:
        write_trajectory_csv(args.out, stamps, poses)
        print(f"trajectory -> {args.out}")
    if gt_avail and len(stamps) > 3:
        rmse, _ = ate_rmse(
            stamps, np.asarray(poses),
            ds.ground_truth[:, 0], ds.ground_truth[:, 1:8],
        )
        print(f"ATE-RMSE (4-DoF aligned): {rmse:.3f} m")
    return 0


if __name__ == "__main__":
    sys.exit(main())
