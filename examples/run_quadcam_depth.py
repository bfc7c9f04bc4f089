"""Quadcam omnidirectional depth demo.

Renders a textured cylinder wall from a 4-fisheye rig, builds the 4
virtual stereo pairs, runs disparity with either the trained HitNet
network (the reference's primary path, loaded from its ONNX export via
the ONNX->JAX bridge) or the Pallas/XLA block matcher, and reports the
recovered wall depth per pair (reference pipeline:
quadcam_depth_est/src/quadcam_depth_est_trt.cpp).

    python examples/run_quadcam_depth.py --cpu
    python examples/run_quadcam_depth.py --hitnet /path/to/hitnet.onnx
    python examples/run_quadcam_depth.py --save-viz /tmp/quadcam
"""
import argparse
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--hitnet", default=None,
                    help="HitNet ONNX path (default: reference checkout "
                         "model if present, else block matching)")
    ap.add_argument("--save-viz", default=None,
                    help="directory for disparity colormap PNGs")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from d2slam_tpu.depth.hitnet import REFERENCE_HITNET_F32
    from d2slam_tpu.depth.quadcam import (
        QuadcamConfig, build_virtual_stereo, quadcam_depth,
    )
    from d2slam_tpu.geometry.cameras import KBParams, kb_lift
    from d2slam_tpu.geometry.lie import so3_exp
    from d2slam_tpu.utils import np_lie

    HF, WF, R_WALL = 480, 640, 5.0

    def make_rig(baseline=0.3):
        """4 outward fisheyes at 90 deg steps, each displaced ALONG its
        optical axis (the quadrotor-arm geometry): adjacent centers
        then sit ``baseline`` apart PERPENDICULAR to the pair's virtual
        view direction — the rectified-pair condition the disparity
        model (disp = f*B/z) assumes."""
        radius = baseline / np.sqrt(2.0)
        fisheyes = [KBParams.make(190.0, 190.0, WF / 2, HF / 2, k2=0.005,
                                  dtype=jnp.float32) for _ in range(4)]
        ext = np.zeros((4, 7))
        for i in range(4):
            yaw = np.deg2rad(90.0 * i)
            R = np.asarray(so3_exp(jnp.asarray([0.0, yaw, 0.0])))
            ext[i] = np.concatenate(
                [R @ [0.0, 0.0, radius], np_lie.rotmat_to_quat(R)])
        return fisheyes, ext

    def render(fisheye, T_body_cam, seed=0):
        rng = np.random.default_rng(seed)
        tex = rng.uniform(0, 1, (64, 512))
        from numpy.lib.stride_tricks import sliding_window_view

        tex = (sliding_window_view(np.pad(tex, 2, mode="wrap"), (5, 5))
               / 25).sum(axis=(2, 3))
        ys, xs = np.meshgrid(np.arange(HF), np.arange(WF), indexing="ij")
        uv = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2), jnp.float32)
        rays = np.asarray(kb_lift(uv, fisheye))
        R = np_lie.quat_to_rotmat(T_body_cam[3:])
        rays_b = rays @ R.T
        c = T_body_cam[:3]
        dx, dz = rays_b[:, 0], rays_b[:, 2]
        a = dx * dx + dz * dz
        b = 2 * (c[0] * dx + c[2] * dz)
        cc = c[0] ** 2 + c[2] ** 2 - R_WALL**2
        t = (-b + np.sqrt(np.maximum(b * b - 4 * a * cc, 0.0))) / np.maximum(
            2 * a, 1e-9)
        pts = c + rays_b * t[:, None]
        theta = np.arctan2(pts[:, 0], pts[:, 2])
        ui = ((theta + np.pi) / (2 * np.pi) * 512).astype(int) % 512
        vi = np.clip(((pts[:, 1] + 2.0) / 4.0 * 64).astype(int), 0, 63)
        return tex[vi, ui].reshape(HF, WF).astype(np.float32)

    print(f"backend: {jax.default_backend()}")
    fisheyes, ext = make_rig()
    cfg = QuadcamConfig(out_hw=(240, 320), min_z=1.0, max_z=20.0)
    pairs = build_virtual_stereo(fisheyes, ext, cfg)
    imgs = [jnp.asarray(render(fisheyes[i], ext[i])) for i in range(4)]

    hitnet = None
    path = args.hitnet or (REFERENCE_HITNET_F32
                           if os.path.exists(REFERENCE_HITNET_F32) else None)
    if path:
        from d2slam_tpu.depth.hitnet import load_trained_hitnet

        print(f"disparity backend: trained HitNet ({path})")
        hitnet = load_trained_hitnet(path)
    else:
        print("disparity backend: block matching (no HitNet onnx found)")

    # RGB texture: tint the gray render per camera so the colored-cloud
    # path (reference publishThread RGB clouds) is exercised end to end
    tints = np.array([[1.0, 0.6, 0.6], [0.6, 1.0, 0.6],
                      [0.6, 0.6, 1.0], [1.0, 1.0, 0.6]])
    color_imgs = [
        jnp.asarray(np.asarray(imgs[i])[..., None] * tints[i], jnp.float32)
        for i in range(4)
    ]

    t0 = time.perf_counter()
    out = quadcam_depth(imgs, pairs, cfg, hitnet=hitnet,
                        color_images=color_imgs)
    jax.block_until_ready([pts for pts, _, _ in out])
    print(f"4-pair pipeline: {(time.perf_counter() - t0) * 1000:.1f} ms "
          "(incl. compile)")

    from d2slam_tpu.depth.quadcam import cloud_in_body

    n_cloud = 0
    for k, (pts, ok, tex) in enumerate(out):
        z = np.asarray(pts[..., 2])
        m = np.asarray(ok)
        med = float(np.median(z[m])) if m.any() else float("nan")
        body = np.asarray(cloud_in_body(pairs[k], pts))
        rgb = np.asarray(tex)[m]
        n_cloud += int(m.sum())
        print(f"pair {k} (cams {pairs[k].cam_left}-{pairs[k].cam_right}): "
              f"valid {m.mean() * 100:.0f}%  median depth {med:.2f} m "
              f"(wall radius {R_WALL} m)  rgb mean {rgb.mean(0).round(2)}")
        assert body.shape == pts.shape
    print(f"colored omnidirectional cloud: {n_cloud} points "
          "(body frame, per-point RGB)")

    # 3-stage pipelined replay over the native bounded queues
    # (reference raw-process / inference / publish threads,
    # quadcam_depth_est_trt.hpp:32-43)
    import threading

    from d2slam_tpu.runtime.pipeline import FrameQueue

    q_raw, q_out = FrameQueue(2), FrameQueue(4)
    N_FRAMES = 6 if jax.default_backend() != "cpu" else 3

    def producer():
        for _ in range(N_FRAMES):
            q_raw.push_obj((imgs, color_imgs), block_ms=1000)

    def worker():
        for _ in range(N_FRAMES):
            frame = q_raw.pop_obj(timeout_ms=2000)
            if frame is None:
                break
            fi, ci = frame
            res = quadcam_depth(fi, pairs, cfg, hitnet=hitnet,
                                color_images=ci)
            jax.block_until_ready([p for p, _, _ in res])
            q_out.push_obj(len(res), block_ms=1000)

    threading.Thread(target=producer, daemon=True).start()
    t0 = time.perf_counter()
    w = threading.Thread(target=worker, daemon=True)
    w.start()
    done = sum(1 for _ in range(N_FRAMES)
               if q_out.pop_obj(timeout_ms=120000) is not None)
    w.join(timeout=20)
    dt = (time.perf_counter() - t0) / max(done, 1)
    print(f"pipelined replay: {done}/{N_FRAMES} frames, "
          f"{dt * 1000:.1f} ms/frame steady-state")

    if args.save_viz:
        from d2slam_tpu.utils.visualization import disparity_to_rgb

        os.makedirs(args.save_viz, exist_ok=True)
        for k, (pts, ok, _tex) in enumerate(out):
            z = np.asarray(pts[..., 2])
            f = pairs[k].focal * pairs[k].baseline
            disp = np.where(np.asarray(ok), f / np.maximum(z, 1e-6), 0.0)
            rgb = disparity_to_rgb(disp, max_disp=float(disp.max() + 1e-6))
            import matplotlib.pyplot as plt

            plt.imsave(os.path.join(args.save_viz, f"disp_{k}.png"), rgb)
        print(f"saved disparity maps to {args.save_viz}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
