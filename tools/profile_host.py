"""Host-path profile of the measured system window.

Warms the system (compiles absorbed), then cProfiles ONLY the
measured frames and prints the top host functions by tottime with
jax-wait frames called out — the diagnostic for round-4 verdict
weak #1 (219 ms/frame of GIL-held host bookkeeping).
"""
import cProfile
import pstats
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main(n_top=40):
    from d2slam_tpu.config import D2Config
    from d2slam_tpu.frontend.superpoint import (
        SuperPointConfig,
        superpoint_init,
    )
    from d2slam_tpu.geometry.cameras import PinholeParams
    from d2slam_tpu.runtime.system import D2SLAMSystem, SystemConfig
    from d2slam_tpu.utils import np_lie
    from d2slam_tpu.utils.placement import LinkStats, link_roundtrip_ms
    from d2slam_tpu.utils.render import render_blobs
    from d2slam_tpu.utils.sim import CircleSim

    H, W = 480, 640
    FX = FY = 460.0
    CX, CY = W / 2, H / 2
    warm, measure = 14, 16
    n_frames = warm + measure

    sim = CircleSim(n_landmarks=400, seed=5, baseline=0.2,
                    max_obs_per_frame=200)
    inten = sim.rng.uniform(0.5, 1.0, len(sim.lms))
    imgs = []
    for k in range(n_frames):
        t = k / sim.frame_hz
        pose, _ = sim.gt_pose(t)
        pair = []
        for c in range(2):
            T_cam = np_lie.pose_compose(pose, sim.ext[c])
            pair.append(render_blobs(sim.lms, T_cam, FX, FY, CX, CY,
                                     H, W, intensities=inten))
        imgs.append(pair)

    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = D2Config()
    nv_path = os.path.join(here, "weights", "netvlad_synth.npz")
    sys_cfg = SystemConfig(
        drone_id=0, pgo_every_n_kf=8, pgo_async=True,
        netvlad_weights=nv_path if os.path.exists(nv_path) else "",
    )
    cams = [PinholeParams.make(FX, FY, CX, CY, dtype=jnp.float32)
            for _ in range(2)]
    wpath = os.path.join(here, "weights", "superpoint_synth.npz")
    if os.path.exists(wpath):
        from d2slam_tpu.frontend.train_frontend import load_weights

        sp_params = load_weights(wpath)
        sp_cfg = SuperPointConfig(max_keypoints=200, threshold=0.010)
    else:
        sp_cfg = SuperPointConfig(max_keypoints=200, threshold=1e-4)
        sp_params = superpoint_init(jax.random.PRNGKey(0), sp_cfg)
    system = D2SLAMSystem(cfg, sys_cfg, sim.ext, cams,
                          sp_params=sp_params, sp_cfg=sp_cfg,
                          frame_rate=sim.frame_hz)

    for (t, a, g) in sim.imu_samples(-0.3, 0.0):
        system.input_imu(t, a, g)

    t_prev = 0.0

    def play(k0, k1):
        nonlocal t_prev
        for k in range(k0, k1):
            t = k / sim.frame_hz
            if k > 0:
                for (ts, a, g) in sim.imu_samples(t_prev + 1e-6, t + 1e-6):
                    system.input_imu(ts, a, g)
            t_prev = t
            system.input_stereo(t, imgs[k][0], imgs[k][1])

    play(0, warm)
    system.wait_pgo()
    link0 = LinkStats.snapshot()
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    play(warm, n_frames)
    pr.disable()
    wall = time.perf_counter() - t0
    system.wait_pgo()
    link = LinkStats.delta(link0)
    print(f"\nmeasured {measure} frames: {wall*1e3/measure:.1f} ms/frame, "
          f"link {link['call_ms']/measure:.1f} ms/frame, "
          f"host {(wall*1e3 - link['call_ms'])/measure:.1f} ms/frame")
    st = pstats.Stats(pr)
    st.sort_stats("tottime").print_stats(n_top)
    st.dump_stats("/tmp/host_profile.pstats")
    print("== callers of numpy.asarray ==")
    st.print_callers("built-in method numpy.asarray")
    print("== callers of try_to_block ==")
    st.print_callers("try_to_block")
    print("== callers of _value ==")
    st.print_callers("array.py:631")


if __name__ == "__main__":
    main()
