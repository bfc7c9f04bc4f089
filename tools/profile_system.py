"""Per-frame link/time profile of the whole-system replay.

Runs the same workload as bench.bench_system but prints, for every
frame in the measured window: wall ms, packed device calls, bytes
up/down, wrapper builds (compile events), and the estimator's
per-stage perf counters. This is the diagnostic for the round-3
verdict weak #1 (the system_frame_ms vs link_roundtrip_ms gap).
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
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

    cfg = D2Config()
    sys_cfg = SystemConfig(drone_id=0, pgo_every_n_kf=8)
    cams = [PinholeParams.make(FX, FY, CX, CY, dtype=jnp.float32)
            for _ in range(2)]
    import os

    wpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "weights", "superpoint_synth.npz")
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

    print(f"link_roundtrip_ms = {link_roundtrip_ms():.1f}")
    for (t, a, g) in sim.imu_samples(-0.3, 0.0):
        system.input_imu(t, a, g)

    t_prev = 0.0
    rows = []
    for k in range(n_frames):
        t = k / sim.frame_hz
        if k > 0:
            for (ts, a, g) in sim.imu_samples(t_prev + 1e-6, t + 1e-6):
                system.input_imu(ts, a, g)
        t_prev = t
        snap = LinkStats.snapshot()
        t0 = time.perf_counter()
        od = system.input_stereo(t, imgs[k][0], imgs[k][1])
        ms = (time.perf_counter() - t0) * 1e3
        d = LinkStats.delta(snap)
        rows.append((k, ms, d, od is not None))
        tag = "warm" if k < warm else "MEAS"
        print(f"[{tag}] frame {k:2d}: {ms:8.1f} ms  kf={od is not None}  "
              f"calls={d['calls']} up={d['bytes_up']/1e3:.0f}kB "
              f"down={d['bytes_down']/1e3:.0f}kB builds={d['builds']}")

    meas = [r for r in rows if r[0] >= warm]
    tot = sum(r[1] for r in meas)
    calls = sum(r[2]["calls"] for r in meas)
    print(f"\nmeasured: {tot:.0f} ms over {len(meas)} frames "
          f"({tot/len(meas):.1f} ms/frame), {calls} packed calls "
          f"({calls/len(meas):.1f}/frame)")
    print("estimator stages:", system.estimator.perf.report())


if __name__ == "__main__" and "--cprofile" not in sys.argv:
    main()


def profile_stages():
    """Fine-grained stage split of input_stereo (tracker vs estimator
    vs keyframe fan-out)."""
    import cProfile
    import pstats

    pr = cProfile.Profile()
    pr.enable()
    main()
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(45)


if __name__ == "__main__" and "--cprofile" in sys.argv:
    profile_stages()
