"""Clean per-stage wall-time split of the measured window (no-compile
frames only): tracker extraction / LK+match / estimator / keyframe
fan-out (gdesc, loop detect, PGO)."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

TIMES = {}


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        TIMES.setdefault(name, []).append((time.perf_counter() - t0) * 1e3)
        return out
    return wrap


def main():
    from d2slam_tpu.config import D2Config
    from d2slam_tpu.frontend.superpoint import SuperPointConfig
    from d2slam_tpu.frontend.train_frontend import load_weights
    from d2slam_tpu.geometry.cameras import PinholeParams
    from d2slam_tpu.runtime.system import D2SLAMSystem, SystemConfig
    from d2slam_tpu.utils import np_lie
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
        imgs.append([
            render_blobs(sim.lms, np_lie.pose_compose(pose, sim.ext[c]),
                         FX, FY, CX, CY, H, W, intensities=inten)
            for c in range(2)
        ])

    cfg = D2Config()
    sys_cfg = SystemConfig(drone_id=0, pgo_every_n_kf=8)
    cams = [PinholeParams.make(FX, FY, CX, CY, dtype=jnp.float32)
            for _ in range(2)]
    sp_params = load_weights("weights/superpoint_synth.npz")
    sp_cfg = SuperPointConfig(max_keypoints=200, threshold=0.010)
    system = D2SLAMSystem(cfg, sys_cfg, sim.ext, cams,
                          sp_params=sp_params, sp_cfg=sp_cfg,
                          frame_rate=sim.frame_hz)

    # wrap the interesting stages
    tr = system.tracker
    tr._extract_batch = timed("extract_batch", tr._extract_batch)
    tr._match = timed("match", tr._match)
    system.estimator.input_frame = timed(
        "estimator.input_frame", system.estimator.input_frame)
    system.gdesc_fn = timed("gdesc", system.gdesc_fn)
    system.detector.detect = timed("loop_detect", system.detector.detect)
    system.solve_pgo = timed("solve_pgo", system.solve_pgo)
    system._make_entry = timed("make_entry", system._make_entry)
    import d2slam_tpu.frontend.lk as lkmod

    orig_lk = lkmod.lk_track_pyramidal
    lkmod.lk_track_pyramidal = timed("lk", orig_lk)
    orig_pyr = lkmod.build_pyramid
    lkmod.build_pyramid = timed("pyramid", orig_pyr)
    import d2slam_tpu.frontend.tracker as trmod

    trmod.lk_track_pyramidal = lkmod.lk_track_pyramidal
    trmod.build_pyramid = lkmod.build_pyramid

    for (t, a, g) in sim.imu_samples(-0.3, 0.0):
        system.input_imu(t, a, g)

    t_prev = 0.0
    frames_ms = []
    for k in range(n_frames):
        t = k / sim.frame_hz
        if k > 0:
            for (ts, a, g) in sim.imu_samples(t_prev + 1e-6, t + 1e-6):
                system.input_imu(ts, a, g)
        t_prev = t
        if k == warm:
            TIMES.clear()
        t0 = time.perf_counter()
        system.input_stereo(t, imgs[k][0], imgs[k][1])
        frames_ms.append((time.perf_counter() - t0) * 1e3)

    meas = frames_ms[warm:]
    print(f"frame ms: mean {np.mean(meas):.1f} p50 {np.median(meas):.1f} "
          f"max {np.max(meas):.1f}")
    for name, ts in sorted(TIMES.items(),
                           key=lambda kv: -sum(kv[1])):
        print(f"  {name:22s} n={len(ts):3d} total={sum(ts):8.1f} ms "
              f"p50={np.median(ts):7.2f} max={np.max(ts):8.1f}")


if __name__ == "__main__":
    main()
