"""Two-thread frontend/backend pipeline (reference
processStereoFrameThread + processVIOKFThread split,
d2frontend.cpp:155-198 / d2vins_node.cpp:128-203)."""
import numpy as np
import pytest

from d2slam_tpu.config import D2Config
from d2slam_tpu.frontend.superpoint import SuperPointConfig, superpoint_init
from d2slam_tpu.frontend.tracker import TrackerConfig
from d2slam_tpu.geometry.cameras import PinholeParams
from d2slam_tpu.runtime.system import D2SLAMSystem, SystemConfig
from d2slam_tpu.runtime.threaded import PipelinedSystem
from d2slam_tpu.utils import np_lie
from d2slam_tpu.utils.render import render_blobs
from d2slam_tpu.utils.sim import CircleSim

H, W = 240, 320
FX = FY = 220.0
CX, CY = W / 2, H / 2


@pytest.mark.slow
def test_pipelined_system_matches_serial_quality():
    import jax

    sim = CircleSim(seed=7, baseline=0.2, n_landmarks=150)
    inten = sim.rng.uniform(0.5, 1.0, len(sim.lms))

    def build():
        cfg = D2Config()
        cfg.estimator.max_sld_win_size = 8
        cfg.estimator.min_solve_frames = 4
        cfg.estimator.max_lm_slots = 128
        cfg.estimator.max_solve_measurements = 512
        cfg.estimator.max_imu_samples = 128
        cfg.estimator.max_solver_iters = 5
        cfg.estimator.focal_length = FX
        sp_cfg = SuperPointConfig(max_keypoints=128, threshold=1e-4,
                                  nms_radius=4)
        sp = superpoint_init(jax.random.PRNGKey(0), sp_cfg)
        cams = [PinholeParams.make(FX, FY, CX, CY) for _ in range(2)]
        return D2SLAMSystem(
            cfg, SystemConfig(drone_id=0, enable_loop_detection=False,
                              enable_pgo=False),
            sim.ext, cams, sp_params=sp, sp_cfg=sp_cfg,
            tracker_cfg=TrackerConfig(min_keyframe_parallax=4.0,
                                      search_radius=30.0),
            frame_rate=sim.frame_hz,
        )

    pipe = PipelinedSystem(build(), depth=2)
    t_prev, errs, align = 0.0, [], None
    for k in range(12):
        t = k / sim.frame_hz
        if k == 0:
            for (ts, a, g) in sim.imu_samples(-0.3, 0.0):
                pipe.input_imu(ts, a, g)
        else:
            for (ts, a, g) in sim.imu_samples(t_prev + 1e-6, t + 1e-6):
                pipe.input_imu(ts, a, g)
        t_prev = t
        pose_gt, _ = sim.gt_pose(t)
        imgs = []
        for c in range(2):
            T_cam = np_lie.pose_compose(pose_gt, sim.ext[c])
            imgs.append(render_blobs(sim.lms, T_cam, FX, FY, CX, CY,
                                     H, W, intensities=inten))
        pipe.input_stereo(t, imgs[0], imgs[1])
        pipe.drain()  # deterministic for the accuracy check
        od = pipe.odometry
        if od is None:
            continue
        if align is None:
            align = np_lie.pose_compose(od.pose.astype(np.float64),
                                        np_lie.pose_inverse(pose_gt))
        errs.append(np.linalg.norm(
            od.pose[:3] - np_lie.pose_compose(align, pose_gt)[:3]))
    pipe.close()
    assert pipe.sys.estimator.solve_count >= 7
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    # random-init weights: structural sanity, not an accuracy pin
    assert rmse < 5.0 and np.isfinite(rmse)


def test_pipeline_drop_oldest_and_error_surfacing():
    class FakeTracker:
        def process_stereo(self, t, fid, a, b):
            from d2slam_tpu.vins.types import CameraObservations, FrontendFrame

            return FrontendFrame(stamp=t, frame_id=fid, is_keyframe=True,
                                 observations=[])

    class FakeEstimator:
        def __init__(self):
            self.seen = []

        def input_imu(self, *a):
            pass

        def input_frame(self, ff):
            import time

            time.sleep(0.05)
            self.seen.append(ff.frame_id)
            return None

    class FakeSys:
        tracker = FakeTracker()
        estimator = FakeEstimator()
        odometry = None
        _frame_id = 0

        def _register_keyframe(self, *a, **k):
            pass

    s = FakeSys()
    pipe = PipelinedSystem(s, depth=2, drop_oldest=True)
    for k in range(20):
        pipe.input_stereo(0.1 * k, np.zeros((4, 4)), np.zeros((4, 4)))
    import time

    time.sleep(1.2)
    pipe.close()
    # backend fell behind; drop-oldest kept it on RECENT frames
    assert len(s.estimator.seen) < 20
    assert max(s.estimator.seen) == 19

    # backend exceptions surface on the caller thread
    class BoomEstimator(FakeEstimator):
        def input_frame(self, ff):
            raise RuntimeError("boom")

    s2 = FakeSys()
    s2.estimator = BoomEstimator()
    pipe2 = PipelinedSystem(s2, depth=2)
    pipe2.input_stereo(0.0, np.zeros((4, 4)), np.zeros((4, 4)))
    with pytest.raises(RuntimeError, match="boom"):
        pipe2.drain()
    pipe2.close()  # leave no daemon thread blocked at interpreter exit
