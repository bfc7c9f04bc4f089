"""Two full estimators in DISTRIBUTED_CAMERA_CONSENUS mode, running in
threads and exchanging consensus sub-steps over real UDP multicast while
processing the same synthetic flight."""
import threading

import numpy as np
import pytest

from d2slam_tpu.comm.consensus_transport import TransportConsensus
from d2slam_tpu.comm.transport import UDPMulticastTransport
from d2slam_tpu.config import D2Config
from d2slam_tpu.utils.sim import CircleSim
from d2slam_tpu.vins.estimator import D2Estimator


@pytest.mark.slow
def test_two_distributed_estimators_agree():
    try:
        ta = UDPMulticastTransport(self_id=1, port=17671)
        tb = UDPMulticastTransport(self_id=2, port=17671)
    except OSError:
        pytest.skip("multicast unavailable")

    def make(rid, transport, seed):
        cfg = D2Config()
        cfg.estimator.max_sld_win_size = 6
        cfg.estimator.min_solve_frames = 3
        cfg.estimator.max_lm_slots = 64
        cfg.estimator.max_solve_measurements = 256
        cfg.estimator.max_imu_samples = 128
        cfg.estimator.max_solver_iters = 3
        cfg.estimator.consensus_max_steps = 1
        sim = CircleSim(pix_noise_rad=0.5 / 460.0, seed=seed)
        est = D2Estimator(cfg, sim.ext)
        est.attach_consensus(
            TransportConsensus(transport, rid), expected_peers=1,
            timeout_ms=3000,
        )
        return est, sim

    est_a, sim_a = make(1, ta, seed=0)
    est_b, sim_b = make(2, tb, seed=99)  # same scene geometry, diff noise

    n_frames = 8
    barrier = threading.Barrier(2, timeout=180)
    errs = []

    def run(est, sim):
        try:
            for (t, a, g) in sim.imu_samples(-0.3, 0.0):
                est.input_imu(t, a, g)
            t_prev = 0.0
            for k in range(n_frames):
                t = k / sim.frame_hz
                if k:
                    for (ts, a, g) in sim.imu_samples(t_prev + 1e-6, t + 1e-6):
                        est.input_imu(ts, a, g)
                t_prev = t
                barrier.wait()  # frame-aligned so consensus tokens match
                est.input_frame(sim.frame(k))
        except Exception as e:  # pragma: no cover
            errs.append(e)
            raise

    th = threading.Thread(target=run, args=(est_b, sim_b))
    th.start()
    run(est_a, sim_a)
    th.join(timeout=300)
    assert not th.is_alive() and not errs

    # both initialized, solved, and their latest window poses agree
    assert est_a.solve_count >= 4 and est_b.solve_count >= 4
    wa = len(est_a.frames) - 1
    wb = len(est_b.frames) - 1
    pa = np.asarray(est_a.state.poses[wa])
    pb = np.asarray(est_b.state.poses[wb])
    assert np.linalg.norm(pa[:3] - pb[:3]) < 0.1, (pa[:3], pb[:3])
    ta.close()
    tb.close()
