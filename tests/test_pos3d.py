"""3-dof world-position landmark parameterization (reference
landmark_param option, d2vins_params.hpp:70-73 + reprojection3d.h):
the solver Schur-eliminates 3x3 landmark blocks instead of scalar
inverse depths."""
import numpy as np

from tests.test_estimator import ate, run_sequence


def test_pos3d_noiseless_matches_invdep():
    est, errs, sim = run_sequence(n_frames=16, landmark_param="pos3d")
    assert est.solve_count >= 10
    assert est.margin_count >= 5
    rmse = ate(errs)
    assert rmse < 0.03, f"pos3d ATE {rmse}"
    # parity with the inverse-depth parameterization on the same run
    est2, errs2, _ = run_sequence(n_frames=16, landmark_param="inv_dep")
    assert abs(ate(errs2) - rmse) < 0.03


def test_pos3d_noisy_stays_bounded():
    est, errs, sim = run_sequence(
        n_frames=16, landmark_param="pos3d",
        pix_noise_rad=0.5 / 460.0,
        acc_noise=0.05, gyr_noise=0.004,
        gyr_bias=(0.002, 0.001, -0.002), seed=1,
    )
    rmse = ate(errs)
    assert rmse < 0.2, f"pos3d noisy ATE {rmse}"


def test_pos3d_landmark_geometry_gauge_invariant():
    """Pairwise landmark distances are gauge-free: solved pos3d
    landmark geometry must match the simulated world."""
    from d2slam_tpu.vins.landmark_manager import ESTIMATED

    est, errs, sim = run_sequence(n_frames=16, landmark_param="pos3d")
    ids, est_pos = [], []
    for lm in est.lmanager.db.values():
        if (lm.position is not None and lm.flag == ESTIMATED
                and lm.lm_id < len(sim.lms)):
            ids.append(lm.lm_id)
            est_pos.append(lm.position)
    assert len(ids) > 30
    est_pos = np.asarray(est_pos)
    gt_pos = sim.lms[ids]
    derr = []
    for i in range(0, len(ids) - 1, 2):
        de = np.linalg.norm(est_pos[i] - est_pos[i + 1])
        dg = np.linalg.norm(gt_pos[i] - gt_pos[i + 1])
        derr.append(abs(de - dg))
    assert np.median(derr) < 0.05, f"pairwise dist err {np.median(derr)}"
