"""Marginalization golden test: solving the reduced problem with the
marginal prior reproduces the full-problem MAP on kept frames."""
import jax
import jax.numpy as jnp
import numpy as np

from d2slam_tpu.geometry.lie import pose_boxminus, pose_boxplus
from d2slam_tpu.solver import VIOLayout, lm_solve_vio
from d2slam_tpu.solver.marginalization import (
    make_pose_prior,
    marginalize,
    permute_prior_frames,
)
from d2slam_tpu.utils.synthetic import make_circle_scene

LAYOUT = VIOLayout(W=6, C=2, L=64, M=512, N_IMU_SAMPLES=128)
PSI = 460.0 / 1.5
ALL_FREE_COLS = jnp.zeros(LAYOUT.D_pad, bool).at[: 15 * LAYOUT.W].set(True)


def solve(state, imu, proj, prior, gravity, iters=10):
    return lm_solve_vio(
        LAYOUT, state, imu, proj, prior,
        gravity=gravity, col_free=ALL_FREE_COLS,
        proj_sqrt_info=PSI, max_iters=iters,
    )


def drop_frame0(scene):
    """Invalidate frame-0-touching measurements and frame-0 landmarks."""
    imu, proj = scene["imu"], scene["proj"]
    imu2 = imu._replace(valid=imu.valid & (imu.frame_i != 0) & (imu.frame_j != 0))
    lm_anchored0 = np.zeros(LAYOUT.L, bool)
    pm = {k: np.asarray(v) for k, v in proj._asdict().items()}
    lm_anchored0[pm["lm"][pm["valid"] & (pm["frame_i"] == 0)]] = True
    touches0 = (pm["frame_i"] == 0) | (pm["frame_j"] == 0) | lm_anchored0[pm["lm"]]
    proj2 = proj._replace(valid=proj.valid & ~jnp.asarray(touches0))
    return imu2, proj2, lm_anchored0


def test_marginal_prior_matches_full_map():
    scene = make_circle_scene(
        LAYOUT, n_frames=6, n_landmarks=40, pix_noise_rad=0.5 / 460.0, seed=5
    )
    gt = scene["gt_state"]
    g = scene["gravity"]
    prior0 = make_pose_prior(LAYOUT, gt, frame=0)

    # full MAP
    x_full, rep_full = solve(gt, scene["imu"], scene["proj"], prior0, g)

    # marginalize frame 0 at the MAP
    remove = jnp.zeros(LAYOUT.W, bool).at[0].set(True)
    new_prior = marginalize(
        LAYOUT, x_full, scene["imu"], scene["proj"], prior0, remove,
        gravity=g, proj_sqrt_info=PSI,
    )
    assert int(jnp.sum(new_prior.row_valid)) > 6

    # reduced problem: no frame-0 measurements, frame 0 invalid
    imu2, proj2, lm_anchored0 = drop_frame0(scene)
    red_state = x_full._replace(
        frame_valid=x_full.frame_valid.at[0].set(False),
        lm_valid=x_full.lm_valid & ~jnp.asarray(lm_anchored0),
    )
    # perturb kept frames then re-solve with the marginal prior only
    rng = np.random.default_rng(9)
    dpose = np.zeros((LAYOUT.W, 6))
    dpose[1:6] = rng.normal(0, 0.01, (5, 6))
    pert = red_state._replace(
        poses=jax.vmap(pose_boxplus)(red_state.poses, jnp.asarray(dpose)),
        sb=red_state.sb + jnp.asarray(rng.normal(0, 0.01, (LAYOUT.W, 9))),
    )
    x_red, rep_red = solve(pert, imu2, proj2, new_prior, g)

    err = jax.vmap(pose_boxminus)(x_red.poses, x_full.poses)
    err = np.asarray(err)[1:6]
    assert np.abs(err).max() < 2e-3, f"kept-frame deviation {np.abs(err).max()}"
    sb_err = np.asarray(x_red.sb - x_full.sb)[1:6]
    assert np.abs(sb_err).max() < 2e-2


def test_prior_gauge_rank():
    """Marginal prior of a gauge-pinned problem keeps the gauge: the
    reduced Hessian must be full rank over kept frame dims."""
    scene = make_circle_scene(LAYOUT, n_frames=6, n_landmarks=40, seed=2)
    gt = scene["gt_state"]
    prior0 = make_pose_prior(LAYOUT, gt, frame=0)
    remove = jnp.zeros(LAYOUT.W, bool).at[0].set(True)
    new_prior = marginalize(
        LAYOUT, gt, scene["imu"], scene["proj"], prior0, remove,
        gravity=scene["gravity"], proj_sqrt_info=PSI,
    )
    J = np.asarray(new_prior.J)
    H = J.T @ J
    # frame 1 is fully constrained (IMU(0,1) + anchored-landmark rows +
    # the chained gauge prior)
    # (not full 15-rank: eliminating frame 0's unconstrained v/ba/bg
    # legitimately absorbs 3 directions)
    H11 = H[15 * 1 : 15 * 2, 15 * 1 : 15 * 2]
    eigs = np.linalg.eigvalsh(H11)
    assert (eigs > 1e-2).sum() >= 10, f"rank too low: {eigs}"
    # speed/bias of frames 2..5 are untouched by frame-0 rows: no
    # spurious information may appear there
    for w in range(2, 6):
        sb_cols = slice(15 * w + 6, 15 * w + 15)
        assert np.abs(H[sb_cols, sb_cols]).max() < 1e-8  # numerical crumbs only
    # but poses of later frames ARE constrained through frame-0-anchored
    # landmarks observed there
    H22 = H[15 * 2 : 15 * 2 + 6, 15 * 2 : 15 * 2 + 6]
    assert np.linalg.eigvalsh(H22).max() > 1.0


def test_permute_prior_frames():
    scene = make_circle_scene(LAYOUT, n_frames=6, n_landmarks=40, seed=2)
    gt = scene["gt_state"]
    prior0 = make_pose_prior(LAYOUT, gt, frame=0)
    remove = jnp.zeros(LAYOUT.W, bool).at[0].set(True)
    pr = marginalize(
        LAYOUT, gt, scene["imu"], scene["proj"], prior0, remove,
        gravity=scene["gravity"], proj_sqrt_info=PSI,
    )
    # shift window down by one: new slot w <- old slot w+1
    slot_map = [1, 2, 3, 4, 5, -1]
    pr2 = permute_prior_frames(LAYOUT, pr, slot_map)
    # column blocks moved
    np.testing.assert_allclose(
        np.asarray(pr2.J[:, 0:15]), np.asarray(pr.J[:, 15:30]), atol=0
    )
    np.testing.assert_allclose(np.asarray(pr2.J[:, 15 * 5 : 15 * 6]), 0, atol=0)
    np.testing.assert_allclose(
        np.asarray(pr2.lin.poses[0]), np.asarray(pr.lin.poses[1]), atol=0
    )
    assert not bool(pr2.lin.frame_valid[5])


def _brute_force_marginal(layout, state, imu_sel, proj_sel, prior, remove, g, psi):
    """Reference implementation: dense joint Schur over [removed frame
    dims + touched landmark cols] computed with explicit numpy algebra
    from the same row builders."""
    from d2slam_tpu.solver.vio_assembly import (
        assemble_full_rows, build_imu_rows, build_prior_rows, build_proj_rows,
    )

    blocks = [
        build_imu_rows(LAYOUT, state, imu_sel, g),
        build_proj_rows(LAYOUT, state, proj_sel, psi, 20.0, 1.0),
        build_prior_rows(LAYOUT, state, prior),
    ]
    rows = assemble_full_rows(tuple(blocks))
    J = np.asarray(rows.J)
    r = np.asarray(rows.r)
    Jl = np.asarray(rows.Jl)
    lm = np.asarray(rows.lm)
    used = np.asarray(rows.lm_used)
    N, D = J.shape
    L = layout.L
    Jfull = np.zeros((N, D + L))
    Jfull[:, :D] = J
    Jfull[np.arange(N), D + lm] += Jl * used
    H = Jfull.T @ Jfull
    g_vec = Jfull.T @ r
    elim = np.zeros(D + L, bool)
    for w in range(layout.W):
        if remove[w]:
            elim[15 * w : 15 * w + 15] = True
    lm_touched = np.zeros(L, bool)
    lm_touched[lm[used & (np.abs(Jl) > 0)]] = True
    elim[D:] = lm_touched
    k = ~elim
    Hee = H[np.ix_(elim, elim)] + 1e-10 * np.eye(elim.sum())
    Hke = H[np.ix_(k, elim)]
    X = np.linalg.solve(Hee, Hke.T)
    Hred = H[np.ix_(k, k)] - Hke @ X
    gred = g_vec[k] - Hke @ np.linalg.solve(Hee, g_vec[elim])
    # scatter back into [D | L]; landmark keep-cols have zero rows
    Hout = np.zeros((D + L, D + L))
    Hout[np.ix_(k, k)] = Hred
    gout = np.zeros(D + L)
    gout[k] = gred
    return Hout[:D, :D], gout[:D]


def test_remove_base_mode2_matches_brute_force():
    """Mode 2 (reference default remove_base_when_margin_remote=2,
    d2vins_params.hpp:108): observer-removed rows of kept-anchor
    landmarks enter the marginalization and their landmarks are
    Schur-eliminated. The masked fixed-shape kernel must equal an
    explicit dense joint Schur complement, and must carry strictly more
    information than mode 0 (which drops those rows)."""
    scene = make_circle_scene(
        LAYOUT, n_frames=6, n_landmarks=40, pix_noise_rad=0.5 / 460.0, seed=7
    )
    gt = scene["gt_state"]
    g = scene["gravity"]
    prior0 = make_pose_prior(LAYOUT, gt, frame=0)
    # remove a MIDDLE frame: landmarks anchored at frame 0 observed by
    # frame 2 are the kept-anchor/removed-observer case
    remove = jnp.zeros(LAYOUT.W, bool).at[2].set(True)
    imu, proj = scene["imu"], scene["proj"]

    priors = {}
    for mode in (0, 2):
        priors[mode] = marginalize(
            LAYOUT, gt, imu, proj, prior0, remove,
            gravity=g, proj_sqrt_info=PSI, remove_base_mode=mode,
        )

    H = {m: np.asarray(p.J).T @ np.asarray(p.J) for m, p in priors.items()}
    gv = {m: np.asarray(p.J).T @ np.asarray(p.r) for m, p in priors.items()}

    # mode 2 keeps information mode 0 drops
    assert np.trace(H[2]) > np.trace(H[0]) * 1.0001

    # brute force with the mode-2 row selection
    remove_np = np.asarray(remove)
    pm = {k: np.asarray(v) for k, v in proj._asdict().items()}
    touch = remove_np[pm["frame_i"]] | remove_np[pm["frame_j"]]
    proj_sel = proj._replace(valid=proj.valid & jnp.asarray(touch))
    imu_touch = (remove_np[np.asarray(imu.frame_i)]
                 | remove_np[np.asarray(imu.frame_j)])
    imu_sel = imu._replace(valid=imu.valid & jnp.asarray(imu_touch))
    Hb, gb = _brute_force_marginal(
        LAYOUT, gt, imu_sel, proj_sel, prior0, remove_np, g, PSI
    )
    scale = max(np.abs(Hb).max(), 1.0)
    np.testing.assert_allclose(H[2], Hb, atol=2e-6 * scale)
    np.testing.assert_allclose(
        gv[2], gb, atol=2e-6 * max(np.abs(gb).max(), 1.0)
    )
