"""End-to-end sliding-window bundle adjustment on a synthetic scene."""
import jax
import jax.numpy as jnp
import numpy as np

from d2slam_tpu.geometry.lie import pose_boxminus, pose_boxplus
from d2slam_tpu.solver import VIOLayout, lm_solve_vio
from d2slam_tpu.solver.vio_assembly import (
    assemble_full_rows,
    build_imu_rows,
    build_proj_rows,
)
from d2slam_tpu.utils.synthetic import default_col_free, make_circle_scene

LAYOUT = VIOLayout(W=6, C=2, L=64, M=512, N_IMU_SAMPLES=128)
PROJ_SQRT_INFO = 460.0 / 1.5  # focal/1.5 px, reference convention


def test_zero_residual_at_gt():
    scene = make_circle_scene(LAYOUT, n_frames=6, n_landmarks=40)
    gt = scene["gt_state"]
    rows_imu = build_imu_rows(LAYOUT, gt, scene["imu"], scene["gravity"])
    # IMU discretization error is small but nonzero
    assert float(jnp.sum(rows_imu.cost)) < 1e-3
    rows_proj = build_proj_rows(LAYOUT, gt, scene["proj"], PROJ_SQRT_INFO, 20.0, 1.0)
    np.testing.assert_allclose(float(jnp.sum(rows_proj.cost)), 0.0, atol=1e-10)


def test_ba_converges_from_perturbation():
    scene = make_circle_scene(LAYOUT, n_frames=6, n_landmarks=40)
    gt = scene["gt_state"]
    rng = np.random.default_rng(7)

    # perturb all but the first frame
    dpose = np.zeros((LAYOUT.W, 6))
    dpose[1:6] = rng.normal(0, 0.05, (5, 6))
    pert = gt._replace(
        poses=jax.vmap(pose_boxplus)(gt.poses, jnp.asarray(dpose)),
        sb=gt.sb + jnp.asarray(rng.normal(0, 0.05, (LAYOUT.W, 9))),
        inv_dep=gt.inv_dep * jnp.asarray(1 + rng.normal(0, 0.1, LAYOUT.L)),
    )

    col_free = default_col_free(LAYOUT, gt)
    new_state, report = lm_solve_vio(
        LAYOUT, pert, scene["imu"], scene["proj"], None,
        gravity=scene["gravity"], col_free=col_free,
        proj_sqrt_info=PROJ_SQRT_INFO, max_iters=10,
    )
    assert float(report.final_cost) < 1e-2 * float(report.initial_cost)
    # pose recovery (first frame fixed = gauge)
    err = jax.vmap(pose_boxminus)(new_state.poses, gt.poses)
    err = np.asarray(err)[np.asarray(gt.frame_valid)]
    assert np.abs(err[:, :3]).max() < 5e-3, f"position err {np.abs(err[:, :3]).max()}"
    assert np.abs(err[:, 3:]).max() < 5e-3, f"rotation err {np.abs(err[:, 3:]).max()}"
    # landmark recovery
    lm_mask = np.asarray(gt.lm_valid)
    rel = np.abs(np.asarray(new_state.inv_dep - gt.inv_dep))[lm_mask]
    assert rel.max() < 1e-2


def test_ba_with_noise_and_huber():
    scene = make_circle_scene(
        LAYOUT, n_frames=6, n_landmarks=40, pix_noise_rad=1.0 / 460.0, seed=3
    )
    gt = scene["gt_state"]
    rng = np.random.default_rng(11)
    dpose = np.zeros((LAYOUT.W, 6))
    dpose[1:6] = rng.normal(0, 0.03, (5, 6))
    pert = gt._replace(
        poses=jax.vmap(pose_boxplus)(gt.poses, jnp.asarray(dpose)),
        inv_dep=gt.inv_dep * jnp.asarray(1 + rng.normal(0, 0.05, LAYOUT.L)),
    )
    col_free = default_col_free(LAYOUT, gt)
    new_state, report = lm_solve_vio(
        LAYOUT, pert, scene["imu"], scene["proj"], None,
        gravity=scene["gravity"], col_free=col_free,
        proj_sqrt_info=PROJ_SQRT_INFO, max_iters=10,
    )
    err = jax.vmap(pose_boxminus)(new_state.poses, gt.poses)
    err = np.asarray(err)[np.asarray(gt.frame_valid)]
    # 1px noise at 460 focal on a 6-frame window: the MAP estimate sits
    # several cm from GT (estimation error, not solver error)
    assert np.abs(err[:, :3]).max() < 0.1
    assert float(report.accepted) >= 3


def test_solver_jits_and_is_deterministic():
    scene = make_circle_scene(LAYOUT, n_frames=6, n_landmarks=30)
    gt = scene["gt_state"]
    col_free = default_col_free(LAYOUT, gt)
    solve = jax.jit(
        lambda s: lm_solve_vio(
            LAYOUT, s, scene["imu"], scene["proj"], None,
            gravity=scene["gravity"], col_free=col_free,
            proj_sqrt_info=PROJ_SQRT_INFO, max_iters=3,
        )
    )
    s1, r1 = solve(gt)
    s2, r2 = solve(gt)
    np.testing.assert_array_equal(np.asarray(s1.poses), np.asarray(s2.poses))


def test_dogleg_converges_from_perturbation():
    """Powell dogleg trust region (Ceres DOGLEG strategy equivalent)
    reaches the same solution as LM damping."""
    scene = make_circle_scene(LAYOUT, n_frames=6, n_landmarks=40)
    gt = scene["gt_state"]
    rng = np.random.default_rng(11)
    dpose = np.zeros((LAYOUT.W, 6))
    dpose[1:6] = rng.normal(0, 0.05, (5, 6))
    pert = gt._replace(
        poses=jax.vmap(pose_boxplus)(gt.poses, jnp.asarray(dpose)),
        sb=gt.sb + jnp.asarray(rng.normal(0, 0.05, (LAYOUT.W, 9))),
        inv_dep=gt.inv_dep * jnp.asarray(1 + rng.normal(0, 0.1, LAYOUT.L)),
    )
    col_free = default_col_free(LAYOUT, gt)
    new_state, report = lm_solve_vio(
        LAYOUT, pert, scene["imu"], scene["proj"], None,
        gravity=scene["gravity"], col_free=col_free,
        proj_sqrt_info=PROJ_SQRT_INFO, max_iters=10, method="dogleg",
    )
    assert float(report.final_cost) < 1e-2 * float(report.initial_cost)
    err = jax.vmap(pose_boxminus)(new_state.poses, gt.poses)
    err = np.asarray(err)[np.asarray(gt.frame_valid)]
    assert np.abs(err[:, :3]).max() < 5e-3
    assert np.abs(err[:, 3:]).max() < 5e-3


def test_float32_iterative_refinement():
    """One refinement pass on the f32 Cholesky recovers the f64-grade
    step on the reduced system (TPU runs the solver in float32)."""
    scene = make_circle_scene(LAYOUT, n_frames=6, n_landmarks=40)
    gt = scene["gt_state"]
    rng = np.random.default_rng(3)
    dpose = np.zeros((LAYOUT.W, 6))
    dpose[1:6] = rng.normal(0, 0.03, (5, 6))
    pert = gt._replace(
        poses=jax.vmap(pose_boxplus)(gt.poses, jnp.asarray(dpose)),
    )
    to32 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x, t
    )
    col_free = default_col_free(LAYOUT, gt)
    kw = dict(
        gravity=to32(scene["gravity"]), col_free=col_free,
        proj_sqrt_info=PROJ_SQRT_INFO, max_iters=8,
    )
    s_ref, _ = lm_solve_vio(
        LAYOUT, to32(pert), to32(scene["imu"]), to32(scene["proj"]), None,
        refine_steps=1, **kw
    )
    err = jax.vmap(pose_boxminus)(s_ref.poses.astype(jnp.float64), gt.poses)
    err = np.asarray(err)[np.asarray(gt.frame_valid)]
    assert np.abs(err[:, :3]).max() < 2e-3, f"f32+refine err {np.abs(err[:, :3]).max()}"
