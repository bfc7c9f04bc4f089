"""Compact normal-equation assembly == row-matrix assembly.

The block-scatter path (solver/normal_assembly.py) must produce exactly
the sums the dense-row path (solver/vio_assembly.py) produces:
H = (rows.J)^T rows.J, g = rows.J^T r, and the landmark blocks the
Schur elimination consumes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2slam_tpu.solver import VIOLayout
from d2slam_tpu.solver.normal_assembly import (
    build_proj_normal,
    build_proj_normal_pos3d,
    build_window_normal,
    compact_placement,
)
from d2slam_tpu.solver.vio_assembly import (
    assemble_full_rows,
    build_imu_rows,
    build_proj_rows,
    build_proj_rows_pos3d,
)
from d2slam_tpu.utils.synthetic import make_circle_scene

LAYOUT = VIOLayout(W=6, C=2, L=32, M=128, N_IMU_SAMPLES=64)
PSI = 460.0 / 1.5


def _embed_hpl(hpl):
    """Compact [L, (3,) G] landmark coupling -> global [L, (3,) D]."""
    P, _ = compact_placement(LAYOUT, jnp.float64)
    return np.asarray(hpl) @ np.asarray(P)


def _scene(pos3d=False):
    # the same measurement container drives both parameterizations:
    # pos3d treats each row as an independent observation of frame_j
    # (frame_i ignored) against gt_state.lm_pos
    return make_circle_scene(
        LAYOUT, n_frames=6, n_landmarks=24, dt_frame=0.12,
        pix_noise_rad=0.5 / 460.0, dtype=jnp.float64,
    )


def _rows_normal(rows, L, D):
    J = np.asarray(rows.J)
    r = np.asarray(rows.r)
    Jl = np.asarray(rows.Jl)
    lm = np.asarray(rows.lm)
    H = J.T @ J
    g = J.T @ r
    if Jl.ndim == 1:
        hll = np.zeros(L)
        gl = np.zeros(L)
        Hpl = np.zeros((L, D))
        np.add.at(hll, lm, Jl * Jl)
        np.add.at(gl, lm, Jl * r)
        np.add.at(Hpl, lm, J * Jl[:, None])
    else:
        hll = np.zeros((L, 3, 3))
        gl = np.zeros((L, 3))
        Hpl = np.zeros((L, 3, D))
        np.add.at(hll, lm, Jl[:, :, None] * Jl[:, None, :])
        np.add.at(gl, lm, Jl * r[:, None])
        np.add.at(Hpl, lm, Jl[:, :, None] * J[:, None, :])
    return H, g, hll, gl, Hpl


def test_proj_normal_matches_rows():
    scene = _scene()
    gt, proj = scene["gt_state"], scene["proj"]
    rows = build_proj_rows(LAYOUT, gt, proj, PSI, 20.0, 1.0)
    H, g, hll, gl, Hpl = _rows_normal(rows, LAYOUT.L, LAYOUT.D_pad)

    n = build_proj_normal(LAYOUT, gt, proj, PSI, 20.0, 1.0)
    np.testing.assert_allclose(np.asarray(n.H), H, atol=1e-8)
    np.testing.assert_allclose(np.asarray(n.g), g, atol=1e-8)
    np.testing.assert_allclose(np.asarray(n.hll), hll, atol=1e-8)
    np.testing.assert_allclose(np.asarray(n.gl), gl, atol=1e-8)
    np.testing.assert_allclose(_embed_hpl(n.Hpl), Hpl, atol=1e-8)
    np.testing.assert_allclose(
        float(n.cost), float(np.sum(np.asarray(rows.cost))), rtol=1e-10
    )


def test_proj_normal_pos3d_matches_rows():
    scene = _scene(pos3d=True)
    gt, proj = scene["gt_state"], scene["proj"]
    rows = build_proj_rows_pos3d(LAYOUT, gt, proj, PSI, 20.0, 1.0)
    H, g, hll, gl, Hpl = _rows_normal(rows, LAYOUT.L, LAYOUT.D_pad)

    n = build_proj_normal_pos3d(LAYOUT, gt, proj, PSI, 20.0, 1.0)
    np.testing.assert_allclose(np.asarray(n.H), H, atol=1e-8)
    np.testing.assert_allclose(np.asarray(n.g), g, atol=1e-8)
    np.testing.assert_allclose(np.asarray(n.hll), hll, atol=1e-8)
    np.testing.assert_allclose(np.asarray(n.gl), gl, atol=1e-8)
    np.testing.assert_allclose(_embed_hpl(n.Hpl), Hpl, atol=1e-8)


def test_window_normal_includes_imu_and_prior():
    from d2slam_tpu.solver.marginalization import make_pose_prior
    from d2slam_tpu.solver.vio_assembly import build_prior_rows

    scene = _scene()
    gt, proj, imu = scene["gt_state"], scene["proj"], scene["imu"]
    prior = make_pose_prior(LAYOUT, gt, frame=0)
    rows = assemble_full_rows((
        build_imu_rows(LAYOUT, gt, imu, scene["gravity"]),
        build_proj_rows(LAYOUT, gt, proj, PSI, 20.0, 1.0),
        build_prior_rows(LAYOUT, gt, prior),
    ))
    H, g, hll, gl, Hpl = _rows_normal(rows, LAYOUT.L, LAYOUT.D_pad)
    n = build_window_normal(
        LAYOUT, gt, imu, proj, prior, gravity=scene["gravity"],
        proj_sqrt_info=PSI, dep_sqrt_info=20.0, huber_delta=1.0,
    )
    np.testing.assert_allclose(np.asarray(n.H), H, atol=1e-7)
    np.testing.assert_allclose(np.asarray(n.g), g, atol=1e-7)
    np.testing.assert_allclose(np.asarray(n.hll), hll, atol=1e-8)
    np.testing.assert_allclose(
        float(n.cost), float(np.sum(np.asarray(rows.cost))), rtol=1e-9
    )


def test_jit_and_vmap_compile():
    scene = _scene()
    gt, proj = scene["gt_state"], scene["proj"]
    f = jax.jit(lambda s: build_proj_normal(
        LAYOUT, s, proj, PSI, 20.0, 1.0
    ))
    n = f(gt)
    assert np.isfinite(np.asarray(n.H)).all()
    fb = jax.jit(jax.vmap(lambda s: build_proj_normal(
        LAYOUT, s, proj, PSI, 20.0, 1.0
    )))
    sb = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (3,) + x.shape), gt
    )
    nb = fb(sb)
    np.testing.assert_allclose(
        np.asarray(nb.H[0]), np.asarray(n.H), rtol=1e-12
    )
