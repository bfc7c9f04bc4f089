"""Pose-graph optimization: synthetic loop with odometry drift + loop
closures; chordal init; g2o roundtrip."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from d2slam_tpu.geometry.lie import (
    pose_boxminus,
    pose_boxplus,
    pose_compose,
    pose_inverse,
    quat_normalize,
    so3_exp_quat,
)
from d2slam_tpu.pgo import (
    PGOEdges,
    PGOLayout,
    PGOState,
    chordal_rotation_init,
    read_g2o,
    solve_pgo,
    write_g2o,
)

LAYOUT = PGOLayout(N=64, E=256, pose_dof=6)


def make_loop_graph(n=40, odo_noise=0.02, rot_noise=0.01, seed=0, dtype=jnp.float64):
    """Ground truth: circle of n poses; edges: odometry chain + closures."""
    rng = np.random.default_rng(seed)
    gt = np.zeros((LAYOUT.N, 7))
    gt[:, 6] = 1
    for k in range(n):
        th = 2 * np.pi * k / n
        q = np.array([0, 0, np.sin(th / 2), np.cos(th / 2)])
        gt[k] = np.concatenate([[10 * np.cos(th), 10 * np.sin(th), 0.0], q])
    valid = np.zeros(LAYOUT.N, bool)
    valid[:n] = True

    edges = []
    for k in range(n - 1):
        edges.append((k, k + 1))
    # loop closures including the big loop
    edges.append((n - 1, 0))
    for k in range(0, n - 10, 7):
        edges.append((k, k + 9))

    E = PGOEdges.empty(LAYOUT, dtype)
    em = {k: np.array(v) for k, v in E._asdict().items()}
    for m, (i, j) in enumerate(edges):
        rel = np.asarray(
            pose_compose(pose_inverse(jnp.asarray(gt[i])), jnp.asarray(gt[j]))
        )
        noise = np.concatenate(
            [rng.normal(0, odo_noise, 3), rng.normal(0, rot_noise, 3)]
        )
        rel = np.asarray(pose_boxplus(jnp.asarray(rel), jnp.asarray(noise)))
        em["i"][m], em["j"][m] = i, j
        em["rel"][m] = rel
        em["valid"][m] = True
    edges_t = PGOEdges(**{
        k: jnp.asarray(v, dtype) if v.dtype == np.float64 else jnp.asarray(v)
        for k, v in em.items()
    })
    return jnp.asarray(gt, dtype), jnp.asarray(valid), edges_t, n


def accumulate_odometry(gt, edges, n):
    """Drifted initial guess: compose odometry chain only."""
    poses = np.asarray(gt).copy()
    rel = np.asarray(edges.rel)
    for k in range(1, n):
        poses[k] = np.asarray(
            pose_compose(jnp.asarray(poses[k - 1]), jnp.asarray(rel[k - 1]))
        )
    return jnp.asarray(poses, gt.dtype)


def test_pgo_closes_loop():
    gt, valid, edges, n = make_loop_graph()
    init = accumulate_odometry(gt, edges, n)
    drift0 = np.linalg.norm(np.asarray(init)[n - 1, :3] - np.asarray(gt)[n - 1, :3])
    assert drift0 > 0.1  # odometry alone has drifted

    state = PGOState(poses=init, valid=valid)
    fixed = jnp.zeros(LAYOUT.N, bool).at[0].set(True)
    new_state, rep = solve_pgo(LAYOUT, state, edges, fixed, max_iters=12)
    assert float(rep.final_cost) < float(rep.initial_cost) * 0.1
    err = np.asarray(jax.vmap(pose_boxminus)(new_state.poses, gt))[: n]
    # optimized graph should be near GT (noise-limited)
    assert np.abs(err[:, :3]).max() < 0.25, f"{np.abs(err[:, :3]).max()}"  # noise-limited


def test_pgo_4dof():
    layout = PGOLayout(N=64, E=256, pose_dof=4)
    gt, valid, edges, n = make_loop_graph()
    init = accumulate_odometry(gt, edges, n)
    state = PGOState(poses=init, valid=valid)
    fixed = jnp.zeros(layout.N, bool).at[0].set(True)
    new_state, rep = solve_pgo(layout, state, edges, fixed, max_iters=12)
    assert float(rep.final_cost) < float(rep.initial_cost) * 0.2
    err = np.asarray(jax.vmap(pose_boxminus)(new_state.poses, gt))[: n]
    assert np.abs(err[:, :3]).max() < 0.2


def test_chordal_rotation_init():
    gt, valid, edges, n = make_loop_graph(rot_noise=0.005)
    # destroy rotations entirely
    rng = np.random.default_rng(1)
    bad = np.asarray(gt).copy()
    for k in range(1, n):
        bad[k, 3:] = np.asarray(so3_exp_quat(jnp.asarray(rng.normal(0, 1.5, 3))))
    fixed = jnp.zeros(LAYOUT.N, bool).at[0].set(True)
    out = chordal_rotation_init(
        jnp.asarray(bad, jnp.float64), valid, edges.i, edges.j,
        quat_normalize(edges.rel[:, 3:]), edges.valid, fixed,
    )
    err = np.asarray(jax.vmap(pose_boxminus)(out, gt))[: n]
    assert np.abs(err[:, 3:]).max() < 0.08, f"rot err {np.abs(err[:, 3:]).max()}"


def test_g2o_roundtrip(tmp_path):
    gt, valid, edges, n = make_loop_graph()
    verts = {k: np.asarray(gt[k]) for k in range(n)}
    es = []
    for m in range(int(np.asarray(edges.valid).sum())):
        es.append((
            int(edges.i[m]), int(edges.j[m]), np.asarray(edges.rel[m]),
            np.eye(6) * 2.0,
        ))
    p = os.path.join(tmp_path, "g.g2o")
    write_g2o(p, verts, es)
    v2, e2 = read_g2o(p)
    assert len(v2) == n and len(e2) == len(es)
    np.testing.assert_allclose(v2[3], verts[3], atol=1e-8)
    np.testing.assert_allclose(e2[0][2], es[0][2], atol=1e-8)
    np.testing.assert_allclose(e2[0][3], es[0][3], atol=1e-8)


def test_predicted_odometry():
    from d2slam_tpu.pgo.pose_graph import predicted_odometry

    rng = np.random.default_rng(5)
    opt = jnp.asarray(np.concatenate(
        [rng.normal(0, 1, 3),
         np.asarray(so3_exp_quat(jnp.asarray(rng.normal(0, 0.3, 3))))]))
    ego0 = jnp.asarray(np.concatenate(
        [rng.normal(0, 1, 3),
         np.asarray(so3_exp_quat(jnp.asarray(rng.normal(0, 0.3, 3))))]))
    delta = jnp.asarray(np.concatenate(
        [rng.normal(0, 0.2, 3),
         np.asarray(so3_exp_quat(jnp.asarray(rng.normal(0, 0.05, 3))))]))
    ego_now = pose_compose(ego0, delta)
    pred = predicted_odometry(opt, ego0, ego_now)
    expect = pose_compose(opt, delta)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(expect), atol=1e-12)


def test_linear_translation_init():
    """solveLinearPose6d(finetune_rot=false) equivalent: with rotations
    from chordal init, positions come from one linear Laplacian solve
    (reference rotation_initialization_base.hpp:217-245)."""
    from d2slam_tpu.pgo import linear_translation_init

    gt, valid, edges, n = make_loop_graph(odo_noise=0.005, rot_noise=0.002)
    init = accumulate_odometry(gt, edges, n)
    drift0 = np.abs(np.asarray(init)[:n, :3] - np.asarray(gt)[:n, :3]).max()
    assert drift0 > 0.1

    # rotations via chordal init, then positions linearly
    fixed = jnp.zeros(LAYOUT.N, bool).at[0].set(True)
    rot = chordal_rotation_init(
        init, valid, edges.i, edges.j,
        quat_normalize(edges.rel[:, 3:]), edges.valid, fixed,
    )
    for method in ("dense", "cg"):
        out = linear_translation_init(
            rot, valid, edges.i, edges.j, edges.rel[:, :3], edges.valid,
            fixed, method=method)
        err = np.abs(np.asarray(out)[:n, :3] - np.asarray(gt)[:n, :3]).max()
        assert err < 0.05, f"{method}: pos err {err}"

    # dense and matrix-free paths agree
    d = linear_translation_init(rot, valid, edges.i, edges.j,
                                edges.rel[:, :3], edges.valid, fixed)
    c = linear_translation_init(rot, valid, edges.i, edges.j,
                                edges.rel[:, :3], edges.valid, fixed,
                                method="cg", cg_iters=400, cg_rtol=1e-12)
    assert np.abs(np.asarray(d)[:n, :3] - np.asarray(c)[:n, :3]).max() < 1e-5


def test_chordal_gravity_prior_keeps_tilt_bounded():
    """Gravity-prior rows (reference setupRotInitProblembyGravityPrior,
    rotation_initialization_base.hpp:131-144): on a graph with noisy
    relative rotations, the unconstrained chordal solution tilts
    roll/pitch; with the per-frame attitude priors from the (gravity-
    aligned) VIO attitudes the tilt stays bounded. Yaw remains free."""
    from d2slam_tpu.geometry.lie import quat_to_rotmat

    gt, valid, edges, n = make_loop_graph(rot_noise=0.1, seed=5)
    rng = np.random.default_rng(2)
    bad = np.asarray(gt).copy()
    for k in range(1, n):
        bad[k, 3:] = np.asarray(
            so3_exp_quat(jnp.asarray(rng.normal(0, 1.5, 3)))
        )
    fixed = jnp.zeros(LAYOUT.N, bool).at[0].set(True)
    # body-frame gravity direction per frame = third ROW of the GT
    # attitude (what the VIO's gravity-aligned ego attitude provides)
    gb = np.stack([
        np.asarray(quat_to_rotmat(jnp.asarray(q)))[2] for q in gt[:, 3:]
    ])

    def tilt_deg(out):
        errs = []
        for k in range(n):
            r3 = np.asarray(quat_to_rotmat(out[k, 3:]))[2]
            errs.append(np.degrees(np.arccos(np.clip(np.dot(r3, gb[k]),
                                                     -1, 1))))
        return np.asarray(errs)

    args = (jnp.asarray(bad, jnp.float64), valid, edges.i, edges.j,
            quat_normalize(edges.rel[:, 3:]), edges.valid, fixed)
    out_free = chordal_rotation_init(*args)
    out_grav = chordal_rotation_init(
        *args, gravity_body=jnp.asarray(gb), gravity_weight=50.0
    )
    t_free, t_grav = tilt_deg(np.asarray(out_free)), tilt_deg(np.asarray(out_grav))
    # the prior must cut the tilt substantially and keep it small
    assert t_grav.max() < 1.0, f"tilt with prior {t_grav.max():.2f} deg"
    assert t_grav.max() < 0.5 * max(t_free.max(), 1e-9), (
        f"prior did not help: {t_free.max():.2f} -> {t_grav.max():.2f}"
    )

    # matrix-free variant matches the dense gravity-prior solution
    from d2slam_tpu.pgo import chordal_rotation_init_pcg

    out_pcg = chordal_rotation_init_pcg(
        *args, gravity_body=jnp.asarray(gb), gravity_weight=50.0,
        cg_iters=300,
    )
    d = np.asarray(jax.vmap(pose_boxminus)(out_pcg, out_grav))[:n]
    assert np.abs(d[:, 3:]).max() < 2e-3, np.abs(d[:, 3:]).max()
