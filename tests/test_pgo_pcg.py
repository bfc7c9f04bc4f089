"""Matrix-free PCG pose-graph solver: agreement with the dense solver
on small graphs, convergence at scales the dense path cannot touch."""
import jax.numpy as jnp
import numpy as np

from d2slam_tpu.geometry.lie import (
    pose_boxplus,
    pose_compose,
    pose_inverse,
)
from d2slam_tpu.pgo import (
    PGOEdges,
    PGOLayout,
    PGOState,
    solve_pgo,
    solve_pgo_pcg,
)

from tests.test_pgo import LAYOUT, accumulate_odometry, make_loop_graph


def _pos_err(poses, gt, valid):
    return np.linalg.norm(
        np.asarray(poses)[valid, :3] - gt[valid, :3], axis=-1
    )


def test_pcg_matches_dense():
    gt, valid, edges, n = make_loop_graph()
    init = accumulate_odometry(gt, edges, n)
    state = PGOState(poses=jnp.asarray(init), valid=jnp.asarray(valid))
    fixed = jnp.zeros(LAYOUT.N, bool).at[0].set(True)

    dense, rep_d = solve_pgo(LAYOUT, state, edges, fixed, max_iters=12)
    pcg, rep_p = solve_pgo_pcg(
        LAYOUT, state, edges, fixed, max_iters=12, cg_iters=200, cg_rtol=1e-10
    )
    assert float(rep_p.final_cost) <= float(rep_d.final_cost) * 1.05
    # both land on the same optimum
    d = _pos_err(pcg.poses, np.asarray(dense.poses), valid)
    assert d.max() < 1e-2, d.max()


def test_pcg_4dof():
    layout = PGOLayout(N=64, E=256, pose_dof=4)
    gt, valid, edges, n = make_loop_graph()
    init = accumulate_odometry(gt, edges, n)
    state = PGOState(poses=jnp.asarray(init), valid=jnp.asarray(valid))
    fixed = jnp.zeros(layout.N, bool).at[0].set(True)
    new_state, rep = solve_pgo_pcg(layout, state, edges, fixed, max_iters=12)
    assert float(rep.final_cost) < 0.2 * float(rep.initial_cost)
    err = _pos_err(new_state.poses, gt, valid)
    assert np.median(err) < 0.5


def make_big_graph(n=3000, seed=0, dtype=jnp.float32, pos_noise=0.01,
                   rot_noise=0.0005):
    """Noisy 3D spiral with odometry chain + periodic loop closures —
    far beyond what the dense [E*6, N*6] Jacobian path can allocate."""
    rng = np.random.default_rng(seed)
    N = n
    gt = np.zeros((N, 7))
    th = 2 * np.pi * np.arange(n) / 200.0
    gt[:, 0] = 15 * np.cos(th)
    gt[:, 1] = 15 * np.sin(th)
    gt[:, 2] = 0.02 * np.arange(n)
    gt[:, 5] = np.sin(th / 2)
    gt[:, 6] = np.cos(th / 2)

    pairs = [(k, k + 1) for k in range(n - 1)]
    pairs += [(k, k + 200) for k in range(0, n - 200, 10)]  # revisits
    E = len(pairs)
    layout = PGOLayout(N=N, E=E, pose_dof=6)

    ii = np.array([p[0] for p in pairs], np.int32)
    jj = np.array([p[1] for p in pairs], np.int32)
    rel = np.zeros((E, 7))
    for m, (i, j) in enumerate(pairs):
        r = np.asarray(pose_compose(
            pose_inverse(jnp.asarray(gt[i])), jnp.asarray(gt[j])
        ))
        noise = np.concatenate(
            [rng.normal(0, pos_noise, 3), rng.normal(0, rot_noise, 3)]
        )
        rel[m] = np.asarray(pose_boxplus(jnp.asarray(r), jnp.asarray(noise)))
    edges = PGOEdges(
        i=jnp.asarray(ii), j=jnp.asarray(jj),
        rel=jnp.asarray(rel, dtype),
        sqrt_info=jnp.tile(jnp.eye(6, dtype=dtype) * 10.0, (E, 1, 1)),
        valid=jnp.ones((E,), bool),
    )
    valid = np.ones(N, bool)
    return layout, gt, valid, edges


def test_pcg_large_graph_exact():
    """Noise-free edges + perturbed init: the optimum IS ground truth,
    so this gates pure solver convergence at 3000 poses."""
    layout, gt, valid, edges = make_big_graph(
        n=3000, pos_noise=0.0, rot_noise=0.0
    )
    rng = np.random.default_rng(7)
    pert = np.concatenate(
        [rng.normal(0, 0.3, (layout.N, 3)), rng.normal(0, 0.02, (layout.N, 3))],
        axis=1,
    )
    pert[0] = 0  # gauge frame untouched
    init = np.stack([
        np.asarray(pose_boxplus(jnp.asarray(gt[k]), jnp.asarray(pert[k])))
        for k in range(layout.N)
    ])
    state = PGOState(
        poses=jnp.asarray(init, jnp.float32), valid=jnp.asarray(valid)
    )
    fixed = jnp.zeros(layout.N, bool).at[0].set(True)
    new_state, rep = solve_pgo_pcg(
        layout, state, edges, fixed, max_iters=8, cg_iters=100
    )
    err = _pos_err(new_state.poses, gt, valid)
    assert float(rep.final_cost) < 1e-4 * float(rep.initial_cost)
    # the residual is a smooth global mode (block-Jacobi PCG converges
    # low-frequency error slowly): ~5 cm across a 60 m structure here
    assert err.max() < 0.08, err.max()
    assert np.median(err) < 0.04


def test_pcg_large_graph_noisy():
    """With measurement noise the optimum sits a statistical floor away
    from gt; gate on cost reduction + drift improvement."""
    layout, gt, valid, edges = make_big_graph(n=3000)
    # integrate odometry-only to get a drifted initial guess
    init = np.asarray(gt).copy()
    cur = jnp.asarray(gt[0])
    rel_np = np.asarray(edges.rel)
    for k in range(layout.N - 1):
        cur = pose_compose(cur, jnp.asarray(rel_np[k], jnp.float64))
        init[k + 1] = np.asarray(cur)
    drift = _pos_err(init, gt, valid)

    state = PGOState(
        poses=jnp.asarray(init, jnp.float32), valid=jnp.asarray(valid)
    )
    fixed = jnp.zeros(layout.N, bool).at[0].set(True)
    new_state, rep = solve_pgo_pcg(
        layout, state, edges, fixed, max_iters=8, cg_iters=100
    )
    err = _pos_err(new_state.poses, gt, valid)
    assert float(rep.final_cost) < 0.05 * float(rep.initial_cost)
    assert err.max() < 0.6 * max(drift.max(), 1e-9), (err.max(), drift.max())
    assert np.median(err) < 0.7 * np.median(drift)


def test_chordal_pcg_matches_dense():
    import jax
    from d2slam_tpu.geometry.lie import (
        pose_boxminus,
        quat_normalize,
        so3_exp_quat,
    )
    from d2slam_tpu.pgo import (
        chordal_rotation_init,
        chordal_rotation_init_pcg,
    )
    from tests.test_pgo import make_loop_graph

    gt, valid, edges, n = make_loop_graph(rot_noise=0.005)
    rng = np.random.default_rng(1)
    bad = np.asarray(gt).copy()
    for k in range(1, n):
        bad[k, 3:] = np.asarray(
            so3_exp_quat(jnp.asarray(rng.normal(0, 1.5, 3)))
        )
    fixed = jnp.zeros(LAYOUT.N, bool).at[0].set(True)
    args = (
        jnp.asarray(bad, jnp.float64), valid, edges.i, edges.j,
        quat_normalize(edges.rel[:, 3:]), edges.valid, fixed,
    )
    dense = chordal_rotation_init(*args)
    pcg = chordal_rotation_init_pcg(*args, cg_iters=300, cg_rtol=1e-12)
    # both recover the graph's rotations; they agree with each other
    err_gt = np.asarray(jax.vmap(pose_boxminus)(pcg, gt))[:n]
    assert np.abs(err_gt[:, 3:]).max() < 0.08
    dq = np.asarray(jax.vmap(pose_boxminus)(pcg, dense))[:n]
    assert np.abs(dq[:, 3:]).max() < 1e-3, np.abs(dq[:, 3:]).max()


def test_chordal_pcg_large():
    """Drifted rotations (the warm-start contract: CG is a local
    correction; garbage input needs cg_iters > graph diameter and is
    covered by the small-graph parity test)."""
    import jax
    from d2slam_tpu.geometry.lie import (
        quat_mul,
        quat_normalize,
        so3_exp_quat,
    )
    from d2slam_tpu.pgo import chordal_rotation_init_pcg

    layout, gt, valid, edges = make_big_graph(n=3000)
    rng = np.random.default_rng(2)
    bad = np.asarray(gt).copy()
    dq = jax.vmap(so3_exp_quat)(
        jnp.asarray(rng.normal(0, 0.15, (layout.N - 1, 3)))
    )
    bad[1:, 3:] = np.asarray(
        jax.vmap(quat_mul)(jnp.asarray(gt[1:, 3:]), dq)
    )
    fixed = jnp.zeros(layout.N, bool).at[0].set(True)
    out = chordal_rotation_init_pcg(
        jnp.asarray(bad, jnp.float32), jnp.asarray(valid), edges.i, edges.j,
        quat_normalize(edges.rel[:, 3:]), edges.valid, fixed, cg_iters=200,
    )
    # per-pose rotation error vs gt via quaternion dot products
    q_out = np.asarray(out[:, 3:])
    q_gt = gt[:, 3:]
    dots = np.abs(np.sum(q_out * q_gt, axis=-1))
    ang = 2 * np.arccos(np.clip(dots, -1, 1))
    assert np.median(ang) < 0.02, np.median(ang)
    assert ang.max() < 0.1, ang.max()
