"""Large-scale PGO benchmark: matrix-free PCG solver vs graph size.

The reference bounds each D2PGO update at 0.5 s for ONE approximate
ARock step (reference: README.md pgo_solver_time, d2pgo_node.cpp:196-206);
its single-robot path is sparse Ceres LM. Here a full 8-iteration LM
solve (relinearizing every iteration) with 100 PCG steps per iteration
runs on one TPU chip at graph sizes far beyond the sliding-window dense
path (`solve_pgo`), with O(E) memory.

    python examples/bench_pgo_scale.py --sizes 3000 10000 30000
    python examples/bench_pgo_scale.py --cpu --sizes 1000
"""
import argparse
import os
import sys
import time


def big_graph(n, seed=0, pos_noise=0.0, rot_noise=0.0):
    """Spiral trajectory, odometry chain + loop closures every 10 poses
    across revolutions (200-pose period). Construction is pure numpy so
    setup stays off the device."""
    import numpy as np
    import jax.numpy as jnp

    from d2slam_tpu.pgo import PGOEdges, PGOLayout
    from d2slam_tpu.utils import np_lie as npl

    rng = np.random.default_rng(seed)
    th = 2 * np.pi * np.arange(n) / 200.0
    gt = np.zeros((n, 7))
    gt[:, 0] = 15 * np.cos(th)
    gt[:, 1] = 15 * np.sin(th)
    gt[:, 2] = 0.02 * np.arange(n)
    gt[:, 5] = np.sin(th / 2)
    gt[:, 6] = np.cos(th / 2)

    ii = list(range(n - 1)) + list(range(0, n - 200, 10))
    jj = [k + 1 for k in range(n - 1)] + [k + 200 for k in range(0, n - 200, 10)]
    ii = np.array(ii, np.int32)
    jj = np.array(jj, np.int32)
    rel = np.stack([
        npl.pose_compose(npl.pose_inverse(gt[i]), gt[j])
        for i, j in zip(ii, jj)
    ])
    if pos_noise or rot_noise:
        rel[:, :3] += rng.normal(0, pos_noise, (len(ii), 3))
    E = len(ii)
    edges = PGOEdges(
        i=jnp.asarray(ii), j=jnp.asarray(jj),
        rel=jnp.asarray(rel, jnp.float32),
        sqrt_info=jnp.tile(jnp.eye(6, dtype=jnp.float32) * 10.0, (E, 1, 1)),
        valid=jnp.ones((E,), bool),
    )
    return PGOLayout(N=n, E=E, pose_dof=6), gt, edges


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[3000, 10000, 30000])
    ap.add_argument("--lm-iters", type=int, default=8)
    ap.add_argument("--cg-iters", type=int, default=100)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from d2slam_tpu.pgo import PGOState, solve_pgo_pcg

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(1)
    for n in args.sizes:
        layout, gt, edges = big_graph(n)
        init = gt.copy()
        init[:, :3] += rng.normal(0, 0.2, (n, 3))
        init[0] = gt[0]
        state = PGOState(
            poses=jnp.asarray(init, jnp.float32),
            valid=jnp.ones((n,), bool),
        )
        fixed = jnp.zeros(layout.N, bool).at[0].set(True)
        kw = dict(max_iters=args.lm_iters, cg_iters=args.cg_iters)

        o, rep = solve_pgo_pcg(layout, state, edges, fixed, **kw)
        float(rep.final_cost)  # force execution (compile + warmup)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            o, rep = solve_pgo_pcg(layout, state, edges, fixed, **kw)
        float(rep.final_cost)
        dt = (time.perf_counter() - t0) / args.reps
        err = np.linalg.norm(
            np.asarray(o.poses)[:, :3] - gt[:, :3], axis=-1
        )
        print(
            f"N={n:>6} E={layout.E:>6}: {dt * 1e3:8.1f} ms/solve "
            f"({args.lm_iters} LM x {args.cg_iters} CG), "
            f"err max {err.max() * 100:.1f} cm"
        )


if __name__ == "__main__":
    main()
