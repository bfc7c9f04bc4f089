"""Multi-robot consensus-ADMM VIO over a virtual 4-device robot mesh."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from d2slam_tpu.geometry.lie import pose_boxminus, pose_boxplus
from d2slam_tpu.parallel.consensus import (
    ConsensusCarry,
    admm_vio_round,
    consensus_average,
    dual_update,
)
from d2slam_tpu.parallel.mesh import robot_mesh
from d2slam_tpu.solver import VIOLayout
from d2slam_tpu.solver.marginalization import make_pose_prior
from d2slam_tpu.utils.synthetic import default_col_free, make_circle_scene

LAYOUT = VIOLayout(W=6, C=2, L=64, M=512, N_IMU_SAMPLES=128)
PSI = 460.0 / 1.5
R = 4


def test_consensus_average_and_dual():
    mesh = robot_mesh(R)
    rng = np.random.default_rng(0)
    # each robot holds a perturbed copy of the same poses
    base = np.concatenate(
        [rng.normal(0, 1, (LAYOUT.W, 3)), np.tile([0, 0, 0, 1.0], (LAYOUT.W, 1))],
        axis=1,
    )
    copies = np.stack([base for _ in range(R)])
    perturb = rng.normal(0, 0.01, (R, LAYOUT.W, 6))
    copies = np.asarray(
        jax.vmap(jax.vmap(pose_boxplus))(jnp.asarray(copies), jnp.asarray(perturb))
    )
    est_mask = np.ones((R, LAYOUT.W), bool)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P("robot"), P("robot")),
        out_specs=P("robot"),
    )
    def avg(poses, mask):
        return consensus_average(poses[0], mask[0], "robot")[None]

    out = np.asarray(avg(jnp.asarray(copies), jnp.asarray(est_mask)))
    # all robots agree on the average
    np.testing.assert_allclose(out[0], out[1], atol=1e-12)
    np.testing.assert_allclose(out[0], out[3], atol=1e-12)
    # average is near the unperturbed base (first-order)
    d = np.asarray(
        jax.vmap(pose_boxminus)(jnp.asarray(out[0]), jnp.asarray(base))
    )
    assert np.abs(d).max() < 2e-2  # mean of 4 sigma=0.01 perturbations

    # dual update drives toward zero when local == global
    tilde = jnp.zeros((LAYOUT.W, 6))
    t2 = dual_update(jnp.asarray(out[0]), jnp.asarray(out[0]), tilde,
                     jnp.ones(LAYOUT.W, bool))
    np.testing.assert_allclose(np.asarray(t2), 0, atol=1e-12)


def test_admm_rounds_reach_agreement():
    mesh = robot_mesh(R)
    scene = make_circle_scene(LAYOUT, n_frames=6, n_landmarks=40, seed=4)
    gt = scene["gt_state"]
    g = scene["gravity"]
    prior = make_pose_prior(LAYOUT, gt, frame=0)
    col_free = default_col_free(LAYOUT, gt, fix_first_pose=False)

    # robots start from independently perturbed states
    rng = np.random.default_rng(3)
    states = []
    for r in range(R):
        dpose = np.zeros((LAYOUT.W, 6))
        dpose[1:] = rng.normal(0, 0.03, (LAYOUT.W - 1, 6))
        states.append(
            gt._replace(
                poses=jax.vmap(pose_boxplus)(gt.poses, jnp.asarray(dpose)),
                inv_dep=gt.inv_dep * jnp.asarray(1 + rng.normal(0, 0.05, LAYOUT.L)),
            )
        )
    batched_state = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    tilde0 = jnp.zeros((R, LAYOUT.W, 6))
    est_mask = jnp.ones((R, LAYOUT.W), bool)

    round_fn = functools.partial(
        admm_vio_round, LAYOUT,
        axis_name="robot", gravity=g, col_free=col_free,
        proj_sqrt_info=PSI, rho_T=1e4, rho_theta=1e4, max_iters=3,
    )

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("robot"), P("robot"), P("robot")),
        out_specs=P("robot"),
    )
    def one_round(state_b, tilde_b, mask_b):
        carry = ConsensusCarry(
            state=jax.tree_util.tree_map(lambda x: x[0], state_b),
            tilde=tilde_b[0],
        )
        new_carry, _ = round_fn(
            carry, scene["imu"], scene["proj"], prior, est_mask=mask_b[0]
        )
        return jax.tree_util.tree_map(
            lambda x: x[None], ConsensusCarry(new_carry.state, new_carry.tilde)
        )

    carry = ConsensusCarry(state=batched_state, tilde=tilde0)
    disagreements = []
    for _ in range(5):
        carry = one_round(carry.state, carry.tilde, est_mask)
        poses = np.asarray(carry.state.poses)  # [R, W, 7]
        dis = max(
            np.abs(
                np.asarray(
                    jax.vmap(pose_boxminus)(
                        jnp.asarray(poses[r]), jnp.asarray(poses[0])
                    )
                )
            ).max()
            for r in range(1, R)
        )
        disagreements.append(dis)

    # ADMM converges linearly: disagreement shrinks monotonically by
    # roughly 2x per round (observed ~0.5x/round on this problem)
    assert disagreements[-1] < 6e-3, f"disagreement {disagreements}"
    assert disagreements[-1] < 0.2 * disagreements[0]
    # and the consensus is near GT
    d0 = np.asarray(jax.vmap(pose_boxminus)(jnp.asarray(poses[0]), gt.poses))
    d0 = d0[np.asarray(gt.frame_valid)]
    assert np.abs(d0).max() < 5e-2, f"gt err {np.abs(d0).max()}"


def test_linearization_matches_eager_inside_shard_map():
    """Per-robot Jacobians built inside shard_map must equal the eager
    single-robot build.

    Regression test: with jax's varying-manifest-axes checking, a
    jacrev seed created as a fresh (replicated) constant makes the
    reverse-mode cotangent psum over the robot mesh — every robot's J
    silently becomes the SUM of all robots' Jacobians. vio_assembly
    derives its linearization points from the (device-varying) state to
    keep the adjoint per-robot; this pins that behavior.
    """
    from d2slam_tpu.solver.vio_assembly import build_imu_rows, build_proj_rows

    mesh = robot_mesh(R)
    scene = make_circle_scene(LAYOUT, n_frames=6, n_landmarks=40, seed=4)
    gt = scene["gt_state"]
    proj, imu, g = scene["proj"], scene["imu"], scene["gravity"]

    rng = np.random.default_rng(3)
    states = []
    for _ in range(R):
        dpose = np.zeros((LAYOUT.W, 6))
        dpose[1:] = rng.normal(0, 0.03, (LAYOUT.W - 1, 6))
        states.append(
            gt._replace(poses=jax.vmap(pose_boxplus)(gt.poses, jnp.asarray(dpose)))
        )
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

    def build(s):
        pb = build_proj_rows(LAYOUT, s, proj, PSI, 20.0, 1.0)
        ib = build_imu_rows(LAYOUT, s, imu, g)
        return pb.J, pb.Jl, ib.J

    eager = [jax.tree_util.tree_map(np.asarray, build(s)) for s in states]

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P("robot"),), out_specs=P("robot")
    )
    def sm_build(state_b):
        out = build(jax.tree_util.tree_map(lambda x: x[0], state_b))
        return jax.tree_util.tree_map(lambda x: x[None], out)

    out = sm_build(batched)
    for r in range(R):
        for got, want in zip(jax.tree_util.tree_map(lambda x: x[r], out), eager[r]):
            np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)
