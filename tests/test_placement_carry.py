"""CarryAccelFn carry threading + device-side prior permutation.

The fused VIO solve keeps the dense prior accelerator-resident
(CarryAccelFn) and applies window-shift slot permutations on device
(permute_prior_device). These tests pin:
  * carry semantics: threaded across calls, host get/set round-trips;
  * permute_prior_device == permute_prior_frames (the host reference)
    including -1 reset slots;
  * composing two shifts host-side equals applying them sequentially
    (the _apply_slot_map pending-perm algebra).
"""
import jax
import jax.numpy as jnp
import numpy as np

from d2slam_tpu.solver.layout import VIOLayout
from d2slam_tpu.solver.marginalization import (
    make_pose_prior,
    permute_prior_device,
    permute_prior_frames,
)
from d2slam_tpu.solver.state import VIOState
from d2slam_tpu.utils.placement import CarryAccelFn

LAYOUT = VIOLayout()


def _random_prior(seed=0):
    rng = np.random.default_rng(seed)
    st = VIOState.zeros(LAYOUT, jnp.float64)
    st = st._replace(
        poses=jnp.asarray(rng.normal(size=(LAYOUT.W, 7))),
        sb=jnp.asarray(rng.normal(size=(LAYOUT.W, 9))),
        frame_valid=jnp.asarray(rng.random(LAYOUT.W) > 0.3),
    )
    base = make_pose_prior(LAYOUT, st, frame=0)
    D = LAYOUT.D_pad
    return base._replace(
        J=jnp.asarray(rng.normal(size=(D, D))),
        r=jnp.asarray(rng.normal(size=(D,))),
        lin=st,
        row_valid=jnp.asarray(rng.random(D) > 0.5),
    )


def test_carry_threads_across_calls():
    def step(carry, x):
        new_carry = carry + x
        return new_carry, carry * 2.0

    f = CarryAccelFn(step)
    f.set_carry(np.ones((4,), np.float32))
    out1 = f(np.full((4,), 2.0, np.float32))
    np.testing.assert_allclose(np.asarray(out1), 2.0)   # 2*initial
    out2 = f(np.full((4,), 3.0, np.float32))
    np.testing.assert_allclose(np.asarray(out2), 6.0)   # 2*(1+2)
    np.testing.assert_allclose(f.get_carry(), 6.0)      # 1+2+3

    # host mutation round-trips
    f.set_carry(np.zeros((4,), np.float32))
    out3 = f(np.full((4,), 1.0, np.float32))
    np.testing.assert_allclose(np.asarray(out3), 0.0)
    np.testing.assert_allclose(f.get_carry(), 1.0)


def test_permute_prior_device_matches_host():
    prior = _random_prior()
    # window shift dropping slot 0 (the marginalize-oldest map)
    slot_map = list(range(1, LAYOUT.W)) + [-1]
    ref = permute_prior_frames(LAYOUT, prior, slot_map)
    dev = jax.jit(
        lambda p, m: permute_prior_device(LAYOUT, p, m)
    )(prior, jnp.asarray(slot_map, jnp.int32))
    np.testing.assert_allclose(np.asarray(dev.J), np.asarray(ref.J))
    np.testing.assert_allclose(np.asarray(dev.r), np.asarray(ref.r))
    np.testing.assert_allclose(
        np.asarray(dev.lin.poses), np.asarray(ref.lin.poses))
    np.testing.assert_allclose(
        np.asarray(dev.lin.sb), np.asarray(ref.lin.sb))
    np.testing.assert_array_equal(
        np.asarray(dev.lin.frame_valid), np.asarray(ref.lin.frame_valid))
    np.testing.assert_array_equal(
        np.asarray(dev.row_valid), np.asarray(ref.row_valid))


def test_permute_identity_is_noop():
    prior = _random_prior(1)
    ident = jnp.arange(LAYOUT.W, dtype=jnp.int32)
    out = permute_prior_device(LAYOUT, prior, ident)
    np.testing.assert_array_equal(np.asarray(out.J), np.asarray(prior.J))
    np.testing.assert_array_equal(
        np.asarray(out.lin.poses), np.asarray(prior.lin.poses))


def test_pending_perm_composition():
    """compose(b, a) applied once == a then b applied sequentially —
    the algebra _apply_slot_map uses to accumulate window shifts while
    the prior sits on device."""
    prior = _random_prior(2)
    a = np.array(list(range(1, LAYOUT.W)) + [-1], np.int32)
    b = np.array(list(range(1, LAYOUT.W)) + [-1], np.int32)
    seq = permute_prior_frames(
        LAYOUT, permute_prior_frames(LAYOUT, prior, a), b)
    composed = np.where(b >= 0, a[np.clip(b, 0, None)], -1).astype(np.int32)
    one = permute_prior_frames(LAYOUT, prior, composed)
    np.testing.assert_allclose(np.asarray(one.J), np.asarray(seq.J))
    np.testing.assert_allclose(
        np.asarray(one.lin.poses), np.asarray(seq.lin.poses))
    np.testing.assert_array_equal(
        np.asarray(one.lin.frame_valid),
        np.asarray(seq.lin.frame_valid))
