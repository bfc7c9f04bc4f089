"""Fixed-shape pytree containers for the sliding-window VIO problem.

All containers are NamedTuples of arrays with static shapes and validity
masks — the TPU-native replacement for the reference's pointer-keyed
state maps (reference: d2common/include/d2common/d2state.hpp,
d2vins/src/estimator/d2vinsstate.hpp). Host code maintains id<->slot
tables; device code only ever sees slots and masks.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from d2slam_tpu.imu.preintegration import PreintegrationResult
from d2slam_tpu.solver.layout import VIOLayout


class VIOState(NamedTuple):
    """Optimizable state of one robot's sliding window."""

    poses: jax.Array      # [W, 7] world_T_imu per keyframe slot
    sb: jax.Array         # [W, 9] [v(3), ba(3), bg(3)]
    ext: jax.Array        # [C, 7] imu_T_cam extrinsics
    td: jax.Array         # [] time offset (image vs IMU clock)
    inv_dep: jax.Array    # [L] inverse depth per landmark slot
    frame_valid: jax.Array  # [W] bool
    lm_valid: jax.Array     # [L] bool
    # world-position landmark states, used when landmark_param="pos3d"
    # (reference landmark_param option, d2vins_params.hpp:70-73:
    # inverse-depth scalar or 3-dof position)
    lm_pos: jax.Array = None  # [L, 3]

    @staticmethod
    def zeros(layout: VIOLayout, dtype=jnp.float32) -> "VIOState":
        q0 = jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1], dtype), (layout.W, 1))
        qe = jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1], dtype), (layout.C, 1))
        return VIOState(
            poses=q0,
            sb=jnp.zeros((layout.W, 9), dtype),
            ext=qe,
            td=jnp.zeros((), dtype),
            inv_dep=jnp.full((layout.L,), 0.2, dtype),
            frame_valid=jnp.zeros((layout.W,), bool),
            lm_valid=jnp.zeros((layout.L,), bool),
            lm_pos=jnp.zeros((layout.L, 3), dtype),
        )


class ImuMeas(NamedTuple):
    """Preintegrated IMU factors between window slots (padded to W-1)."""

    frame_i: jax.Array    # [K] int32 window slot of earlier frame
    frame_j: jax.Array    # [K] int32 window slot of later frame
    valid: jax.Array      # [K] bool
    pre: PreintegrationResult  # batched [K, ...]
    sqrt_info: jax.Array  # [K, 15, 15]


class ProjMeas(NamedTuple):
    """Visual landmark observations, padded to layout.M.

    A single unified record covers the reference's four projection
    factor kinds (TwoFrameOneCam / TwoFrameTwoCam / OneFrameTwoCam /
    TwoFrameOneCamDepth, reference d2vins/src/factors/): same-camera
    factors set cam_i == cam_j, same-frame (stereo) factors set
    frame_i == frame_j (the AD pose Jacobians then cancel on
    scatter-add), depth measurements set has_dep.
    """

    frame_i: jax.Array  # [M] int32 anchor frame slot
    frame_j: jax.Array  # [M] int32 observing frame slot
    cam_i: jax.Array    # [M] int32 anchor camera
    cam_j: jax.Array    # [M] int32 observing camera
    lm: jax.Array       # [M] int32 landmark slot (inverse depth column)
    ray_i: jax.Array    # [M, 3] unit ray in anchor camera
    ray_j: jax.Array    # [M, 3] unit ray in observing camera
    vel_i: jax.Array    # [M, 3] ray velocity (for td correction)
    vel_j: jax.Array    # [M, 3]
    td_i: jax.Array     # [M] per-measurement capture time offset
    td_j: jax.Array     # [M]
    dep_j: jax.Array    # [M] measured depth in frame j (0 if none)
    has_dep: jax.Array  # [M] bool
    valid: jax.Array    # [M] bool

    @staticmethod
    def empty(layout: VIOLayout, dtype=jnp.float32) -> "ProjMeas":
        M = layout.M
        z3 = jnp.zeros((M, 3), dtype)
        zi = jnp.zeros((M,), jnp.int32)
        z = jnp.zeros((M,), dtype)
        ray = jnp.tile(jnp.array([0.0, 0.0, 1.0], dtype), (M, 1))
        return ProjMeas(
            frame_i=zi, frame_j=zi, cam_i=zi, cam_j=zi, lm=zi,
            ray_i=ray, ray_j=ray, vel_i=z3, vel_j=z3,
            td_i=z, td_j=z, dep_j=z,
            has_dep=jnp.zeros((M,), bool), valid=jnp.zeros((M,), bool),
        )


class PriorBlock(NamedTuple):
    """Dense marginalization prior: residual = r + J @ (x [-] x_lin).

    J columns live in the solver layout (D_pad). The linearization
    point is a full VIOState snapshot; the boxminus is evaluated
    blockwise. col_valid masks columns that belong to still-existing
    params (reference PriorFactor with removeFrame semantics,
    d2vins/src/factors/prior_factor.cpp).
    """

    J: jax.Array        # [P, D_pad]
    r: jax.Array        # [P]
    lin: VIOState       # linearization point
    row_valid: jax.Array  # [P] bool

    @staticmethod
    def empty(layout: VIOLayout, P: int, dtype=jnp.float32) -> "PriorBlock":
        return PriorBlock(
            J=jnp.zeros((P, layout.D_pad), dtype),
            r=jnp.zeros((P,), dtype),
            lin=VIOState.zeros(layout, dtype),
            row_valid=jnp.zeros((P,), bool),
        )
