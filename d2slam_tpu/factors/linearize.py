"""Manifold-aware factor linearization via forward-mode AD.

Instead of hand-transcribed analytic Jacobians (the reference's
d2vins/src/factors/*.cpp), Jacobians are computed by differentiating the
residual **through the retraction at delta = 0**. This is mathematically
identical to the reference's tangent-space Jacobians composed with its
``PoseLocalParameterization`` and is exact (forward-mode AD, not finite
differences). XLA fuses the whole linearization into the GN assembly.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from d2slam_tpu.geometry.lie import pose_boxplus, pose4d_boxplus


def _euclidean_retract(x, d):
    return x + d


def _scalar_retract(x, d):
    # scalar params carried as shape-() or shape-(1,) arrays; tangent dim 1
    return x + d.reshape(x.shape) if hasattr(x, "shape") and x.shape else x + d[0]


RETRACT = {
    "pose": (pose_boxplus, 6),  # [7] pose, 6-dof tangent
    "pose4d": (pose4d_boxplus, 4),  # [7] pose, (x,y,z,yaw) tangent
    "vec": (_euclidean_retract, None),  # euclidean block, dim = len(x)
    "scalar": (_scalar_retract, 1),
}


def linearize_factor(
    res_fn: Callable,
    kinds: Sequence[str],
    params: Tuple,
    *args,
) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
    """Evaluate residual and tangent-space Jacobians of a factor.

    Args:
      res_fn: residual function ``res_fn(*params, *args) -> [R]``.
      kinds: retraction kind per parameter block ("pose", "pose4d",
        "vec", "scalar").
      params: tuple of parameter block arrays.
      *args: non-optimized measurement data forwarded to ``res_fn``.

    Returns:
      (residual [R], jacobians tuple — one [R, tangent_dim] per param).
    """
    dtype = jnp.result_type(*[p.dtype for p in params])
    retracts = []
    zeros = []
    for kind, p in zip(kinds, params):
        fn, dim = RETRACT[kind]
        if dim is None:
            dim = p.shape[-1]
        retracts.append(fn)
        zeros.append(jnp.zeros((dim,), dtype))

    def res_of_deltas(deltas):
        new_params = tuple(r(p, d) for r, p, d in zip(retracts, params, deltas))
        return res_fn(*new_params, *args)

    residual = res_fn(*params, *args)
    jacs = jax.jacfwd(res_of_deltas)(tuple(zeros))
    return residual, jacs
