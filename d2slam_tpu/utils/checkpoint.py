"""Estimator checkpoint / resume.

The reference has no runtime persistence (SURVEY.md §5 — only output
artifacts). Pure pytree state makes real checkpointing trivial here:
the device state, prior, FEJ snapshots, window bookkeeping, and the
landmark DB serialize to one .npz."""
from __future__ import annotations

import io
import json
import pickle
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp


def save_estimator(path: str, est) -> None:
    from d2slam_tpu.solver.state import PriorBlock

    arrays: Dict[str, np.ndarray] = {}
    for name, val in est.state._asdict().items():
        arrays[f"state_{name}"] = np.asarray(val)
    if est.prior is not None:
        arrays["prior_J"] = np.asarray(est.prior.J)
        arrays["prior_r"] = np.asarray(est.prior.r)
        arrays["prior_row_valid"] = np.asarray(est.prior.row_valid)
        for name, val in est.prior.lin._asdict().items():
            arrays[f"prior_lin_{name}"] = np.asarray(val)
    arrays["fej_poses"] = est.fej_poses
    arrays["fej_sb"] = est.fej_sb
    meta = {
        "frames": [
            (f.frame_id, f.stamp, f.is_keyframe) for f in est.frames
        ],
        "initialized": est.initialized,
        "solve_count": est.solve_count,
        "margin_count": est.margin_count,
    }
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    arrays["landmarks_pickle"] = np.frombuffer(
        pickle.dumps(est.lmanager.db), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_estimator(path: str, est) -> None:
    """Restore state saved by :func:`save_estimator` into ``est``
    (must be constructed with the same config)."""
    from d2slam_tpu.solver.state import PriorBlock, VIOState
    from d2slam_tpu.vins.estimator import WindowFrame

    raw = np.load(path, allow_pickle=False)
    dtype = est.dtype
    state_kw = {}
    for name in est.state._fields:
        arr = raw[f"state_{name}"]
        state_kw[name] = jnp.asarray(
            arr, dtype if arr.dtype.kind == "f" else None
        )
    est.state = VIOState(**state_kw)
    if "prior_J" in raw:
        lin_kw = {}
        for name in est.state._fields:
            arr = raw[f"prior_lin_{name}"]
            lin_kw[name] = jnp.asarray(
                arr, dtype if arr.dtype.kind == "f" else None
            )
        est.prior = PriorBlock(
            J=jnp.asarray(raw["prior_J"], dtype),
            r=jnp.asarray(raw["prior_r"], dtype),
            lin=VIOState(**lin_kw),
            row_valid=jnp.asarray(raw["prior_row_valid"]),
        )
    est.fej_poses = raw["fej_poses"].copy()
    est.fej_sb = raw["fej_sb"].copy()
    meta = json.loads(bytes(raw["meta_json"]).decode())
    est.frames = [
        WindowFrame(fid, stamp, kf) for (fid, stamp, kf) in meta["frames"]
    ]
    est.initialized = meta["initialized"]
    est.solve_count = meta["solve_count"]
    est.margin_count = meta["margin_count"]
    est.lmanager.db = pickle.loads(bytes(raw["landmarks_pickle"]))
