"""SuperGlue-style attentional feature matcher in functional JAX.

TPU-native counterpart of the reference's optional learned matcher
(reference: d2frontend/src/CNN/superglue_onnx.cpp — ONNXRuntime
SuperGlue used for local/remote matching when
``enable_superglue_local/remote`` is set; noted "EXTREME SLOW but more
robust" on Jetson — on TPU the attention blocks are pure MXU work).

Architecture (Sarlin et al. 2020): keypoint MLP positional encoder,
alternating self-/cross-attention GNN layers over both keypoint sets,
final projection, and differentiable optimal transport (Sinkhorn) with
a learned dustbin. Weights load from .npz; random init keeps shapes
and the matching interface testable.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SuperGlueConfig:
    desc_dim: int = 256
    num_layers: int = 9          # self+cross pairs (reference uses 9)
    num_heads: int = 4
    sinkhorn_iters: int = 30
    match_threshold: float = 0.2


def _dense_init(key, cin, cout, dtype=jnp.float32):
    w = jax.random.normal(key, (cin, cout), dtype) * jnp.sqrt(2.0 / cin)
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def superglue_init(key, cfg: SuperGlueConfig = SuperGlueConfig(),
                   dtype=jnp.float32) -> Dict:
    D = cfg.desc_dim
    params: Dict = {}
    keys = jax.random.split(key, 4 + cfg.num_layers * 2 * 5)
    ki = 0
    # keypoint encoder: (x, y, score) -> D
    params["kenc1"] = _dense_init(keys[ki], 3, 64); ki += 1
    params["kenc2"] = _dense_init(keys[ki], 64, D); ki += 1
    for l in range(cfg.num_layers):
        for kind in ("self", "cross"):
            p = {}
            p["q"] = _dense_init(keys[ki], D, D); ki += 1
            p["k"] = _dense_init(keys[ki], D, D); ki += 1
            p["v"] = _dense_init(keys[ki], D, D); ki += 1
            p["mlp1"] = _dense_init(keys[ki], 2 * D, 2 * D); ki += 1
            p["mlp2"] = _dense_init(keys[ki], 2 * D, D); ki += 1
            params[f"{kind}{l}"] = p
    params["final"] = _dense_init(keys[ki], D, D)
    params["dustbin"] = jnp.ones((), dtype)
    return params


def _dense(x, p):
    return x @ p["w"] + p["b"]


def _attention(q_feats, kv_feats, p, num_heads, kv_mask):
    D = q_feats.shape[-1]
    H = num_heads
    dh = D // H

    def split(x):
        return x.reshape(x.shape[0], H, dh)

    q = split(_dense(q_feats, p["q"]))
    k = split(_dense(kv_feats, p["k"]))
    v = split(_dense(kv_feats, p["v"]))
    logits = jnp.einsum("nhd,mhd->hnm", q, k) / jnp.sqrt(dh)
    logits = jnp.where(kv_mask[None, None, :], logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1)
    msg = jnp.einsum("hnm,mhd->nhd", attn, v).reshape(-1, D)
    x = jnp.concatenate([q_feats, msg], axis=-1)
    return q_feats + _dense(jax.nn.relu(_dense(x, p["mlp1"])), p["mlp2"])


def _log_sinkhorn(scores, dustbin, iters):
    """Log-domain Sinkhorn with dustbin row/col (SuperGlue optimal
    transport head). scores: [N, M]."""
    N, M = scores.shape
    # augmented [N+1, M+1]
    aug = jnp.full((N + 1, M + 1), dustbin, scores.dtype)
    aug = aug.at[:N, :M].set(scores)
    log_mu = jnp.concatenate(
        [jnp.zeros(N), jnp.log(jnp.asarray(float(M)))[None]]
    )
    log_nu = jnp.concatenate(
        [jnp.zeros(M), jnp.log(jnp.asarray(float(N)))[None]]
    )
    u = jnp.zeros(N + 1)
    v = jnp.zeros(M + 1)

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.scipy.special.logsumexp(aug + v[None, :], axis=1)
        v = log_nu - jax.scipy.special.logsumexp(aug + u[:, None], axis=0)
        return u, v

    u, v = jax.lax.fori_loop(0, iters, body, (u, v))
    return aug + u[:, None] + v[None, :]


def superglue_logP(
    params: Dict,
    kpts_a, desc_a, scores_a, valid_a,
    kpts_b, desc_b, scores_b, valid_b,
    img_hw: Tuple[int, int],
    cfg: SuperGlueConfig = SuperGlueConfig(),
):
    """Full log-assignment matrix [(N+1), (M+1)] incl. dustbin row/col
    (the training loss needs it; superglue_match thresholds it)."""
    H, W = img_hw
    scale = jnp.asarray([W, H], desc_a.dtype)

    def encode(kpts, desc, scores):
        pos = jnp.concatenate(
            [(kpts / scale - 0.5), scores[:, None]], axis=-1
        )
        enc = _dense(jax.nn.relu(_dense(pos, params["kenc1"])),
                     params["kenc2"])
        return desc + enc

    xa = encode(kpts_a, desc_a, scores_a)
    xb = encode(kpts_b, desc_b, scores_b)
    for l in range(cfg.num_layers):
        pa = params[f"self{l}"]
        xa = _attention(xa, xa, pa, cfg.num_heads, valid_a)
        xb = _attention(xb, xb, pa, cfg.num_heads, valid_b)
        pc = params[f"cross{l}"]
        xa2 = _attention(xa, xb, pc, cfg.num_heads, valid_b)
        xb2 = _attention(xb, xa, pc, cfg.num_heads, valid_a)
        xa, xb = xa2, xb2
    fa = _dense(xa, params["final"])
    fb = _dense(xb, params["final"])
    sim = fa @ fb.T / jnp.sqrt(fa.shape[-1])
    sim = jnp.where(valid_a[:, None] & valid_b[None, :], sim, -1e9)
    return _log_sinkhorn(sim, params["dustbin"], cfg.sinkhorn_iters)


def superglue_match(
    params: Dict,
    kpts_a, desc_a, scores_a, valid_a,
    kpts_b, desc_b, scores_b, valid_b,
    img_hw: Tuple[int, int],
    cfg: SuperGlueConfig = SuperGlueConfig(),
):
    """Match two keypoint sets. Returns (idx_b [N] int32, ok [N] bool).

    kpts: [N, 2] pixels; desc: [N, D] L2-normalized; scores: [N].
    """
    P = superglue_logP(
        params, kpts_a, desc_a, scores_a, valid_a,
        kpts_b, desc_b, scores_b, valid_b, img_hw, cfg,
    )
    N = kpts_a.shape[0]
    M = kpts_b.shape[0]
    Pm = jnp.exp(P[:N, :M])
    idx = jnp.argmax(Pm, axis=1).astype(jnp.int32)
    pmax = jnp.max(Pm, axis=1)
    # mutual check
    back = jnp.argmax(Pm, axis=0)
    ok = (back[idx] == jnp.arange(N)) & (pmax > cfg.match_threshold) & valid_a
    return idx, ok


def load_params(path: str) -> Dict:
    import numpy as np

    raw = np.load(path)
    out: Dict = {}
    for k in raw.files:
        parts = k.rsplit("_", 1)
        if parts[-1] in ("w", "b"):
            out.setdefault(parts[0], {})[parts[-1]] = jnp.asarray(raw[k])
        else:
            out[k] = jnp.asarray(raw[k])
    return out


# ---------------------------------------------------------------------------
# matcher hooks (reference enable_superglue_local / enable_superglue_remote)
# ---------------------------------------------------------------------------


def make_tracker_matcher(params: Dict, img_hw: Tuple[int, int],
                         cfg: SuperGlueConfig = SuperGlueConfig()):
    """SuperGlue as the FeatureTracker's pluggable matcher
    (``matcher_fn``; reference enable_superglue_local routes
    matchLocalFeatures through SuperGlueOnnx::inference). Signature
    matches FeatureTracker._match: (desc_a, pts_a, valid_a, desc_b,
    pts_b, valid_b) -> (idx [Na] int32 into b, ok [Na] bool)."""

    def match(desc_a, pts_a, valid_a, desc_b, pts_b, valid_b):
        da = jnp.asarray(desc_a, jnp.float32)
        db = jnp.asarray(desc_b, jnp.float32)
        return superglue_match(
            params,
            jnp.asarray(pts_a, jnp.float32), da,
            jnp.ones(da.shape[0], jnp.float32), jnp.asarray(valid_a),
            jnp.asarray(pts_b, jnp.float32), db,
            jnp.ones(db.shape[0], jnp.float32), jnp.asarray(valid_b),
            img_hw, cfg,
        )

    return match


def make_loop_matcher(params: Dict,
                      cfg: SuperGlueConfig = SuperGlueConfig()):
    """SuperGlue as the LoopDetector's matcher (``matcher_fn``;
    reference enable_superglue_remote). Loop entries carry unit RAYS,
    not pixels; the positional encoding uses the ray xy components
    (already in [-1, 1])."""

    def match(desc_a, rays_a, valid_a, desc_b, rays_b, valid_b):
        da = jnp.asarray(desc_a, jnp.float32)
        db = jnp.asarray(desc_b, jnp.float32)
        # map ray xy from [-1, 1] to the [0, W]x[0, H] box the
        # positional encoder normalizes with
        pa = (jnp.asarray(rays_a, jnp.float32)[:, :2] + 1.0)
        pb = (jnp.asarray(rays_b, jnp.float32)[:, :2] + 1.0)
        return superglue_match(
            params,
            pa, da, jnp.ones(da.shape[0], jnp.float32),
            jnp.asarray(valid_a),
            pb, db, jnp.ones(db.shape[0], jnp.float32),
            jnp.asarray(valid_b),
            (2, 2), cfg,
        )

    return match
