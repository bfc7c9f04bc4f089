"""MobileNetVLAD global descriptor as pure-functional JAX.

TPU-native replacement for the reference's MobileNetVLAD ONNX/TensorRT
inference (reference: d2frontend/include/d2frontend/CNN/
mobilenetvlad_onnx.h — 4096-d global descriptor, optional PCA to 1024
with renormalization). Backbone is a MobileNetV2-style depthwise-
separable stack truncated at stride 16; head is a NetVLAD layer
(soft-assignment to K clusters, residual aggregation, intra + global
L2 normalization).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NetVLADConfig:
    num_clusters: int = 64
    feat_dim: int = 64        # backbone output channels
    output_dim: int = 4096    # num_clusters * feat_dim
    pca_dim: int = 0          # reference: netvlad_pca_dims 1024
    width_mult: float = 1.0   # backbone channel multiplier (init only;
    #                           apply derives structure from the params)


_BACKBONE = [
    # (name, type, cin, cout, stride)
    ("stem", "conv", 1, 16, 2),
    ("ds1", "dsconv", 16, 32, 2),
    ("ds2", "dsconv", 32, 64, 2),
    ("ds3", "dsconv", 64, 64, 2),
    ("ds4", "dsconv", 64, 64, 1),
]


def _backbone_spec(cfg: NetVLADConfig):
    """Channel plan scaled by ``width_mult``; the final stage always
    lands on ``feat_dim`` (the VLAD descriptor dimension)."""
    m = cfg.width_mult

    def c(n):
        return max(8, int(round(n * m)))

    return [
        ("stem", "conv", 1, c(16), 2),
        ("ds1", "dsconv", c(16), c(32), 2),
        ("ds2", "dsconv", c(32), c(64), 2),
        ("ds3", "dsconv", c(64), cfg.feat_dim, 2),
        ("ds4", "dsconv", cfg.feat_dim, cfg.feat_dim, 1),
    ]


def netvlad_cfg_from_params(params: Dict) -> NetVLADConfig:
    """Infer the config from a loaded weight tree (cluster count and
    feature dim come from vlad_centers; pca_dim from the stored
    projection) — callers never hard-code descriptor dims."""
    K, D = np.asarray(params["vlad_centers"]).shape
    pca = params.get("pca")
    pca_dim = int(np.asarray(pca["proj"]).shape[-1]) if pca is not None else 0
    return NetVLADConfig(num_clusters=int(K), feat_dim=int(D),
                         output_dim=int(K * D), pca_dim=pca_dim)


def netvlad_output_dim(params: Dict) -> int:
    """Dimensionality of the descriptor netvlad_apply(params, .) emits."""
    cfg = netvlad_cfg_from_params(params)
    d = cfg.pca_dim or cfg.output_dim
    pca = params.get("pca")
    if pca is not None and "alpha" in pca:
        d += 1  # the gate-calibration constant component
    return d


def netvlad_init(key, cfg: NetVLADConfig = NetVLADConfig(),
                 dtype=jnp.float32) -> Dict:
    params = {}
    spec = _backbone_spec(cfg)
    keys = jax.random.split(key, len(spec) + 2)
    for i, (name, kind, cin, cout, _) in enumerate(spec):
        if kind == "conv":
            params[name] = _conv_init(keys[i], 3, cin, cout, dtype)
        else:
            k1, k2 = jax.random.split(keys[i])
            params[name] = {
                "dw": _conv_init(k1, 3, 1, cin, dtype, depthwise=True),
                "pw": _conv_init(k2, 1, cin, cout, dtype),
            }
    K, D = cfg.num_clusters, cfg.feat_dim
    params["vlad_assign"] = _conv_init(keys[-2], 1, D, K, dtype)
    params["vlad_centers"] = (
        jax.random.normal(keys[-1], (K, D), dtype) * 0.1
    )
    if cfg.pca_dim:
        params["pca"] = {
            "proj": jnp.zeros((cfg.output_dim, cfg.pca_dim), dtype)
            .at[: cfg.pca_dim, :].set(jnp.eye(cfg.pca_dim, dtype=dtype)),
            "mean": jnp.zeros((cfg.output_dim,), dtype),
        }
    return params


def _conv_init(key, ksize, cin, cout, dtype, depthwise=False):
    if depthwise:
        w = jax.random.normal(key, (ksize, ksize, 1, cout), dtype) * jnp.sqrt(
            2.0 / (ksize * ksize)
        )
    else:
        w = jax.random.normal(key, (ksize, ksize, cin, cout), dtype) * jnp.sqrt(
            2.0 / (ksize * ksize * cin)
        )
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def _conv(x, p, stride=1, groups=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y + p["b"]


def netvlad_apply(params: Dict, img: jax.Array,
                  cfg: NetVLADConfig = NetVLADConfig()):
    """img: [B, H, W, 1] -> [B, output_dim] (or pca_dim) L2-normalized."""
    x = img
    relu = jax.nn.relu6
    # structure comes from the PARAMS (any width_mult round-trips
    # through save/load without config bookkeeping); strides are fixed
    for name, stride in (("stem", 2), ("ds1", 2), ("ds2", 2),
                         ("ds3", 2), ("ds4", 1)):
        p = params[name]
        if "dw" in p:
            cin = p["dw"]["w"].shape[-1]
            x = relu(_conv(x, p["dw"], stride, groups=cin))
            x = relu(_conv(x, p["pw"], 1))
        else:
            x = relu(_conv(x, p, stride))

    B, H, W, D = x.shape
    feats = x.reshape(B, H * W, D)
    # soft assignment
    logits = _conv(x, params["vlad_assign"]).reshape(B, H * W, -1)
    assign = jax.nn.softmax(logits, axis=-1)  # [B, N, K]
    centers = params["vlad_centers"]  # [K, D]
    # V[b,k,:] = sum_n a[b,n,k] * (f[b,n,:] - c[k,:])
    agg = jnp.einsum("bnk,bnd->bkd", assign, feats)
    counts = jnp.sum(assign, axis=1)  # [B, K]
    V = agg - counts[..., None] * centers[None]
    # intra-normalization then global L2 (NetVLAD paper / reference)
    V = V / jnp.maximum(jnp.linalg.norm(V, axis=-1, keepdims=True), 1e-12)
    v = V.reshape(B, -1)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    if "pca" in params:
        p = params["pca"]
        v = (v - p["mean"]) @ p["proj"]
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        if "alpha" in p:
            # gate calibration (train_frontend.calibrate_netvlad_gate):
            # a constant unit-sphere component maps cosine similarity
            # affinely, s' = alpha^2 s + beta^2, so the embedding's
            # empirical operating point lands exactly on the
            # reference's fixed 0.8 retrieval threshold
            # (loop_detection_netvlad_thres). Wire format unchanged:
            # still a unit vector, dot-product similarity.
            B = v.shape[0]
            v = jnp.concatenate(
                [v * p["alpha"],
                 jnp.broadcast_to(p["beta"], (B, 1)).astype(v.dtype)],
                axis=-1,
            )
    return v


def netvlad_from_onnx(path: str, pca=None, dtype=jnp.float32):
    """Load a MobileNetVLAD ONNX export; returns (apply_fn, params) with
    the `netvlad_apply` contract (img [B, H, W, 1] -> [B, D] L2-normed).

    The reference feeds NHWC [1, H, W, 1] into tensor "image:0" and
    reads "descriptor:0" [1, 4096]
    (d2frontend/include/d2frontend/CNN/mobilenetvlad_onnx.h:20-32),
    optionally projecting to 1024-d with PCA + renormalization
    (mobilenetvlad_onnx.h:49-74). Pass pca=(mean [D], proj [D, d]) to
    reproduce that.
    """
    from d2slam_tpu.tools.onnx_jax import load_onnx_module

    module = load_onnx_module(path, dtype=dtype)
    rank = len(module.input_shapes[0])

    params = dict(module.params)
    if pca is not None:
        params["__pca_mean"] = jnp.asarray(pca[0], dtype)
        params["__pca_proj"] = jnp.asarray(pca[1], dtype)

    def one(params, x):  # x: [H, W, 1]
        inp = x[None] if rank == 4 else x[None, ..., 0]
        v = module.apply(params, inp)
        if isinstance(v, tuple):
            v = v[0]
        return v.reshape(-1)

    def apply_fn(params, img, cfg=None):
        v = jax.vmap(one, in_axes=(None, 0))(params, img)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        if "__pca_mean" in params:
            v = (v - params["__pca_mean"]) @ params["__pca_proj"]
            v = v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12
            )
        return v

    return apply_fn, params


def quantize_descriptor_int8(v):
    """int8 wire quantization: scale by max/127 (reference
    d2frontend_types.h:228-238 toLCM descriptor packing)."""
    scale = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0
    q = jnp.clip(jnp.round(v / jnp.maximum(scale, 1e-12)), -127, 127)
    return q.astype(jnp.int8), scale


def dequantize_descriptor_int8(q, scale):
    v = q.astype(scale.dtype) * scale
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
