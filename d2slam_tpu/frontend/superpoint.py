"""SuperPoint keypoint detector + descriptor as pure-functional JAX.

TPU-native replacement for the reference's TensorRT SuperPoint engine
(reference: d2frontend/src/CNN/superpoint_tensorrt.cpp — engine build,
infer; d2frontend/src/CNN/superpoint_common.cpp:12-99 — threshold, NMS,
top-K, grid-sample descriptor sampling, PCA). Everything here is XLA:
the convs hit the MXU, NMS is a max-pool equality trick, descriptor
sampling is a batched bilinear gather, and the whole extraction
pipeline is one jitted function with static shapes.

Architecture (SuperPoint, DeTone et al. 2018): shared VGG encoder
conv(64)x2-pool-conv(64)x2-pool-conv(128)x2-pool-conv(128)x2, detector
head 3x3x256 -> 1x1x65 (8x8 cells + dustbin), descriptor head
3x3x256 -> 1x1x256 with bilinear upsample at keypoints.

Weights: ``load_params`` reads a .npz; ``convert_torch_state_dict``
maps the public magicleap checkpoint layout if available. Random init
otherwise (geometry/pipeline stay testable without weights).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SuperPointConfig:
    max_keypoints: int = 200
    nms_radius: int = 4
    threshold: float = 0.015
    pca_dim: int = 0  # 0 = no PCA; reference uses 64 (superpoint_pca_dims)
    desc_dim: int = 256
    # conv compute dtype: "bfloat16" matches the reference's fp16
    # TensorRT engines (superpoint_tensorrt.cpp builder flags) and is
    # ~3x faster on the MXU; scores/descriptors are cast back to f32
    # before NMS/normalization. "float32" for exact repeatability.
    compute_dtype: str = "float32"
    # top-k selection over the NMS'd score map: lax.approx_max_k on
    # TPU is an order of magnitude cheaper than the full sort that
    # lax.top_k lowers to (profiler: sort = 22% of extraction device
    # time) at recall_target=0.99 — measured recall 1.0 against exact
    # on trained weights. On CPU backends approx_max_k is exact, so
    # golden tests are unchanged.
    topk_approx: bool = True


_ENCODER = [
    ("conv1a", 1, 64), ("conv1b", 64, 64),
    ("conv2a", 64, 64), ("conv2b", 64, 64),
    ("conv3a", 64, 128), ("conv3b", 128, 128),
    ("conv4a", 128, 128), ("conv4b", 128, 128),
]


def superpoint_init(key, cfg: SuperPointConfig = SuperPointConfig(),
                    dtype=jnp.float32) -> Dict:
    """He-initialized parameter pytree."""
    params = {}
    keys = jax.random.split(key, len(_ENCODER) + 4)
    for i, (name, cin, cout) in enumerate(_ENCODER):
        params[name] = _conv_init(keys[i], 3, cin, cout, dtype)
    k = len(_ENCODER)
    params["convPa"] = _conv_init(keys[k], 3, 128, 256, dtype)
    params["convPb"] = _conv_init(keys[k + 1], 1, 256, 65, dtype)
    params["convDa"] = _conv_init(keys[k + 2], 3, 128, 256, dtype)
    params["convDb"] = _conv_init(keys[k + 3], 1, 256, cfg.desc_dim, dtype)
    if cfg.pca_dim:
        params["pca"] = {
            "proj": jnp.zeros((cfg.desc_dim, cfg.pca_dim), dtype)
            .at[: cfg.pca_dim, :].set(jnp.eye(cfg.pca_dim, dtype=dtype)),
            "mean": jnp.zeros((cfg.desc_dim,), dtype),
        }
    return params


def _conv_init(key, ksize, cin, cout, dtype):
    fan_in = ksize * ksize * cin
    w = jax.random.normal(key, (ksize, ksize, cin, cout), dtype) * jnp.sqrt(
        2.0 / fan_in
    )
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def _conv(x, p, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def superpoint_raw(params: Dict, img: jax.Array, compute_dtype=None):
    """img: [B, H, W, 1] in [0,1]. Returns the PRE-softmax head outputs
    (semi [B, Hc, Wc, 65], desc_norm [B, Hc, Wc, D]) — the training
    interface (cell cross-entropy needs logits)."""
    x = img
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        params = jax.tree_util.tree_map(
            lambda p: p.astype(compute_dtype), params
        )
    relu = jax.nn.relu
    x = relu(_conv(x, params["conv1a"]))
    x = relu(_conv(x, params["conv1b"]))
    x = _maxpool2(x)
    x = relu(_conv(x, params["conv2a"]))
    x = relu(_conv(x, params["conv2b"]))
    x = _maxpool2(x)
    x = relu(_conv(x, params["conv3a"]))
    x = relu(_conv(x, params["conv3b"]))
    x = _maxpool2(x)
    x = relu(_conv(x, params["conv4a"]))
    x = relu(_conv(x, params["conv4b"]))

    cPa = relu(_conv(x, params["convPa"]))
    semi = _conv(cPa, params["convPb"]).astype(jnp.float32)  # [B,Hc,Wc,65]

    cDa = relu(_conv(x, params["convDa"]))
    desc = _conv(cDa, params["convDb"]).astype(jnp.float32)  # [B,Hc,Wc,D]
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
    )
    return semi, desc


def superpoint_apply(params: Dict, img: jax.Array, compute_dtype=None):
    """img: [B, H, W, 1] in [0,1]. Returns (scores [B,H,W],
    desc_coarse [B,H/8,W/8,D]). compute_dtype (e.g. jnp.bfloat16) runs
    the conv stack at reduced precision (the fp16-TensorRT equivalent);
    outputs are float32 either way."""
    semi, desc = superpoint_raw(params, img, compute_dtype)
    dense = jax.nn.softmax(semi, axis=-1)[..., :64]  # drop dustbin
    B, Hc, Wc, _ = dense.shape
    # depth-to-space: cell scores -> full-resolution heatmap
    scores = dense.reshape(B, Hc, Wc, 8, 8)
    scores = scores.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)
    return scores, desc


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def simple_nms(scores, radius: int):
    """Keep local maxima within (2r+1)^2 windows (reference NMS2 grid
    suppression, superpoint_common.cpp:107-177, as a max-pool equality
    test — the XLA-friendly formulation). The 2-D max is SEPARABLE:
    two 1-D passes do 2(2r+1) compares/px instead of (2r+1)^2 — the
    square reduce_window was 12% of the quad extraction's device time
    (round-5 profile)."""
    k = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        scores, -jnp.inf, jax.lax.max, (1, k, 1), (1, 1, 1), "SAME"
    )
    pooled = jax.lax.reduce_window(
        pooled, -jnp.inf, jax.lax.max, (1, 1, k), (1, 1, 1), "SAME"
    )
    return jnp.where(scores == pooled, scores, 0.0)


def sample_descriptors(desc_coarse, kpts, img_hw):
    """Bilinear descriptor interpolation at keypoint pixel locations
    (reference computeDescriptors via libtorch grid_sampler,
    superpoint_common.cpp:42-99 — here an explicit batched gather).

    desc_coarse: [Hc, Wc, D]; kpts: [K, 2] (x, y) pixels; img_hw: (H, W).
    """
    H, W = img_hw
    Hc, Wc, D = desc_coarse.shape
    # map pixel coords to coarse-grid coords (cell centers at 8k+3.5)
    gx = (kpts[:, 0] - 3.5) / 8.0
    gy = (kpts[:, 1] - 3.5) / 8.0
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, Wc - 1)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, Hc - 1)
    x1 = jnp.clip(x0 + 1, 0, Wc - 1)
    y1 = jnp.clip(y0 + 1, 0, Hc - 1)
    wx = jnp.clip(gx - x0, 0.0, 1.0)[:, None]
    wy = jnp.clip(gy - y0, 0.0, 1.0)[:, None]
    d00 = desc_coarse[y0, x0]
    d01 = desc_coarse[y0, x1]
    d10 = desc_coarse[y1, x0]
    d11 = desc_coarse[y1, x1]
    d = (
        d00 * (1 - wx) * (1 - wy)
        + d01 * wx * (1 - wy)
        + d10 * (1 - wx) * wy
        + d11 * wx * wy
    )
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


class SuperPointOutput(NamedTuple):
    kpts: jax.Array    # [K, 2] (x, y) pixel coords
    scores: jax.Array  # [K]
    desc: jax.Array    # [K, D] L2-normalized (PCA'd if configured)
    valid: jax.Array   # [K] bool


def superpoint_extract(
    params: Dict, img: jax.Array, cfg: SuperPointConfig,
    apply_fn=None,
) -> SuperPointOutput:
    """Full extraction for ONE image [H, W] (jit/vmap over batches).

    Fixed output size cfg.max_keypoints with validity mask. `apply_fn`
    overrides the backbone (e.g. an ONNX-loaded one from
    `superpoint_from_onnx`); it must match `superpoint_apply`'s
    signature and contract.
    """
    H, W = img.shape
    if apply_fn is None:
        cdt = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None)
        apply_fn = lambda p, im: superpoint_apply(p, im, compute_dtype=cdt)
    raw_scores, desc_coarse = apply_fn(params, img[None, :, :, None])
    raw = raw_scores[0]
    scores_map = simple_nms(raw_scores, cfg.nms_radius)[0]  # [H, W]
    flat = scores_map.reshape(-1)
    K = cfg.max_keypoints
    if cfg.topk_approx:
        top_scores, top_idx = jax.lax.approx_max_k(
            flat, K, recall_target=0.99
        )
        top_idx = top_idx.astype(jnp.int32)
    else:
        top_scores, top_idx = jax.lax.top_k(flat, K)
    yi = (top_idx // W).astype(jnp.int32)
    xi = (top_idx % W).astype(jnp.int32)
    # parabolic subpixel refinement on the raw score map (integer
    # keypoints alias small stereo disparities; reference achieves the
    # same through its heatmap NMS + weighted localization)
    xi_c = jnp.clip(xi, 1, W - 2)
    yi_c = jnp.clip(yi, 1, H - 2)
    sc = raw[yi_c, xi_c]
    sxm, sxp = raw[yi_c, xi_c - 1], raw[yi_c, xi_c + 1]
    sym, syp = raw[yi_c - 1, xi_c], raw[yi_c + 1, xi_c]

    def _para(sm, s0, sp):
        denom = sm - 2 * s0 + sp  # negative at a maximum
        safe = jnp.where(jnp.abs(denom) < 1e-9, -1e-9, denom)
        return jnp.clip(0.5 * (sm - sp) / safe, -0.5, 0.5)

    dx = _para(sxm, sc, sxp)
    dy = _para(sym, sc, syp)
    kpts = jnp.stack(
        [xi.astype(jnp.float32) + dx, yi.astype(jnp.float32) + dy], axis=-1
    )
    valid = top_scores > cfg.threshold
    desc = sample_descriptors(desc_coarse[0], kpts, (H, W))
    if "pca" in params:
        p = params["pca"]
        desc = (desc - p["mean"]) @ p["proj"]
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
        )
    return SuperPointOutput(kpts=kpts, scores=top_scores, desc=desc, valid=valid)


# ---------------------------------------------------------------------------
# weight loading
# ---------------------------------------------------------------------------


def load_params(path: str, cfg: SuperPointConfig = SuperPointConfig()) -> Dict:
    """Load parameters from .npz (keys: <layer>_w, <layer>_b [, pca_*])."""
    raw = np.load(path)
    params = {}
    for name, _, _ in _ENCODER:
        params[name] = {"w": jnp.asarray(raw[f"{name}_w"]),
                        "b": jnp.asarray(raw[f"{name}_b"])}
    for name in ("convPa", "convPb", "convDa", "convDb"):
        params[name] = {"w": jnp.asarray(raw[f"{name}_w"]),
                        "b": jnp.asarray(raw[f"{name}_b"])}
    if "pca_proj" in raw:
        params["pca"] = {"proj": jnp.asarray(raw["pca_proj"]),
                         "mean": jnp.asarray(raw["pca_mean"])}
    return params


def convert_torch_state_dict(state: Dict) -> Dict:
    """Map the public magicleap SuperPoint checkpoint (OIHW torch convs)
    to our HWIO layout."""
    out = {}
    for name, _, _ in _ENCODER + [("convPa", 0, 0), ("convPb", 0, 0),
                                  ("convDa", 0, 0), ("convDb", 0, 0)]:
        w = np.asarray(state[f"{name}.weight"])  # [O, I, H, W]
        b = np.asarray(state[f"{name}.bias"])
        out[name] = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                     "b": jnp.asarray(b)}
    return out


def superpoint_from_onnx(path: str, dtype=jnp.float32):
    """Load a SuperPoint ONNX export and return (apply_fn, params)
    plugging into `superpoint_extract(..., apply_fn=...)`.

    Supports both export styles the reference consumes
    (d2frontend/src/CNN/superpoint_onnx.cpp:59 — outputs "semi", "desc"):
      - semi [1, H, W]: pixel-level heatmap already decoded in-graph;
      - semi [1, 65, Hc, Wc]: raw cell logits -> softmax + drop dustbin
        + depth-to-space here.
    desc [1, 256, Hc, Wc] is transposed to NHWC and L2-normalized
    (final per-keypoint renormalization happens in sample_descriptors,
    matching superpoint_common.cpp:42-99).
    """
    from d2slam_tpu.tools.onnx_jax import load_onnx_module

    module = load_onnx_module(path, dtype=dtype)

    def one(params, x_chw):  # [1, H, W] single image, NCHW batch of 1
        semi, desc = module.apply(params, x_chw[None])
        if semi.ndim == 4 and semi.shape[1] == 65:  # raw cell logits
            dense = jax.nn.softmax(semi, axis=1)[:, :64]
            B, _, Hc, Wc = dense.shape
            s = dense.reshape(B, 8, 8, Hc, Wc)
            s = s.transpose(0, 3, 1, 4, 2).reshape(B, Hc * 8, Wc * 8)
            scores = s[0]
        else:
            scores = semi.reshape(semi.shape[-2:])
        d = desc[0].transpose(1, 2, 0)  # [Hc, Wc, D]
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        return scores, d

    def apply_fn(params, img):  # img: [B, H, W, 1] in [0, 1]
        x = img[..., 0][:, None]  # [B, 1, H, W]
        scores, desc = jax.vmap(one, in_axes=(None, 0))(params, x)
        return scores, desc

    return apply_fn, module.params
