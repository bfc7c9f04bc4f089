"""HitNet-style learned stereo disparity network (functional JAX).

TPU-native counterpart of the reference's HitNet TensorRT engines
(reference: quadcam_depth_est/include/hitnet.hpp, models in
models/hitnet_series at 320x240). Architecture follows HitNet's
shape: a shared multi-scale feature extractor (U-Net), coarse tile
hypothesis initialization from a matching cost over the disparity
range, and per-scale propagation/refinement blocks predicting tile
disparity updates. Weights load from .npz (converted from the public
checkpoints when available); random init keeps the pipeline testable.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HitNetConfig:
    max_disp: int = 64
    feat_ch: int = 16
    levels: int = 3


def _conv_init(key, k, cin, cout, dtype=jnp.float32):
    w = jax.random.normal(key, (k, k, cin, cout), dtype) * jnp.sqrt(
        2.0 / (k * k * cin)
    )
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def _conv(x, p, stride=1):
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]


def hitnet_init(key, cfg: HitNetConfig = HitNetConfig()) -> Dict:
    params = {}
    keys = jax.random.split(key, 3 * cfg.levels + 4)
    c = cfg.feat_ch
    ki = 0
    params["stem"] = _conv_init(keys[ki], 3, 1, c); ki += 1
    for l in range(cfg.levels):
        params[f"enc{l}"] = _conv_init(keys[ki], 3, c, c); ki += 1
        params[f"enc{l}b"] = _conv_init(keys[ki], 3, c, c); ki += 1
    for l in range(cfg.levels):
        params[f"ref{l}"] = _conv_init(keys[ki], 3, c + 1, c); ki += 1
    params["ref_out"] = _conv_init(keys[ki], 3, c, 1)
    return params


def _features(params, img, cfg):
    """Multi-scale features, finest first."""
    x = jax.nn.relu(_conv(img, params["stem"]))
    feats = []
    for l in range(cfg.levels):
        x = jax.nn.relu(_conv(x, params[f"enc{l}"], stride=2))
        x = jax.nn.relu(_conv(x, params[f"enc{l}b"]))
        feats.append(x)
    return feats


def _cost_volume_init(fl, fr, max_disp):
    """Coarse disparity by feature matching at the coarsest scale."""
    B, H, W, C = fl.shape

    def cost_at(d):
        shifted = jnp.roll(fr, d, axis=2)
        col = jnp.arange(W)
        c = jnp.mean(jnp.abs(fl - shifted), axis=-1)
        return jnp.where(col[None, None, :] >= d, c, 1e3)

    costs = jax.vmap(cost_at, out_axes=1)(jnp.arange(max_disp))  # [B,D,H,W]
    soft = jax.nn.softmax(-costs * 8.0, axis=1)
    d = jnp.sum(soft * jnp.arange(max_disp)[None, :, None, None], axis=1)
    return d[..., None]  # [B, H, W, 1]


def _upsample2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), "bilinear")


def hitnet_apply(params: Dict, left, right, cfg: HitNetConfig = HitNetConfig()):
    """left/right: [B, H, W, 1] rectified pair. Returns disparity
    [B, H, W] at full resolution."""
    fl = _features(params, left, cfg)
    fr = _features(params, right, cfg)
    scale = 2 ** cfg.levels
    d = _cost_volume_init(fl[-1], fr[-1], max(cfg.max_disp // scale, 4))
    # coarse-to-fine refinement
    for l in range(cfg.levels - 1, -1, -1):
        x = jnp.concatenate([fl[l], d], axis=-1)
        h = jax.nn.relu(_conv(x, params[f"ref{l}"]))
        delta = _conv(h, params["ref_out"])
        d = jax.nn.relu(d + delta)
        if l > 0:
            d = _upsample2(d) * 2.0
    d = _upsample2(d) * 2.0  # back to full resolution
    return d[..., 0]


def load_params(path: str) -> Dict:
    import numpy as np

    raw = np.load(path)
    out = {}
    names = {k.rsplit("_", 1)[0] for k in raw.files}
    for n in names:
        out[n] = {"w": jnp.asarray(raw[f"{n}_w"]),
                  "b": jnp.asarray(raw[f"{n}_b"])}
    return out


# ---------------------------------------------------------------------------
# Trained HitNet via the ONNX->JAX bridge
# ---------------------------------------------------------------------------

# The reference ships trained HitNet weights as ONNX
# (reference: models/hitnet_series/*, consumed by
# quadcam_depth_est/src/hitnet.cpp through TensorRT). We execute the
# same .onnx directly with XLA (tools/onnx_jax.py); validated to <0.1 px
# median error on synthetic rectified shifts (tests/test_onnx_jax.py).
REFERENCE_HITNET_F32 = (
    "/root/reference/models/hitnet_series/hitnet_1x240x320_model_float32.onnx"
)


def load_trained_hitnet(path: str = REFERENCE_HITNET_F32, dtype=jnp.float32):
    """Load a trained HitNet ONNX export. Returns (apply, params) where
    apply(params, left, right) maps rectified [H, W] pairs in [0, 1]
    (the reference feeds gray/255: quadcam_depth_est_trt.cpp:319-329)
    to disparity [H, W]. Input resolution must match the export
    (240x320 for the reference models); jit- and vmap-compatible.
    """
    from d2slam_tpu.tools.onnx_jax import load_onnx_module

    module = load_onnx_module(path, dtype=dtype)
    _, c, h, w = module.input_shapes[0]
    if c != 2:
        raise ValueError(f"expected 2-channel (left,right) input, got {c}")

    def apply(params, left, right):
        x = jnp.stack([left, right])[None].astype(dtype)  # [1, 2, H, W]
        y = module.apply(params, x)
        return y.reshape(y.shape[-3:-1] if y.shape[-1] == 1 else y.shape[-2:])

    apply.input_hw = (h, w)
    return apply, module.params
