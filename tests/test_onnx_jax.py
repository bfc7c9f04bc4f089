"""ONNX->JAX bridge tests.

Covers the pure-Python protobuf decoder (tools/onnx_io.py), the op
lowering (tools/onnx_jax.py), and — when the reference checkout with
its trained HitNet export is present — end-to-end disparity recovery
through the real 942-node graph.
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from d2slam_tpu.tools.onnx_io import OnnxAttr, OnnxGraph, OnnxNode
from d2slam_tpu.tools.onnx_jax import OnnxRunner

HITNET = "/root/reference/models/hitnet_series/hitnet_1x240x320_model_float32.onnx"


def _attr(name, **kw):
    return OnnxAttr(name=name, **kw)


def _run(graph, *inputs):
    r = OnnxRunner(graph)
    out = r(r.params, *inputs)
    return np.asarray(out)


def test_conv_matches_direct():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 16, 20).astype(np.float32)
    w = rng.randn(5, 3, 3, 3).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    g = OnnxGraph(
        nodes=[OnnxNode("Conv", ["x", "w", "b"], ["y"], attrs={
            "pads": _attr("pads", ints=(1, 1, 1, 1)),
            "strides": _attr("strides", ints=(2, 2)),
        })],
        initializers={"w": w, "b": b},
        inputs=[("x", x.shape)], outputs=["y"],
    )
    y = _run(g, jnp.asarray(x))
    # direct scipy-style check at one output position
    import jax
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    ) + b.reshape(1, -1, 1, 1)
    np.testing.assert_allclose(y, np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_conv_transpose_upsamples():
    # stride-2 transpose conv with an identity-ish kernel doubles size
    x = np.arange(12, dtype=np.float32).reshape(1, 1, 3, 4)
    w = np.zeros((1, 1, 2, 2), np.float32)
    w[0, 0] = 1.0
    g = OnnxGraph(
        nodes=[OnnxNode("ConvTranspose", ["x", "w"], ["y"], attrs={
            "strides": _attr("strides", ints=(2, 2)),
            "kernel_shape": _attr("kernel_shape", ints=(2, 2)),
        })],
        initializers={"w": w},
        inputs=[("x", x.shape)], outputs=["y"],
    )
    y = _run(g, jnp.asarray(x))
    assert y.shape == (1, 1, 6, 8)
    # each input pixel is replicated into a 2x2 block
    np.testing.assert_allclose(y[0, 0, :2, :2], x[0, 0, 0, 0])
    np.testing.assert_allclose(y[0, 0, 4:6, 6:8], x[0, 0, 2, 3])


def test_gather_nd_traced_indices():
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    idx = np.array([[0, 2], [1, 0]], np.int64)  # -> data[0,2], data[1,0]
    g = OnnxGraph(
        nodes=[OnnxNode("GatherND", ["d", "i"], ["y"])],
        initializers={},
        inputs=[("d", data.shape), ("i", idx.shape)], outputs=["y"],
    )
    r = OnnxRunner(g)
    y = np.asarray(r(r.params, jnp.asarray(data), jnp.asarray(idx)))
    np.testing.assert_allclose(y, np.stack([data[0, 2], data[1, 0]]))


def test_shape_slice_reshape_fold():
    # Shape -> Slice -> Concat -> Reshape chain folds statically
    x = np.zeros((2, 3, 4), np.float32)
    g = OnnxGraph(
        nodes=[
            OnnxNode("Shape", ["x"], ["s"]),
            OnnxNode("Slice", ["s", "st", "en"], ["s2"]),
            OnnxNode("Concat", ["s2", "minus1"], ["tgt"],
                     attrs={"axis": _attr("axis", i=0)}),
            OnnxNode("Reshape", ["x", "tgt"], ["y"]),
        ],
        initializers={
            "st": np.array([0], np.int64),
            "en": np.array([1], np.int64),
            "minus1": np.array([-1], np.int64),
        },
        inputs=[("x", x.shape)], outputs=["y"],
    )
    y = _run(g, jnp.asarray(x))
    assert y.shape == (2, 12)


def test_pool_and_pad():
    x = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)
    g = OnnxGraph(
        nodes=[
            OnnxNode("Pad", ["x", "p"], ["xp"]),
            OnnxNode("MaxPool", ["xp"], ["y"], attrs={
                "kernel_shape": _attr("kernel_shape", ints=(2, 2)),
                "strides": _attr("strides", ints=(2, 2)),
            }),
        ],
        initializers={"p": np.array([0, 0, 1, 1, 0, 0, 1, 1], np.int64)},
        inputs=[("x", x.shape)], outputs=["y"],
    )
    y = _run(g, jnp.asarray(x))
    assert y.shape == (1, 1, 3, 3)
    assert y[0, 0, 0, 0] == 0.0 and y[0, 0, 2, 2] == 15.0


def test_argmin_reduce():
    x = np.array([[3.0, 1.0, 2.0], [0.5, 4.0, 0.1]], np.float32)
    g = OnnxGraph(
        nodes=[
            OnnxNode("ArgMin", ["x"], ["a"], attrs={
                "axis": _attr("axis", i=1), "keepdims": _attr("keepdims", i=0),
            }),
            OnnxNode("ReduceSum", ["x"], ["s"], attrs={
                "axes": _attr("axes", ints=(1,)),
                "keepdims": _attr("keepdims", i=0),
            }),
        ],
        initializers={},
        inputs=[("x", x.shape)], outputs=["a", "s"],
    )
    r = OnnxRunner(g)
    a, s = r(r.params, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(a), [1, 2])
    np.testing.assert_allclose(np.asarray(s), x.sum(1), rtol=1e-6)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(HITNET), reason="reference HitNet onnx absent")
def test_trained_hitnet_recovers_disparity():
    from scipy import ndimage as ndi

    from d2slam_tpu.depth.hitnet import load_trained_hitnet

    apply, params = load_trained_hitnet(HITNET)
    assert apply.input_hw == (240, 320)
    rng = np.random.RandomState(0)
    tex = ndi.gaussian_filter(rng.rand(240, 400), 1.2)
    tex = (tex - tex.min()) / (np.ptp(tex) + 1e-9)
    d = 12
    left = jnp.asarray(tex[:, 32 : 32 + 320], jnp.float32)
    right = jnp.asarray(tex[:, 32 + d : 32 + d + 320], jnp.float32)
    disp = np.asarray(apply(params, left, right))
    inner = disp[20:-20, 40:-40]
    assert abs(np.median(inner) - d) < 0.5
    assert np.mean(np.abs(inner - d) < 1.0) > 0.9


HITNET_Q = HITNET.replace("float32", "float16_quant")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(HITNET_Q),
                    reason="reference quantized HitNet onnx absent")
def test_trained_hitnet_fp16_quant_matches_f32():
    """The reference's deployed engine variant (fp16-quantized export,
    models/hitnet_series/hitnet_1x240x320_model_float16_quant.onnx) runs
    through the same bridge and agrees with the float32 export."""
    from scipy import ndimage as ndi

    from d2slam_tpu.depth.hitnet import load_trained_hitnet

    a32, p32 = load_trained_hitnet(HITNET)
    a16, p16 = load_trained_hitnet(HITNET_Q)
    rng = np.random.RandomState(0)
    tex = ndi.gaussian_filter(rng.rand(240, 400), 1.2)
    left = jnp.asarray(tex[:, 32 : 32 + 320], jnp.float32)
    right = jnp.asarray(tex[:, 44 : 44 + 320], jnp.float32)
    d32 = np.asarray(a32(p32, left, right))
    d16 = np.asarray(a16(p16, left, right))
    diff = np.abs(d32 - d16)
    assert np.median(diff) < 0.01
    assert np.percentile(diff, 95) < 0.1


# ---------------------------------------------------------------------------
# round-trip encoder + frontend ONNX adapters (synthetic mini-models)
# ---------------------------------------------------------------------------


def _save_load(graph, tmp_path, name):
    from d2slam_tpu.tools.onnx_io import load_onnx, save_onnx

    p = str(tmp_path / name)
    save_onnx(graph, p)
    return load_onnx(p)


def test_encoder_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    w = rng.randn(4, 1, 3, 3).astype(np.float32)
    g = OnnxGraph(
        nodes=[OnnxNode("Conv", ["x", "w"], ["y"], attrs={
            "pads": _attr("pads", ints=(1, 1, 1, 1)),
            "alpha_demo": _attr("alpha_demo", f=0.5),
        })],
        initializers={"w": w, "shape_c": np.array([1, 4], np.int64)},
        inputs=[("x", (1, 1, 8, 8))], outputs=["y"],
    )
    g2 = _save_load(g, tmp_path, "rt.onnx")
    assert g2.nodes[0].op_type == "Conv"
    assert _run_attrs_equal(g, g2)
    np.testing.assert_array_equal(g2.initializers["w"], w)
    np.testing.assert_array_equal(g2.initializers["shape_c"], [1, 4])
    assert g2.inputs == [("x", (1, 1, 8, 8))]
    assert g2.outputs == ["y"]


def _run_attrs_equal(g, g2):
    a, b = g.nodes[0].attrs, g2.nodes[0].attrs
    return a["pads"].ints == b["pads"].ints and a["alpha_demo"].f == b["alpha_demo"].f


def _mini_superpoint_graph(style, H=64, W=64):
    """Tiny SuperPoint-shaped export: conv stem stride-8, then semi+desc
    heads, in either of the two export styles the adapter supports."""
    rng = np.random.RandomState(2)
    c = 8
    init = {
        "w1": rng.randn(c, 1, 3, 3).astype(np.float32) * 0.5,
        "b1": rng.randn(c).astype(np.float32) * 0.1,
        "wd": rng.randn(32, c, 1, 1).astype(np.float32) * 0.5,
    }
    nodes = [
        OnnxNode("Conv", ["x", "w1", "b1"], ["f"], attrs={
            "pads": _attr("pads", ints=(1, 1, 1, 1)),
            "strides": _attr("strides", ints=(8, 8)),
        }),
        OnnxNode("Relu", ["f"], ["fr"]),
        OnnxNode("Conv", ["fr", "wd"], ["desc"]),
    ]
    if style == "heatmap":
        init["ws"] = rng.randn(64, c, 1, 1).astype(np.float32) * 0.5
        nodes += [
            OnnxNode("Conv", ["fr", "ws"], ["cell"]),
            # in-graph depth-to-space decode -> [1, H, W] heatmap
            OnnxNode("Reshape", ["cell", "shp1"], ["r1"]),
            OnnxNode("Transpose", ["r1"], ["t1"],
                     attrs={"perm": _attr("perm", ints=(0, 3, 1, 4, 2))}),
            OnnxNode("Reshape", ["t1", "shp2"], ["semi"]),
            OnnxNode("Sigmoid", ["semi"], ["semi_out"]),
        ]
        init["shp1"] = np.array([1, 8, 8, H // 8, W // 8], np.int64)
        init["shp2"] = np.array([1, H, W], np.int64)
        outputs = ["semi_out", "desc"]
    else:  # raw 65-channel logits
        init["ws"] = rng.randn(65, c, 1, 1).astype(np.float32) * 0.5
        nodes += [OnnxNode("Conv", ["fr", "ws"], ["semi"])]
        outputs = ["semi", "desc"]
    return OnnxGraph(nodes=nodes, initializers=init,
                     inputs=[("x", (1, 1, H, W))], outputs=outputs)


@pytest.mark.parametrize("style", ["heatmap", "logits"])
def test_superpoint_from_onnx(tmp_path, style):
    from d2slam_tpu.frontend.superpoint import (
        SuperPointConfig, superpoint_extract, superpoint_from_onnx,
    )
    from d2slam_tpu.tools.onnx_io import save_onnx

    g = _mini_superpoint_graph(style)
    p = str(tmp_path / f"sp_{style}.onnx")
    save_onnx(g, p)
    apply_fn, params = superpoint_from_onnx(p)
    img = jnp.asarray(np.random.RandomState(3).rand(64, 64), jnp.float32)
    scores, desc = apply_fn(params, img[None, :, :, None])
    assert scores.shape == (1, 64, 64)
    assert desc.shape == (1, 8, 8, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(desc[0]), axis=-1), 1.0, atol=1e-4)
    cfg = SuperPointConfig(max_keypoints=16, threshold=-1.0)
    out = superpoint_extract(params, img, cfg, apply_fn=apply_fn)
    assert out.kpts.shape == (16, 2) and out.desc.shape[0] == 16
    assert bool(out.valid.any())


def test_netvlad_from_onnx(tmp_path):
    from d2slam_tpu.frontend.netvlad import netvlad_from_onnx
    from d2slam_tpu.tools.onnx_io import save_onnx

    rng = np.random.RandomState(4)
    H = W = 32
    # global-average pooled conv features -> flat descriptor, NHWC input
    g = OnnxGraph(
        nodes=[
            OnnxNode("Transpose", ["image:0"], ["xc"],
                     attrs={"perm": _attr("perm", ints=(0, 3, 1, 2))}),
            OnnxNode("Conv", ["xc", "w"], ["f"], attrs={
                "pads": _attr("pads", ints=(1, 1, 1, 1))}),
            OnnxNode("Relu", ["f"], ["fr"]),
            OnnxNode("GlobalAveragePool", ["fr"], ["gap"]),
            OnnxNode("Flatten", ["gap"], ["descriptor:0"]),
        ],
        initializers={"w": rng.randn(16, 1, 3, 3).astype(np.float32)},
        inputs=[("image:0", (1, H, W, 1))], outputs=["descriptor:0"],
    )
    p = str(tmp_path / "nv.onnx")
    save_onnx(g, p)
    # with PCA projection to 4 dims (reference mobilenetvlad_onnx.h:49-74)
    pca = (np.zeros(16, np.float32), rng.randn(16, 4).astype(np.float32))
    apply_fn, params = netvlad_from_onnx(p, pca=pca)
    img = jnp.asarray(rng.rand(2, H, W, 1), jnp.float32)
    v = apply_fn(params, img)
    assert v.shape == (2, 4)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(v), axis=-1), 1.0, atol=1e-5)


def test_topk_respects_axis():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    g = OnnxGraph(
        nodes=[OnnxNode("TopK", ["x", "k"], ["v", "i"],
                        attrs={"axis": _attr("axis", i=0)})],
        initializers={"k": np.array([2], np.int64)},
        inputs=[("x", x.shape)], outputs=["v", "i"],
    )
    r = OnnxRunner(g)
    v, i = r(r.params, jnp.asarray(x))
    assert v.shape == (2, 4) and i.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(i[0]), [2, 2, 2, 2])
    np.testing.assert_array_equal(np.asarray(v[0]), x[2])


def test_resize_asymmetric_nearest_and_linear():
    x = np.arange(4, dtype=np.float32).reshape(1, 1, 1, 4)

    def resize_graph(ctm, mode, nearest_mode=b"floor"):
        return OnnxGraph(
            nodes=[OnnxNode("Resize", ["x", "", "s"], ["y"], attrs={
                "mode": _attr("mode", s=mode),
                "coordinate_transformation_mode": _attr(
                    "coordinate_transformation_mode", s=ctm),
                "nearest_mode": _attr("nearest_mode", s=nearest_mode),
            })],
            initializers={"s": np.array([1, 1, 1, 2], np.float64)},
            inputs=[("x", x.shape)], outputs=["y"],
        )

    # asymmetric + floor nearest: out[i] = in[floor(i/2)] (tf2onnx style)
    y = _run(resize_graph(b"asymmetric", b"nearest"), jnp.asarray(x))
    np.testing.assert_array_equal(y[0, 0, 0], [0, 0, 1, 1, 2, 2, 3, 3])
    # align_corners linear: endpoints preserved exactly
    y = _run(resize_graph(b"align_corners", b"linear"), jnp.asarray(x))
    assert y[0, 0, 0, 0] == 0.0 and abs(y[0, 0, 0, -1] - 3.0) < 1e-6
    np.testing.assert_allclose(np.asarray(y[0, 0, 0]),
                               np.linspace(0, 3, 8), atol=1e-6)
    # half_pixel linear matches jax.image.resize
    import jax

    y = _run(resize_graph(b"half_pixel", b"linear"), jnp.asarray(x))
    ref = jax.image.resize(x, (1, 1, 1, 8), "bilinear")
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-6)


def test_int32_data_negative_and_fp16(tmp_path):
    """Typed (non-raw) tensor fields: negative int32 varints and fp16
    bit patterns in int32_data."""
    import struct

    from d2slam_tpu.tools.onnx_io import _decode_tensor

    def field(num, wire, payload):
        tag = (num << 3) | wire
        out = bytes([tag])
        if wire == 0:
            v = payload & ((1 << 64) - 1)
            b = b""
            while True:
                byte = v & 0x7F
                v >>= 7
                if v:
                    b += bytes([byte | 0x80])
                else:
                    b += bytes([byte])
                    break
            return out + b
        return out + bytes([len(payload)]) + payload

    # int32 tensor [-5, 7]
    buf = field(1, 0, 2)            # dims: 2
    buf = field(2, 0, 6) + buf[0:0] + buf  # data_type=6 (int32) + dims
    buf += field(5, 0, -5) + field(5, 0, 7)  # int32_data varints
    name, arr = _decode_tensor(buf)
    np.testing.assert_array_equal(arr, [-5, 7])
    assert arr.dtype == np.int32

    # fp16 tensor: bit pattern of 1.5 is 0x3E00
    buf = field(1, 0, 1) + field(2, 0, 10) + field(5, 0, 0x3E00)
    _, arr = _decode_tensor(buf)
    assert arr.dtype == np.float16 and float(arr.reshape(-1)[0]) == 1.5
