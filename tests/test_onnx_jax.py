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
