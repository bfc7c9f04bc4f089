"""Int8 post-training quantization of ONNX-bridged models."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from d2slam_tpu.tools.onnx_io import OnnxAttr, OnnxGraph, OnnxNode
from d2slam_tpu.tools.onnx_jax import load_onnx_module
from d2slam_tpu.tools.quantize import (
    calibrate_activations,
    fake_quant,
    load_calibration_table,
    quantization_report,
    quantize_array,
    quantize_module,
    save_calibration_table,
)

HITNET = "/root/reference/models/hitnet_series/hitnet_1x240x320_model_float32.onnx"


def _small_cnn():
    rng = np.random.RandomState(0)
    w1 = rng.randn(8, 1, 3, 3).astype(np.float32)
    b1 = rng.randn(8).astype(np.float32)
    w2 = rng.randn(4, 8, 3, 3).astype(np.float32) * 0.3
    wm = rng.randn(4 * 6 * 6, 10).astype(np.float32) * 0.1
    nodes = [
        OnnxNode("Conv", ["x", "w1", "b1"], ["c1"], attrs={
            "pads": OnnxAttr("pads", ints=(1, 1, 1, 1))}),
        OnnxNode("Relu", ["c1"], ["r1"]),
        OnnxNode("Conv", ["r1", "w2"], ["c2"], attrs={
            "pads": OnnxAttr("pads", ints=(1, 1, 1, 1))}),
        OnnxNode("Reshape", ["c2", "shape"], ["flat"]),
        OnnxNode("MatMul", ["flat", "wm"], ["y"]),
    ]
    g = OnnxGraph(
        nodes=nodes,
        initializers={"w1": w1, "b1": b1, "w2": w2, "wm": wm,
                      "shape": np.asarray([1, -1], np.int64)},
        inputs=[("x", (1, 1, 6, 6))], outputs=["y"],
    )
    return load_onnx_module(g)


def test_quantize_array_roundtrip():
    rng = np.random.RandomState(1)
    w = rng.randn(16, 3, 3, 3).astype(np.float32)
    q, s = quantize_array(w, axis=0)
    assert q.dtype == np.int8 and s.shape == (16, 1, 1, 1)
    np.testing.assert_allclose(q * s, w, atol=np.abs(w).max() / 127)
    # zero channel stays finite
    w[3] = 0
    q, s = quantize_array(w, axis=0)
    assert np.all(q[3] == 0) and np.isfinite(s).all()


def test_weight_only_quantization_accuracy():
    mod = _small_cnn()
    qmod = quantize_module(mod, min_size=32)
    assert set(qmod.quantized) == {"w1", "w2", "wm"}
    x = jnp.asarray(np.random.RandomState(2).randn(1, 1, 6, 6), jnp.float32)
    rep = quantization_report(mod, qmod, (x,))
    assert rep["compression"] > 3.0          # ~4x minus bias/scales
    assert rep["max_rel_err"] < 0.05         # int8 weight error is small
    assert rep["n_quantized"] == 3


def test_calibration_table_roundtrip(tmp_path):
    mod = _small_cnn()
    rng = np.random.RandomState(3)
    batches = [(jnp.asarray(rng.randn(1, 1, 6, 6), jnp.float32),)
               for _ in range(3)]
    table = calibrate_activations(mod, batches)
    # every conv output was observed, ranges positive
    assert "c1" in table and "y" in table
    assert all(v > 0 for v in table.values())
    p = str(tmp_path / "calib.json")
    save_calibration_table(table, p)
    assert load_calibration_table(p) == table
    # fake-quant with the calibrated range keeps values within 1 LSB
    x = batches[0][0]
    err = np.abs(np.asarray(fake_quant(x, table["x"]) - x)).max()
    assert err <= table["x"] / 127.0 + 1e-6


@pytest.mark.skipif(not os.path.exists(HITNET), reason="no trained HitNet")
def test_quantize_trained_hitnet():
    mod = load_onnx_module(HITNET)
    qmod = quantize_module(mod, min_size=128)
    assert qmod.bytes_after < 0.4 * qmod.bytes_before  # small net: many non-weight floats
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 2, 240, 320), jnp.float32)
    rep = quantization_report(mod, qmod, (x,))
    assert rep["max_rel_err"] < 0.25  # disparity net tolerates int8 weights
