"""Execute ONNX graphs with JAX/XLA — the TPU-native inference runtime.

Where the reference runs its learned models (SuperPoint, MobileNetVLAD,
SuperGlue, HitNet) through TensorRT engines or ONNXRuntime sessions
(reference: d2frontend/src/CNN/superpoint_tensorrt.cpp,
d2frontend/include/d2frontend/CNN/onnx_generic.h,
quadcam_depth_est/include/hitnet.hpp), this module loads the same .onnx
files and lowers them to a single jittable JAX function: XLA is the
"engine builder". Static shapes only (the reference also builds static
optimization profiles per resolution).

Design:
- initializers live in a params dict (jit arguments, device-resident);
- shape-carrying values (Shape outputs, index tensors) are folded on the
  host at trace time so the lowered HLO has static shapes everywhere;
- data-dependent ops (GatherND on disparity hypotheses, ArgMin, ...) are
  traced into the graph as regular jnp ops.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .onnx_io import OnnxGraph, OnnxNode, load_onnx

# Ops safe to constant-fold on host when every input is statically known.
_FOLDABLE = {
    "Shape", "Gather", "Slice", "Concat", "Unsqueeze", "Squeeze", "Cast",
    "Add", "Sub", "Mul", "Div", "ConstantOfShape", "Range", "Floor",
    "Ceil", "Expand", "Tile", "Transpose", "Reshape", "ReduceProd",
    "Min", "Max", "Identity", "Constant", "Where", "Equal", "Neg",
    "Split",
}

_MAX_FOLD_SIZE = 1 << 16


def _ints(v, default=None):
    if v is None:
        return default
    if isinstance(v, (int, np.integer)):
        return (int(v),)
    return tuple(int(x) for x in v)


def _conv_pads(node: OnnxNode, nsp: int, in_sp, k_sp, strides, dilations):
    """Resolve ONNX Conv/Pool padding attrs to lax [(lo, hi)] pairs."""
    auto = node.attr("auto_pad", b"NOTSET")
    auto = auto.decode() if isinstance(auto, bytes) else auto
    if auto in ("SAME_UPPER", "SAME_LOWER"):
        pads = []
        for i in range(nsp):
            out = -(-in_sp[i] // strides[i])
            eff_k = (k_sp[i] - 1) * dilations[i] + 1
            total = max(0, (out - 1) * strides[i] + eff_k - in_sp[i])
            lo = total // 2
            hi = total - lo
            pads.append((hi, lo) if auto == "SAME_LOWER" else (lo, hi))
        return pads
    if auto == "VALID":
        return [(0, 0)] * nsp
    p = _ints(node.attr("pads"), (0,) * (2 * nsp))
    return [(p[i], p[i + nsp]) for i in range(nsp)]


def _np_dtype(onnx_code: int):
    from .onnx_io import _DTYPES

    return _DTYPES[onnx_code]


class OnnxRunner:
    """Lowers an OnnxGraph to a jittable function of (params, *inputs)."""

    def __init__(self, graph: OnnxGraph, dtype=jnp.float32):
        self.graph = graph
        self.dtype = dtype
        self.params: Dict[str, jnp.ndarray] = {}
        self.const: Dict[str, np.ndarray] = {}
        for name, arr in graph.initializers.items():
            self.const[name] = np.asarray(arr)
            if arr.dtype in (np.float32, np.float16, np.float64):
                self.params[name] = jnp.asarray(
                    arr.astype(np.float32), dtype=dtype
                )

    # -- static lookup helpers ------------------------------------------
    def _static(self, env, name: str) -> np.ndarray:
        if name in self.const:
            return self.const[name]
        v = env.get(name)
        if isinstance(v, np.ndarray):
            return v
        raise ValueError(
            f"ONNX value '{name}' must be statically known (got traced)"
        )

    def _get(self, env, params, name: str):
        if name == "":
            return None
        if name in env:
            v = env[name]
            return jnp.asarray(v) if isinstance(v, np.ndarray) else v
        if name in params:
            return params[name]
        if name in self.const:
            c = self.const[name]
            if c.dtype in (np.float32, np.float16, np.float64):
                return jnp.asarray(c.astype(np.float32), dtype=self.dtype)
            return jnp.asarray(c)
        raise KeyError(f"ONNX value '{name}' not found")

    def _maybe_fold(self, env, node: OnnxNode) -> bool:
        if node.op_type not in _FOLDABLE:
            return False
        vals = []
        for name in node.inputs:
            if name == "":
                vals.append(None)
                continue
            if name in self.const:
                vals.append(self.const[name])
            elif isinstance(env.get(name), np.ndarray):
                vals.append(env[name])
            else:
                return False
        try:
            outs = self._fold_op(node, vals)
        except Exception:
            return False
        if any(o is None or o.size > _MAX_FOLD_SIZE for o in outs):
            return False
        for name, o in zip(node.outputs, outs):
            env[name] = np.asarray(o)
        return True

    # -- host constant folding ------------------------------------------
    def _fold_op(self, node: OnnxNode, vals) -> List[np.ndarray]:
        op = node.op_type
        x = vals[0] if vals else None
        if op == "Shape":
            return [np.asarray(x.shape, dtype=np.int64)]
        if op == "Constant":
            v = node.attr("value")
            return [np.asarray(v)]
        if op == "ConstantOfShape":
            v = node.attr("value")
            fill = np.asarray(v).reshape(-1)[0] if v is not None else np.float32(0)
            return [np.full(tuple(int(d) for d in x), fill)]
        if op == "Gather":
            axis = int(node.attr("axis", 0))
            return [np.take(x, vals[1].astype(np.int64), axis=axis)]
        if op == "Slice":
            return [self._slice_np(node, vals)]
        if op == "Concat":
            axis = int(node.attr("axis", 0))
            return [np.concatenate([v for v in vals], axis=axis)]
        if op == "Unsqueeze":
            axes = _ints(node.attr("axes")) or _ints(vals[1])
            y = x
            for a in sorted(axes):
                y = np.expand_dims(y, a)
            return [y]
        if op == "Squeeze":
            axes = _ints(node.attr("axes"))
            if axes is None and len(vals) > 1 and vals[1] is not None:
                axes = _ints(vals[1])
            return [np.squeeze(x, axis=tuple(axes) if axes else None)]
        if op == "Cast":
            return [x.astype(_np_dtype(int(node.attr("to"))))]
        if op == "Add":
            return [vals[0] + vals[1]]
        if op == "Sub":
            return [vals[0] - vals[1]]
        if op == "Mul":
            return [vals[0] * vals[1]]
        if op == "Div":
            y = vals[0] / vals[1]
            if np.issubdtype(vals[0].dtype, np.integer) and np.issubdtype(
                vals[1].dtype, np.integer
            ):
                y = (vals[0] // vals[1]).astype(vals[0].dtype)
            return [y]
        if op == "Range":
            return [np.arange(vals[0], vals[1], vals[2])]
        if op == "Floor":
            return [np.floor(x)]
        if op == "Ceil":
            return [np.ceil(x)]
        if op == "Expand":
            return [np.broadcast_to(x, _bidir_shape(x.shape, _ints(vals[1])))]
        if op == "Tile":
            return [np.tile(x, _ints(vals[1]))]
        if op == "Transpose":
            perm = _ints(node.attr("perm"), tuple(range(x.ndim))[::-1])
            return [np.transpose(x, perm)]
        if op == "Reshape":
            return [x.reshape(_reshape_dims(x, _ints(vals[1])))]
        if op == "ReduceProd":
            axes = _ints(node.attr("axes"))
            keep = bool(node.attr("keepdims", 1))
            return [np.prod(x, axis=axes, keepdims=keep)]
        if op == "Min":
            y = vals[0]
            for v in vals[1:]:
                y = np.minimum(y, v)
            return [y]
        if op == "Max":
            y = vals[0]
            for v in vals[1:]:
                y = np.maximum(y, v)
            return [y]
        if op == "Identity":
            return [x]
        if op == "Where":
            return [np.where(vals[0], vals[1], vals[2])]
        if op == "Equal":
            return [vals[0] == vals[1]]
        if op == "Neg":
            return [-x]
        if op == "Split":
            axis = int(node.attr("axis", 0))
            splits = _ints(node.attr("split"))
            if splits is None and len(vals) > 1 and vals[1] is not None:
                splits = _ints(vals[1])
            if splits is None:
                n = len(node.outputs)
                return list(np.split(x, n, axis=axis))
            idx = np.cumsum(splits)[:-1]
            return list(np.split(x, idx, axis=axis))
        raise NotImplementedError(op)

    def _slice_np(self, node: OnnxNode, vals):
        x = vals[0]
        if len(vals) > 1 and vals[1] is not None:  # opset >= 10
            starts = _ints(vals[1])
            ends = _ints(vals[2])
            axes = _ints(vals[3]) if len(vals) > 3 and vals[3] is not None else tuple(range(len(starts)))
            steps = _ints(vals[4]) if len(vals) > 4 and vals[4] is not None else (1,) * len(starts)
        else:  # opset 1
            starts = _ints(node.attr("starts"))
            ends = _ints(node.attr("ends"))
            axes = _ints(node.attr("axes"), tuple(range(len(starts))))
            steps = (1,) * len(starts)
        sl = [slice(None)] * x.ndim
        for s, e, a, st in zip(starts, ends, axes, steps):
            a = a % x.ndim
            sl[a] = slice(
                None if s == -(1 << 63) else s,
                None if e >= (1 << 62) or e == (1 << 63) - 1 else e,
                st,
            )
        return x[tuple(sl)]

    # -- traced execution ------------------------------------------------
    def __call__(self, params, *inputs, return_env: bool = False):
        """Run the graph. With return_env=True also returns the full
        name->value environment (every node output) — used by the
        quantization calibrator to observe activation ranges."""
        env: Dict[str, object] = {}
        for (name, _), x in zip(self.graph.inputs, inputs):
            env[name] = x
        for node in self.graph.nodes:
            if self._maybe_fold(env, node):
                continue
            self._exec_node(env, params, node)
        outs = [self._get(env, params, n) for n in self.graph.outputs]
        out = outs[0] if len(outs) == 1 else tuple(outs)
        return (out, env) if return_env else out

    def _exec_node(self, env, params, node: OnnxNode):
        op = node.op_type
        get = lambda i: self._get(env, params, node.inputs[i]) if i < len(node.inputs) else None
        static = lambda i: self._static(env, node.inputs[i])

        def put(*ys):
            for name, y in zip(node.outputs, ys):
                env[name] = y

        if op in ("Conv", "ConvTranspose"):
            put(self._conv(env, params, node, transpose=(op == "ConvTranspose")))
        elif op == "Relu":
            put(jax.nn.relu(get(0)))
        elif op == "LeakyRelu":
            put(jax.nn.leaky_relu(get(0), float(node.attr("alpha", 0.01))))
        elif op == "Elu":
            put(jax.nn.elu(get(0), float(node.attr("alpha", 1.0))))
        elif op == "PRelu":
            x, s = get(0), get(1)
            put(jnp.where(x >= 0, x, x * s))
        elif op == "Sigmoid":
            put(jax.nn.sigmoid(get(0)))
        elif op == "Tanh":
            put(jnp.tanh(get(0)))
        elif op == "Softplus":
            put(jax.nn.softplus(get(0)))
        elif op == "Erf":
            put(jax.lax.erf(get(0)))
        elif op == "Exp":
            put(jnp.exp(get(0)))
        elif op == "Log":
            put(jnp.log(get(0)))
        elif op == "Sqrt":
            put(jnp.sqrt(get(0)))
        elif op == "Abs":
            put(jnp.abs(get(0)))
        elif op == "Neg":
            put(-get(0))
        elif op == "Floor":
            put(jnp.floor(get(0)))
        elif op == "Ceil":
            put(jnp.ceil(get(0)))
        elif op == "Reciprocal":
            put(1.0 / get(0))
        elif op == "Softmax":
            axis = int(node.attr("axis", -1))
            put(jax.nn.softmax(get(0), axis=axis))
        elif op == "Add":
            put(get(0) + get(1))
        elif op == "Sub":
            put(get(0) - get(1))
        elif op == "Mul":
            put(get(0) * get(1))
        elif op == "Div":
            put(get(0) / get(1))
        elif op == "Pow":
            put(get(0) ** get(1))
        elif op in ("Min", "Max"):
            fn = jnp.minimum if op == "Min" else jnp.maximum
            y = get(0)
            for i in range(1, len(node.inputs)):
                y = fn(y, get(i))
            put(y)
        elif op == "Clip":
            lo = get(1) if len(node.inputs) > 1 and node.inputs[1] else node.attr("min")
            hi = get(2) if len(node.inputs) > 2 and node.inputs[2] else node.attr("max")
            put(jnp.clip(get(0), lo, hi))
        elif op == "Where":
            put(jnp.where(get(0), get(1), get(2)))
        elif op in ("Equal", "Greater", "Less", "GreaterOrEqual", "LessOrEqual"):
            fn = {"Equal": jnp.equal, "Greater": jnp.greater,
                  "Less": jnp.less, "GreaterOrEqual": jnp.greater_equal,
                  "LessOrEqual": jnp.less_equal}[op]
            put(fn(get(0), get(1)))
        elif op == "Not":
            put(jnp.logical_not(get(0)))
        elif op == "And":
            put(jnp.logical_and(get(0), get(1)))
        elif op == "Or":
            put(jnp.logical_or(get(0), get(1)))
        elif op == "Cast":
            put(get(0).astype(_np_dtype(int(node.attr("to")))))
        elif op in ("Identity", "Dropout"):
            put(get(0))
        elif op == "Concat":
            axis = int(node.attr("axis", 0))
            put(jnp.concatenate([get(i) for i in range(len(node.inputs))], axis=axis))
        elif op == "Reshape":
            shape = _reshape_dims_traced(get(0), _ints(static(1)))
            put(jnp.reshape(get(0), shape))
        elif op == "Flatten":
            axis = int(node.attr("axis", 1))
            x = get(0)
            lead = int(np.prod(x.shape[:axis])) if axis else 1
            put(jnp.reshape(x, (lead, -1)))
        elif op == "Transpose":
            x = get(0)
            perm = _ints(node.attr("perm"), tuple(range(x.ndim))[::-1])
            put(jnp.transpose(x, perm))
        elif op == "Unsqueeze":
            axes = _ints(node.attr("axes"))
            if axes is None:
                axes = _ints(static(1))
            y = get(0)
            for a in sorted(axes):
                y = jnp.expand_dims(y, a)
            put(y)
        elif op == "Squeeze":
            axes = _ints(node.attr("axes"))
            if axes is None and len(node.inputs) > 1:
                axes = _ints(static(1))
            put(jnp.squeeze(get(0), axis=tuple(axes) if axes else None))
        elif op == "Slice":
            put(self._slice_traced(env, params, node))
        elif op == "Split":
            axis = int(node.attr("axis", 0))
            splits = _ints(node.attr("split"))
            if splits is None and len(node.inputs) > 1:
                splits = _ints(static(1))
            x = get(0)
            if splits is None:
                put(*jnp.split(x, len(node.outputs), axis=axis))
            else:
                idx = np.cumsum(splits)[:-1].tolist()
                put(*jnp.split(x, idx, axis=axis))
        elif op == "Pad":
            put(self._pad(env, params, node))
        elif op == "Tile":
            put(jnp.tile(get(0), _ints(static(1))))
        elif op == "Expand":
            x = get(0)
            put(jnp.broadcast_to(x, _bidir_shape(x.shape, _ints(static(1)))))
        elif op == "Gather":
            axis = int(node.attr("axis", 0))
            put(jnp.take(get(0), get(1).astype(jnp.int32), axis=axis))
        elif op == "GatherElements":
            axis = int(node.attr("axis", 0))
            put(jnp.take_along_axis(get(0), get(1).astype(jnp.int32), axis=axis))
        elif op == "GatherND":
            put(self._gather_nd(get(0), get(1), int(node.attr("batch_dims", 0))))
        elif op == "ScatterND":
            data, idx, upd = get(0), get(1).astype(jnp.int32), get(2)
            put(data.at[tuple(jnp.moveaxis(idx, -1, 0))].set(upd))
        elif op in ("ReduceSum", "ReduceMean", "ReduceMax", "ReduceMin",
                    "ReduceProd", "ReduceL2"):
            x = get(0)
            axes = _ints(node.attr("axes"))
            if axes is None and len(node.inputs) > 1 and node.inputs[1]:
                axes = _ints(static(1))
            keep = bool(node.attr("keepdims", 1))
            axes = tuple(a % x.ndim for a in axes) if axes else None
            fn = {"ReduceSum": jnp.sum, "ReduceMean": jnp.mean,
                  "ReduceMax": jnp.max, "ReduceMin": jnp.min,
                  "ReduceProd": jnp.prod}.get(op)
            if op == "ReduceL2":
                put(jnp.sqrt(jnp.sum(x * x, axis=axes, keepdims=keep)))
            else:
                put(fn(x, axis=axes, keepdims=keep))
        elif op in ("ArgMin", "ArgMax"):
            x = get(0)
            axis = int(node.attr("axis", 0))
            keep = bool(node.attr("keepdims", 1))
            fn = jnp.argmin if op == "ArgMin" else jnp.argmax
            y = fn(x, axis=axis).astype(jnp.int64)
            if keep:
                y = jnp.expand_dims(y, axis)
            put(y)
        elif op == "MatMul":
            put(jnp.matmul(get(0), get(1), preferred_element_type=jnp.float32).astype(self.dtype))
        elif op == "Gemm":
            a, b = get(0), get(1)
            if int(node.attr("transA", 0)):
                a = a.T
            if int(node.attr("transB", 0)):
                b = b.T
            y = jnp.matmul(a, b, preferred_element_type=jnp.float32).astype(self.dtype)
            y = y * float(node.attr("alpha", 1.0))
            if len(node.inputs) > 2 and node.inputs[2]:
                y = y + float(node.attr("beta", 1.0)) * get(2)
            put(y)
        elif op == "BatchNormalization":
            x, s, b, m, v = get(0), get(1), get(2), get(3), get(4)
            eps = float(node.attr("epsilon", 1e-5))
            shape = (1, -1) + (1,) * (x.ndim - 2)
            put((x - m.reshape(shape)) * (s.reshape(shape) *
                jax.lax.rsqrt(v.reshape(shape) + eps)) + b.reshape(shape))
        elif op == "InstanceNormalization":
            x, s, b = get(0), get(1), get(2)
            eps = float(node.attr("epsilon", 1e-5))
            ax = tuple(range(2, x.ndim))
            m = jnp.mean(x, axis=ax, keepdims=True)
            v = jnp.var(x, axis=ax, keepdims=True)
            shape = (1, -1) + (1,) * (x.ndim - 2)
            put((x - m) * jax.lax.rsqrt(v + eps) * s.reshape(shape) + b.reshape(shape))
        elif op in ("MaxPool", "AveragePool"):
            put(self._pool(env, node, get(0), op))
        elif op == "GlobalAveragePool":
            x = get(0)
            put(jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True))
        elif op == "GlobalMaxPool":
            x = get(0)
            put(jnp.max(x, axis=tuple(range(2, x.ndim)), keepdims=True))
        elif op in ("Resize", "Upsample"):
            put(self._resize(env, params, node))
        elif op == "Shape":
            env[node.outputs[0]] = np.asarray(get(0).shape, dtype=np.int64)
        elif op == "ConstantOfShape":
            v = node.attr("value")
            fill = np.asarray(v).reshape(-1)[0] if v is not None else np.float32(0)
            shape = tuple(int(d) for d in static(0))
            env[node.outputs[0]] = np.full(shape, fill)
        elif op == "Constant":
            env[node.outputs[0]] = np.asarray(node.attr("value"))
        elif op == "Einsum":
            eq = node.attr("equation").decode()
            put(jnp.einsum(eq, *[get(i) for i in range(len(node.inputs))]))
        elif op == "TopK":
            x = get(0)
            k = int(np.asarray(static(1)).reshape(-1)[0])
            largest = bool(node.attr("largest", 1))
            axis = int(node.attr("axis", -1)) % x.ndim
            xm = jnp.moveaxis(x, axis, -1)
            vals, idx = jax.lax.top_k(xm if largest else -xm, k)
            vals = jnp.moveaxis(vals if largest else -vals, -1, axis)
            idx = jnp.moveaxis(idx.astype(jnp.int64), -1, axis)
            put(vals, idx)
        else:
            raise NotImplementedError(f"ONNX op {op} (node {node.name})")

    def _conv(self, env, params, node, transpose: bool):
        x = self._get(env, params, node.inputs[0])
        w = self._get(env, params, node.inputs[1])
        b = self._get(env, params, node.inputs[2]) if len(node.inputs) > 2 and node.inputs[2] else None
        nsp = x.ndim - 2
        strides = _ints(node.attr("strides"), (1,) * nsp)
        dilations = _ints(node.attr("dilations"), (1,) * nsp)
        group = int(node.attr("group", 1))
        k_sp = w.shape[2:]
        if not transpose:
            pads = _conv_pads(node, nsp, x.shape[2:], k_sp, strides, dilations)
            y = jax.lax.conv_general_dilated(
                x, w, strides, pads, lhs_dilation=None,
                rhs_dilation=dilations, feature_group_count=group,
                dimension_numbers=_conv_dn(nsp),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
        else:
            # ConvTranspose: weight layout is (Cin, Cout/group, *k)
            out_pad = _ints(node.attr("output_padding"), (0,) * nsp)
            p = _ints(node.attr("pads"), (0,) * (2 * nsp))
            pads = []
            for i in range(nsp):
                eff_k = (k_sp[i] - 1) * dilations[i] + 1
                lo = eff_k - 1 - p[i]
                hi = eff_k - 1 - p[i + nsp] + out_pad[i]
                pads.append((lo, hi))
            # flip spatial dims + swap I/O to express as fractionally
            # strided conv
            w_fl = jnp.flip(w, axis=tuple(range(2, w.ndim)))
            if group == 1:
                w_fl = jnp.swapaxes(w_fl, 0, 1)  # -> (Cout, Cin, *k)
            else:
                cin, cog = w.shape[0], w.shape[1]
                w_g = w_fl.reshape((group, cin // group, cog) + k_sp)
                w_g = jnp.swapaxes(w_g, 1, 2)
                w_fl = w_g.reshape((group * cog, cin // group) + k_sp)
            y = jax.lax.conv_general_dilated(
                x, w_fl, (1,) * nsp, pads, lhs_dilation=strides,
                rhs_dilation=dilations, feature_group_count=group,
                dimension_numbers=_conv_dn(nsp),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
        if b is not None:
            y = y + b.reshape((1, -1) + (1,) * nsp)
        return y

    def _slice_traced(self, env, params, node):
        x = self._get(env, params, node.inputs[0])
        if len(node.inputs) > 1 and node.inputs[1]:  # opset >= 10
            starts = _ints(self._static(env, node.inputs[1]))
            ends = _ints(self._static(env, node.inputs[2]))
            axes = (
                _ints(self._static(env, node.inputs[3]))
                if len(node.inputs) > 3 and node.inputs[3]
                else tuple(range(len(starts)))
            )
            steps = (
                _ints(self._static(env, node.inputs[4]))
                if len(node.inputs) > 4 and node.inputs[4]
                else (1,) * len(starts)
            )
        else:
            starts = _ints(node.attr("starts"))
            ends = _ints(node.attr("ends"))
            axes = _ints(node.attr("axes"), tuple(range(len(starts))))
            steps = (1,) * len(starts)
        sl = [slice(None)] * x.ndim
        for s, e, a, st in zip(starts, ends, axes, steps):
            a = a % x.ndim
            sl[a] = slice(
                None if s == -(1 << 63) else s,
                None if e >= (1 << 62) or e == (1 << 63) - 1 else e,
                st,
            )
        return x[tuple(sl)]

    def _pool(self, env, node, x, op):
        nsp = x.ndim - 2
        k = _ints(node.attr("kernel_shape"))
        strides = _ints(node.attr("strides"), (1,) * nsp)
        pads = _conv_pads(node, nsp, x.shape[2:], k, strides, (1,) * nsp)
        window = (1, 1) + k
        ws = (1, 1) + strides
        pad = ((0, 0), (0, 0)) + tuple(pads)
        if op == "MaxPool":
            y = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, window, ws, pad
            )
        else:
            cip = bool(node.attr("count_include_pad", 0))
            s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, ws, pad)
            if cip:
                y = s / float(np.prod(k))
            else:
                ones = jnp.ones(x.shape, x.dtype)
                cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, ws, pad)
                y = s / cnt
        return y

    def _pad(self, env, params, node):
        x = self._get(env, params, node.inputs[0])
        mode = node.attr("mode", b"constant")
        mode = mode.decode() if isinstance(mode, bytes) else mode
        if len(node.inputs) > 1 and node.inputs[1]:
            p = _ints(self._static(env, node.inputs[1]))
        else:
            p = _ints(node.attr("pads"))
        n = x.ndim
        pairs = [(p[i], p[i + n]) for i in range(n)]
        if mode == "constant":
            cval = 0.0
            if len(node.inputs) > 2 and node.inputs[2]:
                cval = float(np.asarray(self._static(env, node.inputs[2])).reshape(-1)[0])
            return jnp.pad(x, pairs, constant_values=cval)
        jmode = {"reflect": "reflect", "edge": "edge"}[mode]
        return jnp.pad(x, pairs, mode=jmode)

    def _resize(self, env, params, node):
        x = self._get(env, params, node.inputs[0])
        mode = node.attr("mode", b"nearest")
        mode = mode.decode() if isinstance(mode, bytes) else mode
        ctm = node.attr("coordinate_transformation_mode", b"half_pixel")
        ctm = ctm.decode() if isinstance(ctm, bytes) else ctm
        nmode = node.attr("nearest_mode", b"round_prefer_floor")
        nmode = nmode.decode() if isinstance(nmode, bytes) else nmode
        if node.op_type == "Upsample":
            ctm = "asymmetric"  # opset-9 Upsample semantics
        out_shape = None
        if node.op_type == "Upsample" or (len(node.inputs) >= 3 and node.inputs[2]):
            sc_name = node.inputs[1 if node.op_type == "Upsample" else 2]
            scales = np.asarray(self._static(env, sc_name), dtype=np.float64)
            if scales.size:
                out_shape = tuple(
                    int(round(s * d)) for s, d in zip(scales, x.shape)
                )
        if out_shape is None and len(node.inputs) >= 4 and node.inputs[3]:
            out_shape = tuple(int(d) for d in self._static(env, node.inputs[3]))
        if mode == "cubic":
            if ctm != "half_pixel":
                raise NotImplementedError(f"cubic Resize with {ctm}")
            return jax.image.resize(x, out_shape, "bicubic")
        y = x
        for axis, (n_in, n_out) in enumerate(zip(x.shape, out_shape)):
            if n_in != n_out:
                y = _resize_axis(y, axis, n_out, mode, ctm, nmode)
        return y

    @staticmethod
    def _gather_nd(data, indices, batch_dims: int):
        idx = indices.astype(jnp.int32)
        if batch_dims == 0:
            comps = tuple(jnp.moveaxis(idx, -1, 0))
            return data[comps]
        # flatten batch dims, vmap the gather
        bshape = data.shape[:batch_dims]
        d2 = data.reshape((-1,) + data.shape[batch_dims:])
        i2 = idx.reshape((d2.shape[0],) + idx.shape[batch_dims:])

        def one(d, i):
            return d[tuple(jnp.moveaxis(i, -1, 0))]

        out = jax.vmap(one)(d2, i2)
        return out.reshape(bshape + out.shape[1:])


def _resize_axis(x, axis: int, n_out: int, mode: str, ctm: str,
                 nearest_mode: str):
    """Resample one axis with explicit ONNX coordinate semantics
    (jax.image.resize only implements half_pixel)."""
    n_in = x.shape[axis]
    out_idx = np.arange(n_out, dtype=np.float64)
    scale = n_out / n_in
    if ctm in ("half_pixel", "pytorch_half_pixel"):
        src = (out_idx + 0.5) / scale - 0.5
        if ctm == "pytorch_half_pixel" and n_out <= 1:
            src = np.zeros_like(out_idx)
    elif ctm == "asymmetric":
        src = out_idx / scale
    elif ctm == "align_corners":
        src = out_idx * ((n_in - 1) / max(n_out - 1, 1))
    else:
        raise NotImplementedError(f"Resize coordinate mode {ctm}")
    if mode == "nearest":
        if nearest_mode == "floor":
            idx = np.floor(src)
        elif nearest_mode == "ceil":
            idx = np.ceil(src)
        elif nearest_mode == "round_prefer_ceil":
            idx = np.floor(src + 0.5)
        else:  # round_prefer_floor
            idx = np.ceil(src - 0.5)
        idx = np.clip(idx, 0, n_in - 1).astype(np.int32)
        return jnp.take(x, jnp.asarray(idx), axis=axis)
    # linear: gather the two neighbors and blend (static weights)
    src = np.clip(src, 0.0, n_in - 1)
    i0 = np.clip(np.floor(src), 0, n_in - 1).astype(np.int32)
    i1 = np.clip(i0 + 1, 0, n_in - 1)
    w = jnp.asarray((src - i0), x.dtype)
    shape = [1] * x.ndim
    shape[axis] = n_out
    w = w.reshape(shape)
    x0 = jnp.take(x, jnp.asarray(i0), axis=axis)
    x1 = jnp.take(x, jnp.asarray(i1), axis=axis)
    return x0 * (1 - w) + x1 * w


def _conv_dn(nsp: int):
    sp = "".join(chr(ord("0") + i) for i in range(nsp))
    return jax.lax.conv_dimension_numbers(
        (1, 1) + (1,) * nsp, (1, 1) + (1,) * nsp,
        ("NC" + sp, "OI" + sp, "NC" + sp),
    )


def _reshape_dims(x: np.ndarray, dims):
    out = []
    for i, d in enumerate(dims):
        if d == 0:
            out.append(x.shape[i])
        else:
            out.append(d)
    return tuple(out)


def _reshape_dims_traced(x, dims):
    out = []
    for i, d in enumerate(dims):
        if d == 0:
            out.append(x.shape[i])
        else:
            out.append(int(d))
    return tuple(out)


def _bidir_shape(in_shape, target):
    """ONNX Expand: numpy-style bidirectional broadcast of shapes."""
    target = tuple(int(t) for t in target)
    nd = max(len(in_shape), len(target))
    ish = (1,) * (nd - len(in_shape)) + tuple(in_shape)
    tsh = (1,) * (nd - len(target)) + target
    return tuple(max(a, b) for a, b in zip(ish, tsh))


@dataclasses.dataclass
class OnnxModule:
    """A loaded ONNX model: `params` pytree + jittable `apply`."""

    runner: OnnxRunner
    input_names: List[str]
    input_shapes: List[tuple]
    output_names: List[str]

    @property
    def params(self):
        return self.runner.params

    def apply(self, params, *inputs):
        return self.runner(params, *inputs)

    def jit(self) -> Callable:
        return jax.jit(self.apply)


def load_onnx_module(path, dtype=jnp.float32) -> OnnxModule:
    """Load an OnnxModule from a .onnx path (or an OnnxGraph directly)."""
    g = path if isinstance(path, OnnxGraph) else load_onnx(path)
    runner = OnnxRunner(g, dtype=dtype)
    return OnnxModule(
        runner=runner,
        input_names=[n for n, _ in g.inputs],
        input_shapes=[s for _, s in g.inputs],
        output_names=list(g.outputs),
    )
