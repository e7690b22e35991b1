"""Trace an ONNX graph into one jitted XLA program.

Why this exists (SURVEY §2.3.1/§2.3.4 rows 3-4): the reference runs two
release artifacts under ONNX Runtime — speech_tokenizer_v1.onnx and
campplus.onnx. The tokenizer's initializer names follow standard whisper
state_dict paths, so it converts into a native module via RULESETS
(models/compat/s3_tokenizer.py). The CAM++ D-TDNN export does NOT have
blind-reconstructible names; instead of guessing a rule table, this module
executes the graph ITSELF: the node list is walked once at trace time and
every op lowers to jax/XLA ops, producing a single jitted program per input
shape — TPU-native execution of the artifact with zero name assumptions.

Design:
- values flow through an env {name: array}. A value that depends only on
  initializers/Constants/Shapes is kept as a host numpy array ("static") so
  shape-carrying ops (Reshape/Slice/Unsqueeze targets, axes inputs) stay
  compile-time constants — the XLA requirement. Everything else is traced.
- large float initializers are passed as a pytree ARGUMENT to the jitted
  runner (baking them in as constants would bloat the program; through a
  tunneled device, closure-baked weights also break remote compiles).
  Small integer initializers stay static (they are shape/axes carriers).
- unsupported ops raise with the op name up front (`check_supported`), so
  a converter can report exactly what a given artifact would need.

Scope: inference only, static shapes, the op subset covering speaker
encoders / TDNN / conv+transformer audio models. Extend OP table as needed.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.onnx_load import OnnxGraph, OnnxNode

# initializer int tensors at most this many elements stay host-static
_STATIC_INT_MAX = 256


def _is_static(v) -> bool:
    return isinstance(v, np.ndarray) or np.isscalar(v)


def _static_int_list(v, what: str) -> List[int]:
    if not _is_static(v):
        raise ValueError(
            f"{what} must be statically known (initializer/Constant); got a "
            f"traced value — dynamic shapes cannot compile to XLA"
        )
    return [int(x) for x in np.asarray(v).reshape(-1)]


def _pool_window(x, node: OnnxNode, reducer, init):
    """Shared MaxPool/AveragePool lowering (N, C, *spatial)."""
    kshape = node.attrs["kernel_shape"]
    nd = len(kshape)
    strides = node.attrs.get("strides", [1] * nd)
    pads = node.attrs.get("pads", [0] * (2 * nd))
    if node.attrs.get("auto_pad", "NOTSET") not in ("NOTSET", ""):
        raise ValueError("Pool auto_pad is not supported; export with "
                         "explicit pads")
    if int(node.attrs.get("ceil_mode", 0)):
        raise ValueError("Pool ceil_mode=1 is not supported")
    window = (1, 1, *kshape)
    strides_full = (1, 1, *strides)
    padding = ((0, 0), (0, 0)) + tuple(
        (pads[i], pads[i + nd]) for i in range(nd)
    )
    out = jax.lax.reduce_window(x, init, reducer, window, strides_full,
                                padding)
    if reducer is jax.lax.add:
        if int(node.attrs.get("count_include_pad", 0)):
            out = out / float(np.prod(kshape))
        else:
            # ONNX default: average over the NON-pad elements only — count
            # them with the same window reduction over a ones tensor
            ones = jnp.ones(x.shape[:1] + (1,) + x.shape[2:], x.dtype)
            cnt = jax.lax.reduce_window(
                ones, jnp.zeros((), x.dtype), jax.lax.add, window,
                strides_full, padding,
            )
            out = out / cnt
    return out


def _conv(env_get, node: OnnxNode):
    """Conv: ONNX NC* layout, torch-convention weights [out, in/g, *k]."""
    x = env_get(node.inputs[0])
    w = env_get(node.inputs[1])
    nd = w.ndim - 2
    strides = node.attrs.get("strides", [1] * nd)
    dilations = node.attrs.get("dilations", [1] * nd)
    group = int(node.attrs.get("group", 1))
    pads = node.attrs.get("pads", [0] * (2 * nd))
    if node.attrs.get("auto_pad", "NOTSET") not in ("NOTSET", ""):
        raise ValueError("Conv auto_pad is not supported; export with "
                         "explicit pads")
    padding = tuple((pads[i], pads[i + nd]) for i in range(nd))
    spatial = "DHW"[-nd:]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape,
        (f"NC{spatial}", f"OI{spatial}", f"NC{spatial}"),
    )
    out = jax.lax.conv_general_dilated(
        x, w, tuple(strides), padding, rhs_dilation=tuple(dilations),
        dimension_numbers=dn, feature_group_count=group,
    )
    if len(node.inputs) > 2 and node.inputs[2]:
        b = env_get(node.inputs[2])
        out = out + b.reshape((1, -1) + (1,) * nd)
    return out


def _gemm(env_get, node: OnnxNode):
    a = env_get(node.inputs[0])
    b = env_get(node.inputs[1])
    if int(node.attrs.get("transA", 0)):
        a = a.T
    if int(node.attrs.get("transB", 0)):
        b = b.T
    out = float(node.attrs.get("alpha", 1.0)) * (a @ b)
    if len(node.inputs) > 2 and node.inputs[2]:
        out = out + float(node.attrs.get("beta", 1.0)) * env_get(
            node.inputs[2])
    return out


def _batchnorm(env_get, node: OnnxNode):
    x, scale, bias, mean, var = (env_get(i) for i in node.inputs[:5])
    eps = float(node.attrs.get("epsilon", 1e-5))
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps).astype(x.dtype)
    return (x - mean.reshape(shape)) * (scale * inv).reshape(shape) + \
        bias.reshape(shape)


def _layernorm(env_get, node: OnnxNode):
    x = env_get(node.inputs[0])
    axis = int(node.attrs.get("axis", -1))
    eps = float(node.attrs.get("epsilon", 1e-5))
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    out = out * env_get(node.inputs[1])
    if len(node.inputs) > 2 and node.inputs[2]:
        out = out + env_get(node.inputs[2])
    return out.astype(x.dtype)


def _reduce(env_get, node: OnnxNode, fn):
    x = env_get(node.inputs[0])
    if len(node.inputs) > 1 and node.inputs[1]:
        axes = _static_int_list(env_get(node.inputs[1]), "Reduce axes")
    else:
        axes = node.attrs.get("axes")
    keep = bool(node.attrs.get("keepdims", 1))
    axes_t = tuple(axes) if axes is not None else None
    return fn(x, axis=axes_t, keepdims=keep)


def _slice(env_get, node: OnnxNode):
    x = env_get(node.inputs[0])
    if len(node.inputs) > 1:
        starts = _static_int_list(env_get(node.inputs[1]), "Slice starts")
        ends = _static_int_list(env_get(node.inputs[2]), "Slice ends")
        axes = (_static_int_list(env_get(node.inputs[3]), "Slice axes")
                if len(node.inputs) > 3 and node.inputs[3]
                else list(range(len(starts))))
        steps = (_static_int_list(env_get(node.inputs[4]), "Slice steps")
                 if len(node.inputs) > 4 and node.inputs[4]
                 else [1] * len(starts))
    else:   # opset<10 attribute form
        starts = node.attrs["starts"]
        ends = node.attrs["ends"]
        axes = node.attrs.get("axes", list(range(len(starts))))
        steps = [1] * len(starts)
    idx: List[Any] = [slice(None)] * x.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        dim = x.shape[a]
        e = min(e, dim) if e >= 0 else e
        idx[a] = slice(s, e, st)
    return x[tuple(idx)]


def _unsqueeze_axes(env_get, node: OnnxNode) -> List[int]:
    if len(node.inputs) > 1 and node.inputs[1]:
        return _static_int_list(env_get(node.inputs[1]), "axes")
    return list(node.attrs["axes"])


_DTYPE_OF_ONNX = {
    1: jnp.float32, 6: jnp.int32, 7: jnp.int64, 9: jnp.bool_,
    10: jnp.float16, 11: jnp.float64, 2: jnp.uint8, 3: jnp.int8,
}


def _softmax(x, axis):
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis).astype(x.dtype)


# op -> (env_get, node) -> value (or tuple of values for multi-output ops)
OPS: Dict[str, Callable] = {
    "Add": lambda g, n: g(n.inputs[0]) + g(n.inputs[1]),
    "Sub": lambda g, n: g(n.inputs[0]) - g(n.inputs[1]),
    "Mul": lambda g, n: g(n.inputs[0]) * g(n.inputs[1]),
    "Div": lambda g, n: g(n.inputs[0]) / g(n.inputs[1]),
    "Pow": lambda g, n: g(n.inputs[0]) ** g(n.inputs[1]),
    "Sqrt": lambda g, n: jnp.sqrt(g(n.inputs[0])),
    "Exp": lambda g, n: jnp.exp(g(n.inputs[0])),
    "Log": lambda g, n: jnp.log(g(n.inputs[0])),
    "Neg": lambda g, n: -g(n.inputs[0]),
    "Abs": lambda g, n: jnp.abs(g(n.inputs[0])),
    "Erf": lambda g, n: jax.lax.erf(g(n.inputs[0]).astype(jnp.float32)),
    "Tanh": lambda g, n: jnp.tanh(g(n.inputs[0])),
    "Sigmoid": lambda g, n: jax.nn.sigmoid(g(n.inputs[0])),
    "Relu": lambda g, n: jax.nn.relu(g(n.inputs[0])),
    "LeakyRelu": lambda g, n: jax.nn.leaky_relu(
        g(n.inputs[0]), float(n.attrs.get("alpha", 0.01))),
    "PRelu": lambda g, n: _prelu(g(n.inputs[0]), g(n.inputs[1])),
    "Elu": lambda g, n: jax.nn.elu(g(n.inputs[0]),
                                   float(n.attrs.get("alpha", 1.0))),
    "Gelu": lambda g, n: jax.nn.gelu(
        g(n.inputs[0]),
        approximate=n.attrs.get("approximate", "none") == "tanh"),
    "Clip": lambda g, n: jnp.clip(
        g(n.inputs[0]),
        g(n.inputs[1]) if len(n.inputs) > 1 and n.inputs[1]
        else n.attrs.get("min"),
        g(n.inputs[2]) if len(n.inputs) > 2 and n.inputs[2]
        else n.attrs.get("max")),
    "Softmax": lambda g, n: _softmax(g(n.inputs[0]),
                                     int(n.attrs.get("axis", -1))),
    "MatMul": lambda g, n: g(n.inputs[0]) @ g(n.inputs[1]),
    "Gemm": _gemm,
    "Conv": _conv,
    "BatchNormalization": _batchnorm,
    "LayerNormalization": _layernorm,
    "InstanceNormalization": lambda g, n: _instancenorm(g, n),
    "MaxPool": lambda g, n: _pool_window(
        g(n.inputs[0]), n, jax.lax.max, -jnp.inf),
    "AveragePool": lambda g, n: _pool_window(
        g(n.inputs[0]), n, jax.lax.add, 0.0),
    "GlobalAveragePool": lambda g, n: jnp.mean(
        g(n.inputs[0]), axis=tuple(range(2, g(n.inputs[0]).ndim)),
        keepdims=True),
    "ReduceMean": lambda g, n: _reduce(g, n, jnp.mean),
    "ReduceSum": lambda g, n: _reduce(g, n, jnp.sum),
    "ReduceMax": lambda g, n: _reduce(g, n, jnp.max),
    "ReduceMin": lambda g, n: _reduce(g, n, jnp.min),
    "Concat": lambda g, n: jnp.concatenate(
        [g(i) for i in n.inputs], axis=int(n.attrs["axis"])),
    "Transpose": lambda g, n: jnp.transpose(
        g(n.inputs[0]), axes=n.attrs.get("perm")),
    "Reshape": lambda g, n: jnp.reshape(
        g(n.inputs[0]),
        tuple(_static_int_list(g(n.inputs[1]), "Reshape shape"))),
    "Flatten": lambda g, n: g(n.inputs[0]).reshape(
        (int(np.prod(g(n.inputs[0]).shape[: int(n.attrs.get("axis", 1))]) or 1),
         -1)),
    "Unsqueeze": lambda g, n: jnp.expand_dims(
        g(n.inputs[0]), tuple(_unsqueeze_axes(g, n))),
    "Squeeze": lambda g, n: jnp.squeeze(
        g(n.inputs[0]),
        tuple(_unsqueeze_axes(g, n)) if (
            len(n.inputs) > 1 and n.inputs[1]) or "axes" in n.attrs
        else None),
    "Gather": lambda g, n: _gather(
        g(n.inputs[0]), g(n.inputs[1]), int(n.attrs.get("axis", 0))),
    "Cast": lambda g, n: jnp.asarray(g(n.inputs[0])).astype(
        _DTYPE_OF_ONNX[int(n.attrs["to"])]),
    "Identity": lambda g, n: g(n.inputs[0]),
    "Dropout": lambda g, n: g(n.inputs[0]),     # inference
    "Constant": lambda g, n: np.asarray(
        n.attrs.get("value", n.attrs.get("value_float",
                                         n.attrs.get("value_int")))),
    "Shape": lambda g, n: np.asarray(g(n.inputs[0]).shape, np.int64),
    "ConstantOfShape": lambda g, n: np.full(
        _static_int_list(g(n.inputs[0]), "ConstantOfShape shape"),
        n.attrs["value"].reshape(-1)[0] if "value" in n.attrs
        else np.float32(0),
    ),   # np.full keeps the fill value's dtype (spec: f32 when no value)
    "Expand": lambda g, n: jnp.broadcast_to(
        g(n.inputs[0]),
        np.broadcast_shapes(
            g(n.inputs[0]).shape,
            tuple(_static_int_list(g(n.inputs[1]), "Expand shape")))),
    "Range": lambda g, n: np.arange(
        _static_int_list(g(n.inputs[0]), "Range start")[0],
        _static_int_list(g(n.inputs[1]), "Range limit")[0],
        _static_int_list(g(n.inputs[2]), "Range delta")[0]),
    "Where": lambda g, n: jnp.where(g(n.inputs[0]), g(n.inputs[1]),
                                    g(n.inputs[2])),
    "Equal": lambda g, n: g(n.inputs[0]) == g(n.inputs[1]),
    "Less": lambda g, n: g(n.inputs[0]) < g(n.inputs[1]),
    "Greater": lambda g, n: g(n.inputs[0]) > g(n.inputs[1]),
    "LessOrEqual": lambda g, n: g(n.inputs[0]) <= g(n.inputs[1]),
    "GreaterOrEqual": lambda g, n: g(n.inputs[0]) >= g(n.inputs[1]),
    "Not": lambda g, n: jnp.logical_not(g(n.inputs[0])),
    "And": lambda g, n: jnp.logical_and(g(n.inputs[0]), g(n.inputs[1])),
    "Or": lambda g, n: jnp.logical_or(g(n.inputs[0]), g(n.inputs[1])),
    "Min": lambda g, n: _variadic(g, n, jnp.minimum),
    "Max": lambda g, n: _variadic(g, n, jnp.maximum),
    # the real speech-tokenizer export's VQ is a nearest-codebook ArgMin
    "ArgMax": lambda g, n: _arg_reduce(g, n, jnp.argmax),
    "ArgMin": lambda g, n: _arg_reduce(g, n, jnp.argmin),
    "Pad": lambda g, n: _pad(g, n),
    # transformer-export staples: attention einsums, in-graph positional
    # tables, Trilu causal masks
    "Einsum": lambda g, n: jnp.einsum(
        n.attrs["equation"], *(g(i) for i in n.inputs)),
    "Sin": lambda g, n: jnp.sin(g(n.inputs[0])),
    "Cos": lambda g, n: jnp.cos(g(n.inputs[0])),
    "Trilu": lambda g, n: (
        jnp.triu if int(n.attrs.get("upper", 1)) else jnp.tril
    )(
        g(n.inputs[0]),
        int(np.asarray(g(n.inputs[1])).reshape(-1)[0])
        if len(n.inputs) > 1 and n.inputs[1] else 0,
    ),
    "Split": None,      # handled in run() (multi-output)
}


def _prelu(x, slope):
    """ONNX PRelu: a [C] slope broadcasts against the CHANNEL dim of an
    NC* tensor (unidirectional broadcast), not numpy's trailing-dim rule."""
    if slope.ndim == 1 and x.ndim > 2 and slope.shape[0] == x.shape[1]:
        slope = slope.reshape((1, -1) + (1,) * (x.ndim - 2))
    return jnp.where(x >= 0, x, slope * x)


def _gather(x, idx, axis: int):
    """ONNX Gather allows negative indices (python-style); jnp.take CLAMPS
    out-of-bounds — including negatives — so normalize first."""
    idx = jnp.asarray(idx)
    idx = jnp.where(idx < 0, idx + x.shape[axis], idx)
    return jnp.take(x, idx, axis=axis)


def _variadic(g, n: OnnxNode, fn):
    out = g(n.inputs[0])
    for i in n.inputs[1:]:
        out = fn(out, g(i))
    return out


def _arg_reduce(g, n: OnnxNode, fn):
    x = g(n.inputs[0])
    axis = int(n.attrs.get("axis", 0))
    if int(n.attrs.get("select_last_index", 0)):
        raise ValueError("Arg{Max,Min} select_last_index is not supported")
    # spec says int64, but default JAX truncates to int32 anyway (with a
    # per-trace warning) — be explicit instead of warning-and-truncating
    out = fn(x, axis=axis).astype(jnp.int32)
    if int(n.attrs.get("keepdims", 1)):
        out = jnp.expand_dims(out, axis)
    return out


def _pad(g, n: OnnxNode):
    x = g(n.inputs[0])
    mode = n.attrs.get("mode", "constant")
    if len(n.inputs) > 3 and n.inputs[3]:
        raise ValueError("Pad with an explicit `axes` input is not "
                         "supported; export with full-rank pads")
    if len(n.inputs) > 1 and n.inputs[1]:
        pads = _static_int_list(g(n.inputs[1]), "Pad pads")
    else:
        pads = list(n.attrs["pads"])
    value = 0.0
    if len(n.inputs) > 2 and n.inputs[2]:
        value = float(np.asarray(g(n.inputs[2])).reshape(-1)[0])
    nd = x.ndim
    widths = [(pads[i], pads[i + nd]) for i in range(nd)]
    if mode == "constant":
        return jnp.pad(x, widths, constant_values=value)
    if mode in ("reflect", "edge"):
        return jnp.pad(x, widths, mode="reflect" if mode == "reflect"
                       else "edge")
    raise ValueError(f"Pad mode {mode!r} is not supported")


def _instancenorm(g, n: OnnxNode):
    x = g(n.inputs[0])
    eps = float(n.attrs.get("epsilon", 1e-5))
    axes = tuple(range(2, x.ndim))
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axes, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axes, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * g(n.inputs[1]).reshape(shape)
            + g(n.inputs[2]).reshape(shape)).astype(x.dtype)


# ops computed in NUMPY when every input is host-static, so shape plumbing
# (Shape -> Gather -> Unsqueeze -> Concat -> Reshape chains) never touches
# the device: Reshape/Slice targets must be compile-time constants, and a
# device constant would also cost a transfer per fold through a tunnel.
# (Arithmetic ops fold for free: python operators keep numpy as numpy.)
_NP_FOLD: Dict[str, Callable] = {
    "Gather": lambda g, n: np.take(
        np.asarray(g(n.inputs[0])), np.asarray(g(n.inputs[1])),
        axis=int(n.attrs.get("axis", 0))),
    "Concat": lambda g, n: np.concatenate(
        [np.asarray(g(i)) for i in n.inputs], axis=int(n.attrs["axis"])),
    "Unsqueeze": lambda g, n: np.expand_dims(
        np.asarray(g(n.inputs[0])), tuple(_unsqueeze_axes(g, n))),
    "Squeeze": lambda g, n: np.squeeze(
        np.asarray(g(n.inputs[0])),
        tuple(_unsqueeze_axes(g, n)) if (
            len(n.inputs) > 1 and n.inputs[1]) or "axes" in n.attrs
        else None),
    "Cast": lambda g, n: np.asarray(g(n.inputs[0])).astype(
        np.dtype(_DTYPE_OF_ONNX[int(n.attrs["to"])])),
}


def unsupported_ops(graph: OnnxGraph) -> List[str]:
    """Sorted op configurations this executor cannot lower (empty =
    runnable). Includes attribute-gated cases (e.g. pool ceil_mode) so a
    converter pre-screening an artifact sees every blocker up front, not a
    trace-time ValueError on first call."""
    supported = set(OPS) | {"Slice"}
    bad = {n.op_type for n in graph.nodes if n.op_type not in supported}
    for n in graph.nodes:
        if n.op_type in ("Conv", "MaxPool", "AveragePool"):
            if n.attrs.get("auto_pad", "NOTSET") not in ("NOTSET", ""):
                bad.add(f"{n.op_type}(auto_pad)")
            if int(n.attrs.get("ceil_mode", 0)):
                bad.add(f"{n.op_type}(ceil_mode=1)")
        elif n.op_type == "Pad":
            if len(n.inputs) > 3 and n.inputs[3]:
                bad.add("Pad(axes input)")
            if n.attrs.get("mode", "constant") not in (
                    "constant", "reflect", "edge"):
                bad.add(f"Pad(mode={n.attrs.get('mode')})")
        elif n.op_type in ("ArgMax", "ArgMin") and int(
                n.attrs.get("select_last_index", 0)):
            bad.add(f"{n.op_type}(select_last_index)")
    return sorted(bad)


def op_histogram(graph: OnnxGraph) -> Dict[str, int]:
    out: Dict[str, int] = {}
    for n in graph.nodes:
        out[n.op_type] = out.get(n.op_type, 0) + 1
    return out


def run(
    graph: OnnxGraph,
    feeds: Dict[str, Any],
    params: Optional[Dict[str, Any]] = None,
) -> List[Any]:
    """Execute the graph on the given feeds; returns graph.outputs values.

    `params` overrides initializers (the jitted path passes the large float
    initializers as an argument pytree; None = use graph.initializers
    directly, e.g. under interpretation/tests)."""
    env: Dict[str, Any] = {}
    for k, v in graph.initializers.items():
        env[k] = v
    if params:
        env.update(params)
    env.update(feeds)

    def get(name: str):
        if name not in env:
            raise KeyError(f"onnx_exec: value {name!r} not produced yet "
                           f"(graph not topologically ordered?)")
        return env[name]

    for node in graph.nodes:
        if node.op_type == "Slice":
            vals: Any = _slice(get, node)
        elif node.op_type == "Split":
            x = get(node.inputs[0])
            axis = int(node.attrs.get("axis", 0))
            if len(node.inputs) > 1 and node.inputs[1]:
                sizes = _static_int_list(get(node.inputs[1]), "Split sizes")
            elif "split" in node.attrs:
                sizes = list(node.attrs["split"])
            else:
                k = len(node.outputs)
                sizes = [x.shape[axis] // k] * k
            offs = np.cumsum([0] + sizes)
            parts = [
                jax.lax.slice_in_dim(x, int(offs[i]), int(offs[i + 1]),
                                     axis=axis)
                for i in range(len(sizes))
            ]
            for name, part in zip(node.outputs, parts):
                env[name] = part
            continue
        elif node.op_type in _NP_FOLD and all(
            _is_static(env.get(i)) for i in node.inputs if i
        ):
            vals = _NP_FOLD[node.op_type](get, node)
        else:
            fn = OPS.get(node.op_type)
            if fn is None:
                raise NotImplementedError(
                    f"onnx_exec: op {node.op_type!r} (node {node.name!r}) — "
                    f"extend ops/onnx_exec.OPS"
                )
            vals = fn(get, node)
        env[node.outputs[0]] = vals
    return [get(o) for o in graph.outputs]


class OnnxRunner:
    """jit-compiled graph execution. Large float initializers are passed as
    an argument pytree (not baked into the program); shape-carrying int
    initializers stay static. One compile per distinct feed shape."""

    def __init__(self, graph: OnnxGraph):
        bad = unsupported_ops(graph)
        if bad:
            raise NotImplementedError(
                f"onnx_exec: graph uses unsupported ops {bad}"
            )
        self.graph = graph
        self.params = {
            k: jnp.asarray(v)
            for k, v in graph.initializers.items()
            if not (np.issubdtype(v.dtype, np.integer)
                    and v.size <= _STATIC_INT_MAX)
        }
        self._jitted = jax.jit(partial(run, self.graph))

    def __call__(self, feeds: Dict[str, Any]) -> List[jnp.ndarray]:
        return self._jitted(
            {k: jnp.asarray(v) for k, v in feeds.items()}, self.params
        )
