"""GSPMD sharding rules for the framework's param pytrees.

Megatron-style tensor parallelism expressed purely as NamedShardings — XLA
inserts the all-reduces (psum over MODEL_AXIS after wo / w_down contractions).
Replaces the reference's accelerate device_map="auto" layer placement
(milvus/RAG.py:98, src/ft_llm.py:223) with real TP.

Rules (matched on the flattened param path):
- attention wq/wk/wv and MLP w_gate/w_up: column-parallel  -> P(None, MODEL)
- attention wo and MLP w_down:            row-parallel     -> P(MODEL, None)
- token embedding / lm_head:              vocab-sharded    -> P(MODEL, None) /
                                                              P(None, MODEL)
- LoRA A follows the base weight's input dim, LoRA B its output dim
- norms, biases, scalars: replicated
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

_COL = re.compile(r"(wqkv|wq|wk|wv|w_gate_up|w_gate|w_up)$")
_ROW = re.compile(r"(wo|w_down)$")


def _axis_spec(ndim: int, shard_axis: int) -> P:
    """PartitionSpec sharding `shard_axis` (negative = from the end) on MODEL.
    Handles layer-stacked params ([L, ...] leading dim stays replicated)."""
    spec = [None] * ndim
    spec[shard_axis % ndim] = MODEL_AXIS
    return P(*spec)


def spec_for_path(path: str, ndim: int) -> P:
    leaf = path.rsplit("/", 1)[-1]
    base = leaf
    lora = None
    if leaf.endswith("_lora_a") or leaf.endswith("_lora_b"):
        base, lora = leaf[:-7], leaf[-1]
    if ndim < 2:
        return P()
    if _COL.search(base):
        if lora == "a":  # [..., D, r] — r too small to shard
            return P()
        return _axis_spec(ndim, -1)  # base [..., D, F] / lora_b [..., r, F]
    if _ROW.search(base):
        if lora == "b":  # [..., r, D]
            return P()
        return _axis_spec(ndim, -2)  # base [..., F, D] / lora_a [..., F, r]
    if base in ("tok_emb", "text_emb", "speech_emb"):
        return _axis_spec(ndim, -2)  # vocab-sharded
    if base in ("lm_head", "speech_head"):
        return _axis_spec(ndim, -1)
    return P()


def _path_str(p: Any) -> str:
    parts = []
    for x in p:
        if hasattr(x, "key"):
            parts.append(str(x.key))
        elif hasattr(x, "idx"):
            parts.append(str(x.idx))
        else:
            parts.append(str(x))
    return "/".join(parts)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Pytree of NamedShardings matching `params`."""

    model_size = mesh.shape.get(MODEL_AXIS, 1)

    def one(path, leaf):
        # NamedTuple fields (QTensor.q/.s, Q4Tensor.packed, optax state slots)
        # appear as trailing '.field' components — the rule matches the
        # logical WEIGHT name, i.e. the last non-field component.
        parts = [p for p in _path_str(path).split("/") if not p.startswith(".")]
        ps = "/".join(parts) if parts else _path_str(path)
        spec = spec_for_path(ps, getattr(leaf, "ndim", 0))
        # fall back to replication when a dim doesn't divide the model axis
        # (covers QTensor scales whose sharded dim is size 1)
        for dim, axis in enumerate(spec):
            if axis == MODEL_AXIS and leaf.shape[dim] % model_size:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a host pytree onto the mesh under the TP rules."""
    shardings = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
