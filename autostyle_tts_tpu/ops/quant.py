"""Int8 weight-only quantization (symmetric, per-output-channel scales).

Replaces bitsandbytes 4/8-bit CUDA kernels the reference loaded the embedder
with (SURVEY §2.3.2: load_in_8bit milvus/RAG.py:89-92, nf4 src/ft_llm.py:209-211).
TPU-native form: weights live in HBM as int8 (halving weight bandwidth — the
3B embedder drops from ~6.4 GB bf16 to ~3.2 GB), are cast to the compute
dtype on the fly inside the matmul fusion, and the per-channel scale is
folded in AFTER the matmul (scales commute with the contraction), so the MXU
still sees a plain dense matmul. LoRA deltas stay full precision.

``QTensor`` is a pytree node, so quantized params flow through jit/pjit and
the sharding rules unchanged (rules match the logical weight name one level
up; see parallel/sharding.py).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    q: jnp.ndarray        # int8 values, same shape as the original weight
    s: jnp.ndarray        # f32 scale, shape = weight.shape[:-2] + (1, out)


class Q4Tensor(NamedTuple):
    """Int4 weight-only (the reference loaded its LLMs 4-bit nf4,
    src/ft_llm.py:209-211): two nibbles packed per uint8 along the
    contraction dim — quarter the HBM traffic of bf16. Values in [-7, 7],
    symmetric per-output-channel scales."""

    packed: jnp.ndarray   # uint8 [..., D//2, out]
    s: jnp.ndarray        # f32 [..., 1, out]


def quantize(w: jnp.ndarray, axis: int = -1) -> QTensor:
    """Symmetric per-channel int8: scale = absmax/127 along every dim except
    `axis` (the output-channel dim keeps its own scale)."""
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis % w.ndim)
    absmax = jnp.max(jnp.abs(w), axis=reduce_axes[-1], keepdims=True)
    # per-channel over the contraction dim only (keep leading stack dims)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QTensor(q=q, s=scale.astype(jnp.float32))


def dequantize(t: QTensor, dtype=jnp.float32) -> jnp.ndarray:
    return (t.q.astype(jnp.float32) * t.s).astype(dtype)


def qmatmul(x: jnp.ndarray, t: QTensor) -> jnp.ndarray:
    """x @ dequant(t) with the scale folded in after the contraction."""
    y = jnp.matmul(x, t.q.astype(x.dtype), preferred_element_type=jnp.float32)
    return (y * t.s.astype(jnp.float32)).astype(x.dtype)


def quantize4(w: jnp.ndarray) -> Q4Tensor:
    """Symmetric per-output-channel int4 over the contraction dim (axis -2).

    Packing pairs contraction rows (r, r + D/2) per byte — CONTIGUOUS HALF
    BLOCKS, not interleaved rows: interleave needs a sublane relayout to
    unpack (a stack+reshape XLA materializes at ~50x the cost of the
    matmul on v5e — measured 272 ms/step at 7B), while half blocks unpack
    as two elementwise nibble extractions that fuse straight into two
    half-contraction dots (q4matmul)."""
    D = w.shape[-2]
    if D % 2:
        raise ValueError(f"int4 packing needs an even contraction dim, got {D}")
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int8)
    lo = q[..., : D // 2, :]
    hi = q[..., D // 2 :, :]
    packed = ((lo + 8) | ((hi + 8) << 4)).astype(jnp.uint8)
    return Q4Tensor(packed=packed, s=scale.astype(jnp.float32))


def _nibbles(packed: jnp.ndarray):
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    return lo, hi


def unpack4(t: Q4Tensor) -> jnp.ndarray:
    """-> int8 [..., D, out] (concat of the two half blocks)."""
    lo, hi = _nibbles(t.packed)
    return jnp.concatenate([lo, hi], axis=-2)


def dequantize4(t: Q4Tensor, dtype=jnp.float32) -> jnp.ndarray:
    return (unpack4(t).astype(jnp.float32) * t.s).astype(dtype)


def q4matmul(x: jnp.ndarray, t: Q4Tensor) -> jnp.ndarray:
    """x @ dequant4(t) as TWO half-contraction dots: each nibble extraction
    is elementwise on the packed bytes, so XLA fuses it into the dot's
    operand stream and the unpacked weights are never materialized — the
    byte array streams once per half. Scales fold after the summed
    contraction."""
    D2 = t.packed.shape[-2]
    lo, hi = _nibbles(t.packed)
    y = jnp.matmul(
        x[..., :D2], lo.astype(x.dtype), preferred_element_type=jnp.float32
    ) + jnp.matmul(
        x[..., D2:], hi.astype(x.dtype), preferred_element_type=jnp.float32
    )
    return (y * t.s.astype(jnp.float32)).astype(x.dtype)


_QUANT_NAMES = ("wqkv", "wq", "wk", "wv", "wo", "w_gate_up", "w_gate", "w_up",
                "w_down", "lm_head", "speech_head")


def quantize_tree(
    params: Dict, names: Tuple[str, ...] = _QUANT_NAMES, bits: int = 8
) -> Dict:
    """Quantize matching projection weights in a transformer param tree
    (embeddings and norms stay full precision; LoRA is never quantized).
    bits=8 -> QTensor (int8), bits=4 -> Q4Tensor (packed nibbles)."""
    quantizer = quantize if bits == 8 else quantize4
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")

    def walk(d: Any) -> Any:
        if isinstance(d, dict):
            return {
                k: quantizer(v)
                if k in names and hasattr(v, "ndim") and v.ndim >= 2
                else walk(v)
                for k, v in d.items()
            }
        return d

    return walk(params)


def tree_bytes(params: Any) -> int:
    return sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params)
    )
