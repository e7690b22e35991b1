"""Attention ops: GQA scaled-dot-product with causal/padding masks + RoPE.

Replaces flash-attention-2 CUDA kernels (reference: src/ft_llm.py:224,
attn_implementation='flash_attention_2'). On TPU the default path lowers to
XLA's fused attention; a Pallas flash kernel (ops/pallas_attn.py) covers the
long-prefill case. Layout: q [B, T, H, hd], k/v [B, S, K, hd], H % K == 0.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


# ----------------------------------------------------------------------- RoPE


def rope_inv_freq(head_dim: int, theta: float = 10000.0) -> jnp.ndarray:
    """[head_dim//2] rotate-half inverse frequencies — the ONE definition of
    the RoPE parameterization (rope_table and the decode megakernel's
    in-kernel rows both derive from it, keeping bit-parity if it changes)."""
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))


def rope_table(max_len: int, head_dim: int, theta: float = 10000.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute (cos, sin) [max_len, head_dim//2] tables."""
    inv = rope_inv_freq(head_dim, theta)
    t = jnp.arange(max_len, dtype=jnp.float32)
    ang = jnp.outer(t, inv)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(
    x: jnp.ndarray,                # [B, T, H, hd]
    cos: jnp.ndarray,              # [max_len, hd//2]
    sin: jnp.ndarray,
    positions: jnp.ndarray,        # [B, T] int32 absolute positions
) -> jnp.ndarray:
    c = cos[positions][:, :, None, :]  # [B, T, 1, hd//2]
    s = sin[positions][:, :, None, :]
    x1, x2 = jnp.split(x, 2, axis=-1)  # rotate-half convention (Llama)
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)


# ----------------------------------------------------------------------- SDPA


def _repeat_kv(k: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    if n_rep == 1:
        return k
    b, s, kh, d = k.shape
    return jnp.broadcast_to(k[:, :, :, None, :], (b, s, kh, n_rep, d)).reshape(
        b, s, kh * n_rep, d
    )


def _sdpa_decode(q, k, v, mask):
    """T=1 attention WITHOUT relayouting the cache.

    The einsum path transposes (and f32-materializes) the whole [B, S, K, hd]
    cache to feed the MXU dot every decode step — a strided copy that runs
    far below HBM peak and dominated the continuous-batching step (measured
    ~5.4 ms/step at B=8, S=552 on v5e; weights alone are ~0.4 ms). With one
    query per row the MXU is useless anyway, so compute scores/outputs as
    broadcast-multiplies + reductions in the cache's NATIVE layout: k and v
    stream exactly once at full bandwidth, hd reduces on the lane dim, S on
    the sublane dim."""
    B, _, H, hd = q.shape
    S, K = k.shape[1], k.shape[2]
    rep = H // K
    scale = hd ** -0.5
    # q head h = k*rep + r (the _repeat_kv mapping)
    qf = q.astype(jnp.float32).reshape(B, 1, K, rep, hd) * scale
    kf = k.astype(jnp.float32)[:, :, :, None, :]
    logits = jnp.sum(qf * kf, axis=-1)                    # [B, S, K, rep]
    if mask is not None:
        m = mask[:, :, 0, :]                              # [B, 1|H, S]
        if m.shape[1] == 1:
            m = m[:, 0, :, None, None]                    # [B, S, 1, 1]
        else:
            m = m.reshape(B, K, rep, S).transpose(0, 3, 1, 2)
        logits = jnp.where(m, logits, NEG_INF)
    mx = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - mx)
    # fully-masked rows (idle continuous slots) -> zeros, not 0/0 NaN
    denom = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
    vf = v.astype(jnp.float32)[:, :, :, None, :]
    out = jnp.sum(p[..., None] * vf, axis=1) / denom[:, 0, :, :, None]
    return out.reshape(B, 1, H, hd).astype(q.dtype)


def sdpa(
    q: jnp.ndarray,                       # [B, T, H, hd]
    k: jnp.ndarray,                       # [B, S, K, hd]
    v: jnp.ndarray,                       # [B, S, K, hd]
    mask: Optional[jnp.ndarray] = None,   # [B, 1|H, T, S] bool (True = attend)
) -> jnp.ndarray:
    """Reference XLA path. Computes in f32, returns q.dtype."""
    if q.shape[1] == 1 and k.shape[1] > 1:
        return _sdpa_decode(q, k, v, mask)
    h, kh = q.shape[2], k.shape[2]
    k = _repeat_kv(k, h // kh)
    v = _repeat_kv(v, h // kh)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def _sdpa_quant_decode(q, kq, ks, vq, vs, mask):
    """T=1 attention over the int8 KV cache WITHOUT relayouting it (the
    einsum path transposes + f32-materializes the cache every decode step —
    see _sdpa_decode). Per-(position, head) scales are scalar across hd, so
    k's scale multiplies the finished dot and v's folds into the
    probabilities; the int8 arrays stream once in native layout."""
    B, _, H, hd = q.shape
    S, K = kq.shape[1], kq.shape[2]
    rep = H // K
    qf = q.astype(jnp.float32).reshape(B, 1, K, rep, hd) * hd ** -0.5
    lm = jnp.sum(qf * kq.astype(jnp.float32)[:, :, :, None, :], -1)
    lm = lm * ks[..., None]                               # [B, S, K, rep]
    if mask is not None:
        m = mask[:, :, 0, :]
        if m.shape[1] == 1:
            m = m[:, 0, :, None, None]
        else:
            m = m.reshape(B, K, rep, S).transpose(0, 3, 1, 2)
        lm = jnp.where(m, lm, NEG_INF)
    mx = jnp.max(lm, axis=1, keepdims=True)
    p = jnp.exp(lm - mx)
    denom = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
    pv = p * vs[..., None]                                # fold v scales
    out = jnp.sum(
        pv[..., None] * vq.astype(jnp.float32)[:, :, :, None, :], axis=1
    ) / denom[:, 0, :, :, None]
    return out.reshape(B, 1, H, hd).astype(q.dtype)


def sdpa_quant(
    q: jnp.ndarray,                       # [B, T, H, hd]
    kq: jnp.ndarray,                      # [B, S, K, hd] int8
    ks: jnp.ndarray,                      # [B, S, K] f32 per-position scales
    vq: jnp.ndarray,                      # [B, S, K, hd] int8
    vs: jnp.ndarray,                      # [B, S, K] f32
    mask: Optional[jnp.ndarray] = None,   # [B, 1|H, T, S]
) -> jnp.ndarray:
    """Attention over an int8-quantized KV cache.

    Bandwidth-shaped: the dots read int8 straight from HBM (the f32 convert
    fuses into the dot producer — the dequantized cache is never
    materialized). The per-(position, head) scales are scalar across hd, so
    k's scale applies to the LOGITS after the q·k dot and v's scale folds
    into the probabilities before the p·v dot — two [*, S]-shaped
    multiplies instead of re-scaling [S, hd] tensors. Halves decode-step
    cache traffic vs bf16. T=1 takes the native-layout elementwise path
    (no cache transpose)."""
    if q.shape[1] == 1 and kq.shape[1] > 1:
        return _sdpa_quant_decode(q, kq, ks, vq, vs, mask)
    h, kh = q.shape[2], kq.shape[2]
    rep = h // kh
    kq = _repeat_kv(kq, rep)
    vq = _repeat_kv(vq, rep)
    ks_h = jnp.repeat(ks, rep, axis=2).transpose(0, 2, 1)[:, :, None, :]
    vs_h = jnp.repeat(vs, rep, axis=2).transpose(0, 2, 1)[:, :, None, :]
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bthd,bshd->bhts", q.astype(jnp.float32), kq.astype(jnp.float32)
    ) * (scale * ks_h)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1) * vs_h
    out = jnp.einsum("bhts,bshd->bthd", probs, vq.astype(jnp.float32))
    return out.astype(q.dtype)


def quantize_kv(x: jnp.ndarray) -> tuple:
    """[B, T, K, hd] -> (int8 values, f32 per-(B,T,K) scales)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, s


def causal_mask(t: int, s: int, offset: int = 0) -> jnp.ndarray:
    """[1, 1, T, S] causal mask; query i attends key j iff j <= i + offset
    (offset = number of cached tokens during incremental decode)."""
    qi = jnp.arange(t)[:, None] + offset
    kj = jnp.arange(s)[None, :]
    return (kj <= qi)[None, None, :, :]


def padding_mask(lengths: jnp.ndarray, s: int) -> jnp.ndarray:
    """[B] lengths -> [B, 1, 1, S] key-padding mask."""
    return (jnp.arange(s)[None, :] < lengths[:, None])[:, None, None, :]
