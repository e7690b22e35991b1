"""wenet/espnet-style conformer + transformer encoders (compat family).

The CosyVoice-300M release builds its token LM from wenet encoder stacks
(SURVEY §2.3.1 "Token LM" row; reference load site tts_with_rag.py:107):
llm.pt contains a ConformerEncoder over text and a TransformerEncoder LM
trunk, flow.pt another ConformerEncoder over speech tokens — all with
espnet relative-position multi-headed attention (pos_bias_u/v + linear_pos),
macaron feed-forward and a depthwise-conv module when configured.

This module is their JAX home after rule-driven weight conversion
(utils/cosyvoice_convert.RULESETS). TPU notes: layers are leading-[L]
stacked and run under one lax.scan (one compile regardless of depth);
convs are channels-last so they lower to MXU matmuls; attention scores in
f32. Causal decode keeps a KV cache and a rel-position table indexed by
distance-to-past, so the LM trunk decodes one program step at a time
(cosy_llm.py drives it inside a lax.while_loop).

Topology fidelity is best-effort from the documented upstream architecture;
numerics are pinned against torch re-implementations of the primitives in
tests/test_cosy_compat.py, not against real release files (zero egress).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict


@dataclass(frozen=True)
class WenetEncoderConfig:
    """Geometry of one wenet encoder stack (inferred from converted shapes
    by cosy_llm.infer_* helpers; authored directly for synthetic tests)."""

    input_dim: int
    dim: int
    n_layers: int
    n_heads: int
    ffn_dim: int
    macaron: bool = False          # feed_forward_macaron halves
    use_cnn: bool = False          # conv module + norm_final
    cnn_kernel: int = 15
    in_norm: bool = True           # LayerNorm after the input Linear
    activation: str = "silu"       # wenet 'swish' == silu; transformer: relu
    norm_eps: float = 1e-5
    max_rel: int = 4096            # rel-position table extent for decode

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


def _act(name: str):
    return {"silu": jax.nn.silu, "relu": jax.nn.relu, "gelu": jax.nn.gelu}[name]


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, -1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _lin(x, p):
    return x @ p["w"] + p["b"]


# ------------------------------------------------------------------ rel-pos


def relpos_table(rel: jnp.ndarray, dim: int) -> jnp.ndarray:
    """espnet RelPositionalEncoding rows for signed relative positions
    `rel` [N] -> [N, dim], sin at even dims / cos at odd dims (interleaved,
    matching the layout linear_pos was trained on upstream)."""
    inv = jnp.exp(
        -math.log(10000.0) * jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    )
    ang = rel.astype(jnp.float32)[:, None] * inv[None, :]
    pe = jnp.zeros((rel.shape[0], dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(ang))
    pe = pe.at[:, 1::2].set(jnp.cos(ang))
    return pe


def _relpos_attn_full(
    x: jnp.ndarray,           # [B, T, D] (already layer-normed)
    lw: Params,               # one layer's attention weights
    cfg: WenetEncoderConfig,
    attn_mask: jnp.ndarray,   # [B, 1, T, T] bool (True = attend)
    pe: jnp.ndarray,          # [2T-1, D] rel table, index j <-> rel = T-1-j
) -> jnp.ndarray:
    B, T, D = x.shape
    H, hd = cfg.n_heads, cfg.head_dim
    q = _lin(x, lw["q"]).reshape(B, T, H, hd)
    k = _lin(x, lw["k"]).reshape(B, T, H, hd)
    v = _lin(x, lw["v"]).reshape(B, T, H, hd)
    p = (pe @ lw["pos"]["w"]).reshape(-1, H, hd)          # [2T-1, H, hd]
    qu = q + lw["pos_bias_u"][None, None]
    qv = q + lw["pos_bias_v"][None, None]
    ac = jnp.einsum(
        "bthd,bshd->bhts", qu.astype(jnp.float32), k.astype(jnp.float32)
    )
    bd_all = jnp.einsum(
        "bthd,jhd->bhtj", qv.astype(jnp.float32), p.astype(jnp.float32)
    )
    # pe index j for query t / key s: rel = t - s, j = (T-1) - rel
    t_i = jnp.arange(T)[:, None]
    s_i = jnp.arange(T)[None, :]
    j = (T - 1) - (t_i - s_i)                              # [T, T]
    bd = jnp.take_along_axis(
        bd_all, jnp.broadcast_to(j[None, None], (B, H, T, T)), axis=-1
    )
    scores = (ac + bd) / math.sqrt(hd)
    scores = jnp.where(attn_mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32))
    return _lin(out.reshape(B, T, D).astype(x.dtype), lw["out"])


def _conv_module(x, lw, cfg, pad_mask):
    """Conformer conv module: pointwise(2C)+GLU -> depthwise -> LN -> swish
    -> pointwise. Channels-last; padded frames zeroed so the depthwise taps
    never read pad content."""
    B, T, D = x.shape
    x = x * pad_mask[..., None]
    h = _lin(x, lw["conv_pw1"])                            # [B, T, 2D] (K=1)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)
    w = lw["conv_dw"]["w"].astype(h.dtype)                 # [K, 1, D]
    h = jax.lax.conv_general_dilated(
        h, w, window_strides=(1,), padding="SAME",
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=D,
        preferred_element_type=jnp.float32,
    ).astype(h.dtype) + lw["conv_dw"]["b"]
    h = _ln(h, lw["conv_norm"]["scale"], lw["conv_norm"]["bias"], cfg.norm_eps)
    h = jax.nn.silu(h)
    return _lin(h, lw["conv_pw2"])


def _ff(x, w1, w2, act):
    return _lin(act(_lin(x, w1)), w2)


def apply_encoder(
    params: Params,
    cfg: WenetEncoderConfig,
    x: jnp.ndarray,                  # [B, T, input_dim]
    pad_mask: jnp.ndarray,           # [B, T] 1 = real frame
    causal: bool = False,
) -> jnp.ndarray:
    """Full-sequence encoder forward -> [B, T, dim] (after after_norm).
    normalize_before=True layer layout (the upstream default)."""
    act = _act(cfg.activation)
    eps = cfg.norm_eps
    h = _lin(x, params["in_proj"])
    if cfg.in_norm:
        h = _ln(h, params["in_norm"]["scale"], params["in_norm"]["bias"], eps)
    h = h * math.sqrt(cfg.dim)        # espnet xscale
    B, T, _ = h.shape
    pe = relpos_table(jnp.arange(T - 1, -T, -1), cfg.dim)
    attn_mask = (pad_mask[:, None, None, :] > 0)
    if causal:
        attn_mask = attn_mask & (
            jnp.arange(T)[None, None, :, None] >= jnp.arange(T)[None, None, None, :]
        )

    def body(h, lw):
        if cfg.macaron:
            n = _ln(h, lw["norm_ff_macaron"]["scale"],
                    lw["norm_ff_macaron"]["bias"], eps)
            h = h + 0.5 * _ff(n, lw["ffm_w1"], lw["ffm_w2"], act)
        n = _ln(h, lw["norm_mha"]["scale"], lw["norm_mha"]["bias"], eps)
        h = h + _relpos_attn_full(n, lw, cfg, attn_mask, pe)
        if cfg.use_cnn:
            n = _ln(h, lw["norm_conv"]["scale"], lw["norm_conv"]["bias"], eps)
            h = h + _conv_module(n, lw, cfg, pad_mask)
        n = _ln(h, lw["norm_ff"]["scale"], lw["norm_ff"]["bias"], eps)
        scale = 0.5 if cfg.macaron else 1.0
        h = h + scale * _ff(n, lw["ff_w1"], lw["ff_w2"], act)
        if cfg.use_cnn:
            h = _ln(h, lw["norm_final"]["scale"], lw["norm_final"]["bias"], eps)
        return h, None

    h, _ = jax.lax.scan(body, h, params["layers"])
    h = _ln(h, params["after_norm"]["scale"], params["after_norm"]["bias"], eps)
    return h * pad_mask[..., None]


# ------------------------------------------------------------------ causal decode


def prefill(
    params: Params,
    cfg: WenetEncoderConfig,
    x: jnp.ndarray,                  # [B, P, input_dim] embedded prefix
    pad_mask: jnp.ndarray,           # [B, P]
    s_max: int,
) -> Tuple[jnp.ndarray, Params]:
    """Causal full-prefix pass; returns last-position hidden [B, dim] and a
    KV cache dict sized s_max for decode_step. The cache stores pre-rope
    k/v per layer: rel-position attention adds position at SCORE time (the
    bd term), so cached keys are position-free and the cache can be filled
    in one shot."""
    act = _act(cfg.activation)
    eps = cfg.norm_eps
    B, P, _ = x.shape
    H, hd, L = cfg.n_heads, cfg.head_dim, cfg.n_layers
    h = _lin(x, params["in_proj"])
    if cfg.in_norm:
        h = _ln(h, params["in_norm"]["scale"], params["in_norm"]["bias"], eps)
    h = h * math.sqrt(cfg.dim)
    pe = relpos_table(jnp.arange(P - 1, -P, -1), cfg.dim)
    causal = (
        jnp.arange(P)[None, None, :, None] >= jnp.arange(P)[None, None, None, :]
    )
    attn_mask = (pad_mask[:, None, None, :] > 0) & causal

    def body(h, lw):
        if cfg.macaron:
            n = _ln(h, lw["norm_ff_macaron"]["scale"],
                    lw["norm_ff_macaron"]["bias"], eps)
            h = h + 0.5 * _ff(n, lw["ffm_w1"], lw["ffm_w2"], act)
        n = _ln(h, lw["norm_mha"]["scale"], lw["norm_mha"]["bias"], eps)
        k = _lin(n, lw["k"]).reshape(B, P, H, hd)
        v = _lin(n, lw["v"]).reshape(B, P, H, hd)
        h = h + _relpos_attn_full(n, lw, cfg, attn_mask, pe)
        n = _ln(h, lw["norm_ff"]["scale"], lw["norm_ff"]["bias"], eps)
        h = h + _ff(n, lw["ff_w1"], lw["ff_w2"], act)
        return h, (k, v)

    h, kv = jax.lax.scan(body, h, params["layers"])
    k_all, v_all = kv                                     # [L, B, P, H, hd]
    kc = jnp.zeros((L, B, s_max, H, hd), k_all.dtype)
    vc = jnp.zeros_like(kc)
    cache = {
        "k": jax.lax.dynamic_update_slice(kc, k_all, (0, 0, 0, 0, 0)),
        "v": jax.lax.dynamic_update_slice(vc, v_all, (0, 0, 0, 0, 0)),
    }
    return h, cache


def decode_step(
    params: Params,
    cfg: WenetEncoderConfig,
    cache: Params,
    x_t: jnp.ndarray,                # [B, input_dim] embedded current token
    pos: jnp.ndarray,                # [] int32 current absolute position
    kv_len: jnp.ndarray,             # [B] valid cache rows incl. this token
    pe_dec: jnp.ndarray,             # [max_rel, D] rel table rows rel=0..max
) -> Tuple[jnp.ndarray, Params]:
    """One causal step: append k/v at `pos`, attend over rel=pos-s, return
    ([B, dim] hidden, updated cache). Macaron/conv variants are not needed
    for the LM trunk (upstream uses a plain transformer there)."""
    act = _act(cfg.activation)
    eps = cfg.norm_eps
    B = x_t.shape[0]
    H, hd = cfg.n_heads, cfg.head_dim
    S = cache["k"].shape[2]
    h = _lin(x_t, params["in_proj"])
    if cfg.in_norm:
        h = _ln(h, params["in_norm"]["scale"], params["in_norm"]["bias"], eps)
    h = h * math.sqrt(cfg.dim)

    s_i = jnp.arange(S)
    valid = (s_i[None, :] < kv_len[:, None])              # [B, S]
    rel = jnp.clip(pos - s_i, 0, pe_dec.shape[0] - 1)     # [S]

    def body(carry, inputs):
        h = carry
        lw, kc, vc = inputs
        n = _ln(h, lw["norm_mha"]["scale"], lw["norm_mha"]["bias"], eps)
        q = _lin(n, lw["q"]).reshape(B, H, hd)
        k_new = _lin(n, lw["k"]).reshape(B, H, hd)
        v_new = _lin(n, lw["v"]).reshape(B, H, hd)
        kc = jax.lax.dynamic_update_slice(kc, k_new[:, None], (0, pos, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, v_new[:, None], (0, pos, 0, 0))
        p = (pe_dec[rel] @ lw["pos"]["w"]).reshape(S, H, hd)
        qu = (q + lw["pos_bias_u"][None]).astype(jnp.float32)
        qv = (q + lw["pos_bias_v"][None]).astype(jnp.float32)
        ac = jnp.einsum("bhd,bshd->bhs", qu, kc.astype(jnp.float32))
        bd = jnp.einsum("bhd,shd->bhs", qv, p.astype(jnp.float32))
        scores = (ac + bd) / math.sqrt(hd)
        scores = jnp.where(valid[:, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhs,bshd->bhd", probs, vc.astype(jnp.float32))
        out = _lin(out.reshape(B, -1).astype(h.dtype), lw["out"])
        h = h + out
        n = _ln(h, lw["norm_ff"]["scale"], lw["norm_ff"]["bias"], eps)
        h = h + _ff(n, lw["ff_w1"], lw["ff_w2"], act)
        return h, (kc, vc)

    h, (kc, vc) = jax.lax.scan(
        body, h, (params["layers"], cache["k"], cache["v"])
    )
    return h, {"k": kc, "v": vc}


# ------------------------------------------------------------------ synthetic init

def init_params(key: jax.Array, cfg: WenetEncoderConfig) -> Params:
    """Random params in the COMPAT layout (tests / synthetic engines)."""
    ks = iter(jax.random.split(key, 64))
    D, F, L, H, hd = cfg.dim, cfg.ffn_dim, cfg.n_layers, cfg.n_heads, cfg.head_dim

    def lin(i, o, stack=True):
        shape = (L, i, o) if stack else (i, o)
        bshape = (L, o) if stack else (o,)
        return {
            "w": jax.random.normal(next(ks), shape) / math.sqrt(i),
            "b": jnp.zeros(bshape),
        }

    def norm(stack=True):
        shape = (L, D) if stack else (D,)
        return {"scale": jnp.ones(shape), "bias": jnp.zeros(shape)}

    layers: Params = {
        "q": lin(D, D), "k": lin(D, D), "v": lin(D, D), "out": lin(D, D),
        "pos": {"w": jax.random.normal(next(ks), (L, D, D)) / math.sqrt(D)},
        "pos_bias_u": jax.random.normal(next(ks), (L, H, hd)) * 0.02,
        "pos_bias_v": jax.random.normal(next(ks), (L, H, hd)) * 0.02,
        "ff_w1": lin(D, F), "ff_w2": lin(F, D),
        "norm_mha": norm(), "norm_ff": norm(),
    }
    if cfg.macaron:
        layers.update({"ffm_w1": lin(D, F), "ffm_w2": lin(F, D),
                       "norm_ff_macaron": norm()})
    if cfg.use_cnn:
        layers.update({
            "conv_pw1": lin(D, 2 * D),
            "conv_dw": {
                "w": jax.random.normal(
                    next(ks), (L, cfg.cnn_kernel, 1, D)) * 0.05,
                "b": jnp.zeros((L, D)),
            },
            "conv_norm": norm(), "conv_pw2": lin(D, D),
            "norm_conv": norm(), "norm_final": norm(),
        })
    p: Params = {
        "in_proj": lin(cfg.input_dim, D, stack=False),
        "layers": layers,
        "after_norm": norm(stack=False),
    }
    if cfg.in_norm:
        p["in_norm"] = norm(stack=False)
    return p
