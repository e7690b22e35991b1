"""Speech tokenizer: 16 kHz mel -> 25 Hz discrete speech tokens.

Replaces the ONNX speech tokenizer the reference's synthesis engine ran via
ONNX Runtime (SURVEY §2.3.1 "Speech tokenizer" row: wav -> 25/50 Hz discrete
tokens). Design: strided-conv subsampling (100 Hz mel -> 25 Hz) into a
bidirectional transformer encoder (reuses the shared decoder core with a full
attention mask) and a VQ layer (nearest-neighbour against a normalized
codebook, argmax on-device). The style DB precomputes these tokens at insert
time so serving never touches the wav path (SURVEY §7 hard part 5).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import sdpa
from ..ops.conv import conv1d, conv1d_init, layer_norm, layer_norm_init
from ..utils.config import SpeechTokenizerConfig

Params = Dict


def init_params(key: jax.Array, cfg: SpeechTokenizerConfig) -> Params:
    n_sub = len(cfg.strides)
    keys = jax.random.split(key, 3 + n_sub + cfg.n_layers)
    D = cfg.dim
    p: Params = {"sub": [], "enc": [], "codebook": None}
    in_ch = cfg.n_mels
    for i in range(n_sub):
        p["sub"].append(
            {"conv": conv1d_init(keys[i], in_ch, D, 4), "ln": layer_norm_init(D)}
        )
        in_ch = D
    for i in range(cfg.n_layers):
        k = keys[n_sub + i]
        ks = jax.random.split(k, 6)
        s = D**-0.5
        p["enc"].append(
            {
                "ln1": layer_norm_init(D),
                "wq": jax.random.normal(ks[0], (D, D)) * s,
                "wk": jax.random.normal(ks[1], (D, D)) * s,
                "wv": jax.random.normal(ks[2], (D, D)) * s,
                "wo": jax.random.normal(ks[3], (D, D)) * s,
                "ln2": layer_norm_init(D),
                "w_up": jax.random.normal(ks[4], (D, cfg.ffn_dim)) * s,
                "w_down": jax.random.normal(ks[5], (cfg.ffn_dim, D))
                * cfg.ffn_dim**-0.5,
            }
        )
    p["codebook"] = jax.random.normal(keys[-1], (cfg.codebook_size, D))
    return p


class TokenizeResult(NamedTuple):
    tokens: jnp.ndarray        # [B, T_tok] int32
    token_mask: jnp.ndarray    # [B, T_tok] bool
    pre_vq: jnp.ndarray        # [B, T_tok, D] encoder output (for VQ training)


def apply(
    params: Params,
    cfg: SpeechTokenizerConfig,
    mel: jnp.ndarray,          # [B, T, n_mels] (100 Hz frames)
    frame_mask: jnp.ndarray,   # [B, T]
) -> TokenizeResult:
    # mask before AND after every conv so padded frames (log-mel of silence is
    # strongly non-zero) never leak through the receptive field — tokens must
    # be identical across padding buckets (style-DB insert vs serving paths)
    m = frame_mask
    h = mel * m[..., None].astype(mel.dtype)
    for sub, stride in zip(params["sub"], cfg.strides):
        h = conv1d(h, sub["conv"], stride=stride)
        m = m[:, ::stride][:, : h.shape[1]]
        h = jax.nn.gelu(layer_norm(h, sub["ln"])) * m[..., None].astype(h.dtype)
    B, T, D = h.shape
    n_heads = cfg.n_heads
    hd = D // n_heads
    attn_mask = (m[:, None, None, :] > 0) & (m[:, None, :, None] > 0)
    for blk in params["enc"]:
        x = layer_norm(h, blk["ln1"])
        q = (x @ blk["wq"].astype(x.dtype)).reshape(B, T, n_heads, hd)
        k = (x @ blk["wk"].astype(x.dtype)).reshape(B, T, n_heads, hd)
        v = (x @ blk["wv"].astype(x.dtype)).reshape(B, T, n_heads, hd)
        att = sdpa(q, k, v, attn_mask).reshape(B, T, D)
        h = h + att @ blk["wo"].astype(h.dtype)
        x = layer_norm(h, blk["ln2"])
        h = h + jax.nn.gelu(x @ blk["w_up"].astype(x.dtype)) @ blk["w_down"].astype(
            x.dtype
        )
    tokens = quantize(params["codebook"], h)
    return TokenizeResult(tokens=tokens, token_mask=m > 0, pre_vq=h)


def quantize(codebook: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Nearest codebook entry by L2 — one matmul + argmax on device."""
    hf = h.astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    # ||h - c||^2 = ||h||^2 - 2 h.c + ||c||^2 ; ||h||^2 constant per frame
    scores = 2.0 * jnp.einsum("btd,cd->btc", hf, cb) - jnp.sum(cb * cb, -1)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def codebook_lookup(codebook: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
    return codebook[tokens]
