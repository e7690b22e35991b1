"""Whisper-encoder speech tokenizer compat (speech_tokenizer_v1.onnx).

The CosyVoice release tokenizes prompt wavs with an ONNX export of a
Whisper-style audio encoder + vector quantizer ("S3 tokenizer"; SURVEY
§2.3.1 "Speech tokenizer" row — upstream ran it under ONNX Runtime).
This module is the converted weights' JAX home so a converted engine can
serve FROM WAV (CosyEngine otherwise takes pre-tokenized prompts):

    log-mel (16 kHz, 100 Hz frames)
    -> conv1 (k3, s1) + GELU -> conv2 (k3, s2) + GELU        [50 Hz]
    -> + fixed sinusoidal positions
    -> pre-LN transformer blocks (q/v biased, k unbiased, GELU MLP)
    -> ln_post -> VQ nearest-codebook lookup -> token ids

Channels-last convs (MXU); geometry is read off the converted tree.
Best-effort: ONNX initializer names follow torch state_dict paths
(encoder.conv1.*, encoder.blocks.{i}.attn.query.*, ...); UNVALIDATED
against the real file (zero-egress env, docs/WEIGHTS.md) — the coverage
report surfaces any spelling drift and --rules overrides fix it without
code changes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from ...ops.conv import conv1d

Params = Dict


@dataclass(frozen=True)
class S3TokenizerConfig:
    n_mels: int
    dim: int
    n_layers: int
    n_heads: int
    codebook_size: int
    conv2_stride: int = 2          # 100 Hz mel -> 50 Hz states


def infer_config(tree: Params, n_heads: int = 8) -> S3TokenizerConfig:
    lw = tree["blocks"]["q"]["w"]          # [L, D, D]
    return S3TokenizerConfig(
        n_mels=tree["conv1"]["w"].shape[1],
        dim=lw.shape[1],
        n_layers=lw.shape[0],
        n_heads=n_heads,
        codebook_size=tree["codebook"].shape[0],
    )


def _ln(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, -1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * p["scale"] + p["bias"]).astype(x.dtype)


def _sinusoid(length: int, dim: int) -> jnp.ndarray:
    """Whisper's fixed positional table: sin/cos concat, log-spaced."""
    half = dim // 2
    scale = jnp.exp(-math.log(10000.0) * jnp.arange(half) / max(half - 1, 1))
    ang = jnp.arange(length)[:, None] * scale[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def encode(
    tree: Params,
    cfg: S3TokenizerConfig,
    mel: jnp.ndarray,          # [B, T, n_mels] log-mel at 100 Hz
    mask: jnp.ndarray,         # [B, T]
):
    """-> (tokens [B, T//stride] int32, token_mask [B, T//stride])."""
    # zero padded frames first: the k=3 convs' receptive fields would
    # otherwise leak pad content into the last real tokens
    mel = mel * mask[..., None]
    h = jax.nn.gelu(conv1d(mel, tree["conv1"]))
    # EXPLICIT (1, 1) padding, not XLA SAME: whisper's stride-2 conv is
    # torch Conv1d(k=3, stride=2, padding=1), whose windows anchor at
    # -1, 1, 3, ... — XLA SAME pads (0, 1) for even T and anchors at
    # 0, 2, 4, ..., a one-frame shift against the upstream weights
    # (caught by the graph-vs-rules cross-validation, test_onnx_exec.py)
    h = jax.nn.gelu(
        conv1d(h, tree["conv2"], stride=cfg.conv2_stride, padding=(1, 1))
    )
    B, T2, D = h.shape
    # prefer the exported positional table (if the ONNX carried it as an
    # initializer); fall back to the same fixed sinusoid whisper computes
    pe = tree["pos_emb"][:T2] if "pos_emb" in tree else _sinusoid(T2, D)
    h = h + pe[None].astype(h.dtype)
    m2 = mask[:, :: cfg.conv2_stride][:, :T2]
    H, hd = cfg.n_heads, cfg.dim // cfg.n_heads
    valid = m2[:, None, None, :] > 0

    def body(h, lw):
        n = _ln(h, lw["attn_ln"])
        q = (n @ lw["q"]["w"] + lw["q"]["b"]).reshape(B, T2, H, hd)
        k = (n @ lw["k"]["w"]).reshape(B, T2, H, hd)       # whisper: no k bias
        v = (n @ lw["v"]["w"] + lw["v"]["b"]).reshape(B, T2, H, hd)
        s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                       k.astype(jnp.float32)) / math.sqrt(hd)
        s = jnp.where(valid, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        att = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
        att = att.reshape(B, T2, D).astype(h.dtype)
        h = h + att @ lw["out"]["w"] + lw["out"]["b"]
        n = _ln(h, lw["mlp_ln"])
        h = h + jax.nn.gelu(n @ lw["mlp1"]["w"] + lw["mlp1"]["b"]) @ lw["mlp2"]["w"] + lw["mlp2"]["b"]
        return h, None

    h, _ = jax.lax.scan(body, h, tree["blocks"])
    h = _ln(h, tree["ln_post"])
    # VQ: nearest codebook row by L2 (ties -> lowest id, like argmin)
    cb = tree["codebook"].astype(jnp.float32)              # [K, D]
    d = (
        jnp.sum(h.astype(jnp.float32) ** 2, -1, keepdims=True)
        - 2.0 * h.astype(jnp.float32) @ cb.T
        + jnp.sum(cb ** 2, -1)[None, None, :]
    )
    tokens = jnp.argmin(d, axis=-1).astype(jnp.int32)
    return tokens * (m2 > 0), m2
