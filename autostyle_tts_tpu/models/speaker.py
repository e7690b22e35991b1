"""Timbre encoder: mel -> 192-d speaker embedding (x-vector class).

Replaces the CAM++ ONNX speaker-embedding extractor the reference ran via
ONNX Runtime (SURVEY §2.3.1 "Speaker embedding (timbre)" row; campplus.onnx,
192-d output). Architecture: dilated conv1d (TDNN) trunk + attentive
statistics pooling + linear head — standard x-vector family, implemented
channels-last so every conv lowers to MXU matmuls. Fully jittable; consumed
by the token LM (spk conditioning) and the CFM decoder.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.conv import conv1d, conv1d_init, layer_norm, layer_norm_init
from ..utils.config import SpeakerEncoderConfig

Params = Dict


def init_params(key: jax.Array, cfg: SpeakerEncoderConfig) -> Params:
    keys = jax.random.split(key, cfg.n_blocks + 4)
    C = cfg.channels
    p: Params = {
        "stem": conv1d_init(keys[0], cfg.n_mels, C, 5),
        "stem_ln": layer_norm_init(C),
        "blocks": [],
        "att": conv1d_init(keys[cfg.n_blocks + 1], C, C, 1),
        "att_v": conv1d_init(keys[cfg.n_blocks + 2], C, C, 1),
        "head": {
            "w": jax.random.normal(keys[cfg.n_blocks + 3], (2 * C, cfg.emb_dim))
            * (2 * C) ** -0.5,
            "b": jnp.zeros((cfg.emb_dim,)),
        },
    }
    for i in range(cfg.n_blocks):
        k1, k2 = jax.random.split(keys[i + 1])
        p["blocks"].append(
            {
                "conv1": conv1d_init(k1, C, C, 3),
                "conv2": conv1d_init(k2, C, C, 3),
                "ln1": layer_norm_init(C),
                "ln2": layer_norm_init(C),
            }
        )
    return p


def apply(
    params: Params,
    cfg: SpeakerEncoderConfig,
    mel: jnp.ndarray,          # [B, T, n_mels]
    frame_mask: jnp.ndarray,   # [B, T] 1 = real frame
) -> jnp.ndarray:
    """-> [B, emb_dim] L2-normalized timbre embedding."""
    m = frame_mask[..., None].astype(mel.dtype)
    # mask before AND after every conv so padded frames never leak through
    # the conv receptive field (zero padding semantics)
    h = conv1d(mel * m, params["stem"])
    h = jax.nn.relu(layer_norm(h, params["stem_ln"])) * m
    for i, blk in enumerate(params["blocks"]):
        r = conv1d(h, blk["conv1"], dilation=2**i)
        r = jax.nn.relu(layer_norm(r, blk["ln1"])) * m
        r = conv1d(r, blk["conv2"], dilation=2**i)
        r = jax.nn.relu(layer_norm(r, blk["ln2"]))
        h = (h + r) * m
    # attentive statistics pooling (masked)
    att = jnp.tanh(conv1d(h, params["att"]))
    scores = conv1d(att, params["att_v"])                       # [B, T, C]
    scores = jnp.where(m > 0, scores.astype(jnp.float32), -1e30)
    w = jax.nn.softmax(scores, axis=1)                          # per-channel attention
    hf = h.astype(jnp.float32)
    mean = jnp.sum(w * hf, axis=1)                              # [B, C]
    var = jnp.sum(w * hf * hf, axis=1) - mean * mean
    std = jnp.sqrt(jnp.maximum(var, 1e-6))
    stats = jnp.concatenate([mean, std], axis=-1)               # [B, 2C]
    emb = stats @ params["head"]["w"] + params["head"]["b"]
    return emb * jax.lax.rsqrt(jnp.sum(emb * emb, -1, keepdims=True) + 1e-12)
