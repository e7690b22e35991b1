"""1-D conv building blocks (feature-last layout [B, T, C]).

Layout note: TPU-first means channels-last so the channel dim (multiple of
128 in production configs) rides the lane dimension and convs lower to MXU
matmuls via im2col. Replaces torch Conv1d/ConvTranspose1d used throughout the
CosyVoice stack the reference depends on (SURVEY §2.3.1).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

DN = ("NHC", "HIO", "NHC")  # feature-last 1-D conv dimension numbers


def conv1d_init(key, in_ch: int, out_ch: int, kernel: int) -> dict:
    std = 1.0 / math.sqrt(in_ch * kernel)
    wkey, bkey = jax.random.split(key)
    return {
        "w": jax.random.uniform(wkey, (kernel, in_ch, out_ch), jnp.float32, -std, std),
        "b": jax.random.uniform(bkey, (out_ch,), jnp.float32, -std, std),
    }


def conv1d(
    x: jnp.ndarray,          # [B, T, C_in]
    p: dict,
    stride: int = 1,
    dilation: int = 1,
    padding: str | Tuple[int, int] = "SAME",
) -> jnp.ndarray:
    w = p["w"].astype(x.dtype)
    pad = padding if isinstance(padding, str) else [padding]
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=DN,
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"]).astype(x.dtype)


def conv_transpose1d_init(key, in_ch: int, out_ch: int, kernel: int) -> dict:
    std = 1.0 / math.sqrt(in_ch * kernel)
    wkey, bkey = jax.random.split(key)
    return {
        "w": jax.random.uniform(wkey, (kernel, in_ch, out_ch), jnp.float32, -std, std),
        "b": jax.random.uniform(bkey, (out_ch,), jnp.float32, -std, std),
    }


def conv_transpose1d(
    x: jnp.ndarray,          # [B, T, C_in]
    p: dict,
    stride: int,
    kernel: int,
) -> jnp.ndarray:
    """Fractionally-strided conv with torch-compatible output length
    T_out = T*stride (padding = (kernel-stride)//2 each side after dilation).
    Implemented as lhs-dilated conv so XLA lowers it onto the MXU like a
    normal conv (the HiFi-GAN upsampling path, SURVEY §2.3.1 vocoder row)."""
    w = p["w"].astype(x.dtype)
    pad_total = kernel - stride
    pad_l = pad_total - pad_total // 2
    pad_r = pad_total // 2
    y = jax.lax.conv_general_dilated(
        x, w[::-1],  # transpose conv = conv with flipped taps over dilated input
        window_strides=(1,),
        padding=[(kernel - 1 - pad_l, kernel - 1 - pad_r)],
        lhs_dilation=(stride,),
        dimension_numbers=DN,
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"]).astype(x.dtype)


def layer_norm(x: jnp.ndarray, p: dict, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(
        x.dtype
    )


def layer_norm_init(dim: int) -> dict:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}
