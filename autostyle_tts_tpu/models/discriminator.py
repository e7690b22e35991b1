"""GAN discriminators for vocoder training: multi-period + multi-scale.

The reference's vocoder arrived pre-trained (CosyVoice ships a HiFi-GAN-class
generator trained adversarially upstream; the repo itself has no training
code, SURVEY §0). To make the 24 kHz vocoder trainable here at full quality,
this module provides the standard HiFi-GAN discriminator ensemble:

- MPD: per-period sub-discriminators fold the waveform into [T/p, p] planes
  and run strided 2-D convs (periods 2,3,5,7,11) — catches periodic artefacts.
- MSD: multi-scale 1-D conv stacks on x1 / x2 / x4 average-pooled audio.

Losses: LSGAN adversarial + feature matching (standard HiFi-GAN recipe).
Channels-last layout throughout so convs lower to MXU matmuls.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import conv1d, conv1d_init

PERIODS = (2, 3, 5, 7, 11)


def _conv2d_init(key, in_ch, out_ch, kh, kw):
    std = 1.0 / math.sqrt(in_ch * kh * kw)
    wk, bk = jax.random.split(key)
    return {
        "w": jax.random.uniform(wk, (kh, kw, in_ch, out_ch), jnp.float32, -std, std),
        "b": jax.random.uniform(bk, (out_ch,), jnp.float32, -std, std),
    }


def _conv2d(x, p, stride_h=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride_h, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"]).astype(x.dtype)


def init_params(key: jax.Array) -> Dict:
    keys = jax.random.split(key, len(PERIODS) + 3)
    p: Dict = {"mpd": [], "msd": []}
    chans = (32, 128, 512, 1024)
    for i, period in enumerate(PERIODS):
        ks = jax.random.split(keys[i], len(chans) + 1)
        convs = []
        in_ch = 1
        for j, ch in enumerate(chans):
            convs.append(_conv2d_init(ks[j], in_ch, ch, 5, 1))
            in_ch = ch
        p["mpd"].append(
            {"convs": convs, "post": _conv2d_init(ks[-1], in_ch, 1, 3, 1)}
        )
    for s in range(3):
        ks = jax.random.split(keys[len(PERIODS) + s], 6)
        convs = [
            conv1d_init(ks[0], 1, 64, 15),
            conv1d_init(ks[1], 64, 128, 41),
            conv1d_init(ks[2], 128, 256, 41),
            conv1d_init(ks[3], 256, 512, 41),
            conv1d_init(ks[4], 512, 512, 5),
        ]
        p["msd"].append({"convs": convs, "post": conv1d_init(ks[5], 512, 1, 3)})
    return p


def _mpd_one(params: Dict, wav: jnp.ndarray, period: int):
    B, T = wav.shape
    pad = (-T) % period
    x = jnp.pad(wav, ((0, 0), (0, pad))).reshape(B, -1, period, 1)  # [B, T/p, p, 1]
    feats = []
    for conv in params["convs"]:
        x = jax.nn.leaky_relu(_conv2d(x, conv, stride_h=3), 0.1)
        feats.append(x)
    out = _conv2d(x, params["post"])
    return out.reshape(B, -1), feats


def _msd_one(params: Dict, wav: jnp.ndarray):
    x = wav[..., None]  # [B, T, 1]
    feats = []
    strides = (1, 4, 4, 4, 1)
    for conv, s in zip(params["convs"], strides):
        x = jax.nn.leaky_relu(conv1d(x, conv, stride=s), 0.1)
        feats.append(x)
    out = conv1d(x, params["post"])
    return out.reshape(wav.shape[0], -1), feats


def _avg_pool2(wav: jnp.ndarray) -> jnp.ndarray:
    T = wav.shape[-1] // 2 * 2
    return wav[..., :T].reshape(wav.shape[0], -1, 2).mean(-1)


def apply(params: Dict, wav: jnp.ndarray) -> List[Tuple[jnp.ndarray, list]]:
    """wav [B, T] -> list of (score_map, feature_list) per sub-discriminator."""
    outs = []
    for sub, period in zip(params["mpd"], PERIODS):
        outs.append(_mpd_one(sub, wav, period))
    x = wav
    for sub in params["msd"]:
        outs.append(_msd_one(sub, x))
        x = _avg_pool2(x)
    return outs


# ----------------------------------------------------------------------- losses (LSGAN)


def discriminator_loss(params: Dict, real: jnp.ndarray, fake: jnp.ndarray):
    loss = 0.0
    for (dr, _), (df, _) in zip(apply(params, real), apply(params, fake)):
        loss = loss + jnp.mean((dr - 1.0) ** 2) + jnp.mean(df**2)
    return loss


def generator_adversarial_losses(params: Dict, real: jnp.ndarray, fake: jnp.ndarray):
    """(adversarial_loss, feature_matching_loss) for the generator."""
    adv, fm = 0.0, 0.0
    for (df, ff), (_, fr) in zip(apply(params, fake), apply(params, real)):
        adv = adv + jnp.mean((df - 1.0) ** 2)
        for a, b in zip(ff, fr):
            fm = fm + jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
    return adv, fm
