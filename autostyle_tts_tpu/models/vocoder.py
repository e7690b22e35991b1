"""HiFi-GAN-class 24 kHz vocoder (HiFT-equivalent generator).

Replaces the HiFi-GAN/HiFT mel->wav generator inside the reference's engine
(SURVEY §2.3.1 "Vocoder" row; README claims 24 kHz, README.md:20 — we honour
that claim, a recorded divergence from the code's 22 050 Hz saves). Generator:
pre-conv -> [ConvTranspose upsample + multi-receptive-field (MRF) resblock
fusion] x len(upsample_rates) -> post-conv -> tanh. Channels-last so every
(transposed) conv lowers to MXU matmuls; total upsampling = prod(rates) =
hop_length so frames map exactly to samples. Fully jittable, static shapes.

Training losses (GAN discriminators land with the training subsystem):
multi-resolution STFT + L1 mel losses are provided here as jit-able functions
so the vocoder is trainable end-to-end without the adversarial part.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import (conv1d, conv1d_init, conv_transpose1d,
                        conv_transpose1d_init, layer_norm, layer_norm_init)
from ..utils.config import VocoderConfig

Params = Dict


def init_params(key: jax.Array, cfg: VocoderConfig) -> Params:
    if getattr(cfg, "kind", "hifigan") == "istft":
        return init_params_istft(key, cfg)
    n_up = len(cfg.upsample_rates)
    keys = jax.random.split(key, 2 + n_up)
    C = cfg.base_channels
    p: Params = {
        "pre": conv1d_init(keys[0], cfg.n_mels, C, 7),
        "ups": [],
        "post": conv1d_init(keys[1], C // (2 ** n_up), 1, 7),
    }
    ch = C
    for i in range(n_up):
        k = keys[2 + i]
        ks = jax.random.split(k, 1 + len(cfg.resblock_kernel_sizes) * len(cfg.resblock_dilations[0]) * 2)
        out_ch = ch // 2
        up = {
            "t": conv_transpose1d_init(ks[0], ch, out_ch, cfg.upsample_kernel_sizes[i]),
            "mrf": [],
        }
        ki = 1
        for kern, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations):
            block = []
            for _d in dils:
                block.append(
                    {
                        "c1": conv1d_init(ks[ki], out_ch, out_ch, kern),
                        "c2": conv1d_init(ks[ki + 1], out_ch, out_ch, kern),
                    }
                )
                ki += 2
            up["mrf"].append({"layers": block})
        p["ups"].append(up)
        ch = out_ch
    return p


def apply(params: Params, cfg: VocoderConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """[B, F, n_mels] -> [B, F * samples_per_frame] waveform in [-1, 1]."""
    if getattr(cfg, "kind", "hifigan") == "istft":
        return apply_istft(params, cfg, mel)
    h = conv1d(mel, params["pre"])
    for i, up in enumerate(params["ups"]):
        h = jax.nn.leaky_relu(h, 0.1)
        h = conv_transpose1d(
            h, up["t"], stride=cfg.upsample_rates[i],
            kernel=cfg.upsample_kernel_sizes[i],
        )
        # MRF: average of parallel resblocks with different kernels
        acc = None
        for mrf, dils in zip(up["mrf"], cfg.resblock_dilations):
            r = h
            for layer, d in zip(mrf["layers"], dils):
                x = jax.nn.leaky_relu(r, 0.1)
                x = conv1d(x, layer["c1"], dilation=d)
                x = jax.nn.leaky_relu(x, 0.1)
                x = conv1d(x, layer["c2"])
                r = r + x
            acc = r if acc is None else acc + r
        h = acc / len(up["mrf"])
    h = jax.nn.leaky_relu(h, 0.1)
    wav = jnp.tanh(conv1d(h, params["post"]))
    return wav[..., 0]


def total_upsample(cfg: VocoderConfig) -> int:
    if getattr(cfg, "kind", "hifigan") == "istft":
        return cfg.istft_hop
    out = 1
    for r in cfg.upsample_rates:
        out *= r
    return out


# ----------------------------------------------------------------------- istft kind


def init_params_istft(key: jax.Array, cfg: VocoderConfig) -> Params:
    """Vocos-class generator: mel -> ConvNeXt-style frame-rate backbone ->
    (log-magnitude, phase) -> GEMM iSTFT. All compute stays at 50 Hz frame
    rate; the only sample-rate op is the [n_bins, n_fft] synthesis matmul —
    the TPU-native alternative to the ConvTranspose stack (which spends most
    of its FLOPs at 4.8-24 kHz intermediate rates)."""
    C = cfg.istft_channels
    n_bins = cfg.istft_n_fft // 2 + 1
    keys = jax.random.split(key, 2 + 3 * cfg.istft_blocks)
    std = lambda fan: 1.0 / math.sqrt(fan)

    def dense(k, i, o):
        return {
            "w": jax.random.uniform(k, (i, o), jnp.float32, -std(i), std(i)),
            "b": jnp.zeros((o,), jnp.float32),
        }

    p: Params = {
        "pre": conv1d_init(keys[0], cfg.n_mels, C, 7),
        "blocks": [],
        "head": dense(keys[1], C, 2 * n_bins),
    }
    for i in range(cfg.istft_blocks):
        k1, k2, k3 = keys[2 + 3 * i : 5 + 3 * i]
        p["blocks"].append(
            {
                "conv": conv1d_init(k1, C, C, cfg.istft_kernel),
                "ln": layer_norm_init(C),
                "pw1": dense(k2, C, 3 * C),
                "pw2": dense(k3, 3 * C, C),
            }
        )
    return p


def apply_istft(params: Params, cfg: VocoderConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """[B, F, n_mels] -> [B, F * istft_hop] waveform. f32 throughout: the
    backbone is ~30 GFLOP for 10 s of audio (measured at the host-roundtrip
    floor on v5e either way), and f32 keeps the conv VJPs dtype-clean for
    GAN training."""
    from ..ops.stft import istft_overlap_add

    n_bins = cfg.istft_n_fft // 2 + 1
    h = conv1d(mel, params["pre"])
    for blk in params["blocks"]:
        x = conv1d(h, blk["conv"], dilation=1)
        x = layer_norm(x, blk["ln"])
        x = jax.nn.gelu(x @ blk["pw1"]["w"] + blk["pw1"]["b"])
        x = x @ blk["pw2"]["w"] + blk["pw2"]["b"]
        h = h + x
    out = h @ params["head"]["w"] + params["head"]["b"]       # [B, F, 2*n_bins]
    log_mag, phase = out[..., :n_bins], out[..., n_bins:]
    mag = jnp.exp(jnp.clip(log_mag, -12.0, 6.0))
    spec_r = mag * jnp.cos(phase)
    spec_i = mag * jnp.sin(phase)
    wav = istft_overlap_add(spec_r, spec_i, cfg.istft_n_fft, cfg.istft_hop)
    return jnp.clip(wav, -1.0, 1.0)


# ----------------------------------------------------------------------- losses


def multi_res_stft_loss(
    wav_pred: jnp.ndarray, wav_true: jnp.ndarray,
    resolutions: Tuple[Tuple[int, int, int], ...] = (
        (512, 128, 512), (1024, 256, 1024), (256, 64, 256),
    ),
) -> jnp.ndarray:
    """Spectral-convergence + log-magnitude L1 over several STFT resolutions
    (standard neural-vocoder auxiliary loss; trains without discriminators)."""
    from ..ops.stft import power_spectrogram

    loss = 0.0
    for n_fft, hop, win in resolutions:
        sp = jnp.sqrt(power_spectrogram(wav_pred, n_fft, hop, win) + 1e-9)
        st = jnp.sqrt(power_spectrogram(wav_true, n_fft, hop, win) + 1e-9)
        sc = jnp.linalg.norm(st - sp) / jnp.maximum(jnp.linalg.norm(st), 1e-9)
        mag = jnp.mean(jnp.abs(jnp.log(st) - jnp.log(sp)))
        loss = loss + sc + mag
    return loss / len(resolutions)


def mel_l1_loss(
    wav_pred: jnp.ndarray, wav_true: jnp.ndarray, sr: int,
    n_fft: int, hop: int, n_mels: int,
) -> jnp.ndarray:
    from ..ops.stft import log_mel_spectrogram

    mp = log_mel_spectrogram(wav_pred, sr, n_fft, hop, n_mels=n_mels)
    mt = log_mel_spectrogram(wav_true, sr, n_fft, hop, n_mels=n_mels)
    return jnp.mean(jnp.abs(mp - mt))
