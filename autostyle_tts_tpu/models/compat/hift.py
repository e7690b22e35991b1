"""HiFT/NSF vocoder compat: converted hift.pt -> 22.05 kHz waveform.

The CosyVoice-300M hift.pt holds an NSF-HiFiGAN ("HiFT") generator
(SURVEY §2.3.1 "Vocoder" row): an f0 predictor over mel, a harmonic-plus-
noise source module whose sine excitation is STFT-analyzed and fused into
every upsampling stage, ConvTranspose upsampling with multi-receptive-field
resblocks, and an iSTFT head (conv_post emits n_fft/2+1 log-magnitudes and
as many phase channels; n_fft=16, hop=4 by default).

JAX/TPU notes: channels-last convs (MXU); the sine source's phase cumsum is
a single associative-scan-friendly op; the head reuses the GEMM iSTFT
(ops/stft.istft_overlap_add) instead of torch.istft. Weight-normed torch
convs arrive pre-materialized (fuse_op="weight_norm" in the rule tables).
All weights converted by utils/cosyvoice_convert.RULESETS["hift.pt"].

Best-effort topology from the documented upstream architecture; the f0
predictor uses SAME padding (upstream's even-kernel padding produces +1
frame it later interpolates away) — recorded divergence. Unvalidated
against real release files (zero-egress env, docs/WEIGHTS.md).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.conv import conv1d, conv_transpose1d
from ...ops.stft import _dft_basis, frame_signal, istft_overlap_add

Params = Dict


@dataclass(frozen=True)
class HiFTConfig:
    n_mels: int = 80
    sampling_rate: int = 22050
    upsample_rates: Tuple[int, ...] = (8, 8)
    upsample_kernels: Tuple[int, ...] = (16, 16)
    resblock_kernels: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    source_resblock_kernels: Tuple[int, ...] = (7, 11)
    source_resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5))
    istft_n_fft: int = 16
    istft_hop: int = 4
    nb_harmonics: int = 8
    sine_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 10.0

    @property
    def samples_per_frame(self) -> int:
        out = self.istft_hop
        for r in self.upsample_rates:
            out *= r
        return out


def infer_config(tree: Params, n_mels: int = 80) -> HiFTConfig:
    """Read kernel geometry off a converted tree (rates/kernels from the
    ConvTranspose weights; resblock kernels/dilations keep defaults — the
    dilation schedule is not recoverable from shapes)."""
    ups = [tree["ups"][k] for k in sorted(tree["ups"], key=int)]
    kernels = tuple(u["w"].shape[0] for u in ups)
    # upstream convention k = 2*rate
    rates = tuple(k // 2 for k in kernels)
    n_bins = tree["conv_post"]["w"].shape[2] // 2
    n_fft = 2 * (n_bins - 1)
    rk = []
    rd = []
    for k in sorted(tree["resblocks"], key=int):
        c1 = tree["resblocks"][k]["convs1"]
        rk.append(c1["0"]["w"].shape[0])
        rd.append(tuple((1, 3, 5)[: len(c1)]))
    n_up = len(rates)
    n_res = len(rk) // n_up if n_up else len(rk)
    srk = []
    srd = []
    for k in sorted(tree.get("source_resblocks", {}), key=int):
        c1 = tree["source_resblocks"][k]["convs1"]
        srk.append(c1["0"]["w"].shape[0])
        srd.append((1, 3, 5)[: len(c1)])
    return HiFTConfig(
        n_mels=n_mels,
        nb_harmonics=tree["m_source"]["l_linear"]["w"].shape[0] - 1,
        upsample_rates=rates,
        upsample_kernels=kernels,
        resblock_kernels=tuple(rk[:n_res]),
        resblock_dilations=tuple(rd[:n_res]),
        source_resblock_kernels=tuple(srk),
        source_resblock_dilations=tuple(srd),
        istft_n_fft=n_fft,
        istft_hop=n_fft // 4,
    )


# ------------------------------------------------------------------ source module


def f0_predict(tree: Params, mel: jnp.ndarray) -> jnp.ndarray:
    """ConvRNNF0Predictor: weight-normed conv+ELU stack + linear classifier
    -> |f0| per mel frame [B, F]."""
    h = mel
    for p in [tree["condnet"][k] for k in sorted(tree["condnet"], key=int)]:
        h = jax.nn.elu(conv1d(h, p))
    f0 = h @ tree["classifier"]["w"] + tree["classifier"]["b"]
    return jnp.abs(f0[..., 0])


def harmonic_source(
    tree: Params,
    cfg: HiFTConfig,
    key: jax.Array,
    f0_up: jnp.ndarray,        # [B, T_samples] f0 upsampled to sample rate
) -> jnp.ndarray:
    """SourceModuleHnNSF: per-harmonic sines (phase = cumsum of inst. freq,
    random initial phase for overtones), voiced/unvoiced gating + noise,
    merged by l_linear + tanh -> [B, T_samples] excitation."""
    B, T = f0_up.shape
    H = cfg.nb_harmonics + 1
    k1, k2 = jax.random.split(key)
    mult = jnp.arange(1, H + 1, dtype=jnp.float32)[None, None, :]
    rad = (f0_up[..., None] * mult) / cfg.sampling_rate      # [B, T, H]
    # random initial phase for overtones (fundamental starts at 0)
    init = jax.random.uniform(k1, (B, 1, H)) * 2 * jnp.pi
    init = init.at[:, :, 0].set(0.0)
    phase = 2 * jnp.pi * jnp.cumsum(rad, axis=1) + init
    sines = cfg.sine_amp * jnp.sin(phase)
    uv = (f0_up > cfg.voiced_threshold).astype(jnp.float32)[..., None]
    noise_amp = uv * cfg.noise_std + (1 - uv) * cfg.sine_amp / 3.0
    noise = noise_amp * jax.random.normal(k2, sines.shape)
    waves = uv * sines + noise                               # [B, T, H]
    merged = waves @ tree["l_linear"]["w"] + tree["l_linear"]["b"]
    return jnp.tanh(merged[..., 0])


def _stft_ri(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Real STFT (center-padded, Hann) -> [B, F, 2*(n_fft/2+1)] with real
    parts then imaginary parts stacked on channels (torch.stft layout after
    the upstream cat([real, imag], dim=1), transposed channels-last)."""
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(xp, n_fft, hop)                    # [B, F, n_fft]
    # _dft_basis returns [win, n_bins] with the Hann window folded in and
    # sin already negated (rfft convention)
    cos_b, sin_b = _dft_basis(n_fft, n_fft)
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    return jnp.concatenate([re, im], axis=-1)


def _resblock(x, p, kernel: int, dilations) -> jnp.ndarray:
    for i, d in enumerate(dilations):
        h = jax.nn.leaky_relu(x, 0.1)
        h = conv1d(h, p["convs1"][str(i)], dilation=d)
        h = jax.nn.leaky_relu(h, 0.1)
        h = conv1d(h, p["convs2"][str(i)])
        x = x + h
    return x


def apply(
    tree: Params,
    cfg: HiFTConfig,
    mel: jnp.ndarray,           # [B, F, n_mels]
    key: jax.Array,
) -> jnp.ndarray:
    """mel -> waveform [B, F * samples_per_frame] (iSTFT head)."""
    B, F, _ = mel.shape
    up_total = 1
    for r in cfg.upsample_rates:
        up_total *= r

    f0 = f0_predict(tree["f0_predictor"], mel)               # [B, F]
    spf = cfg.samples_per_frame
    f0_up = jnp.repeat(f0, spf, axis=1)                      # nearest upsample
    s = harmonic_source(tree["m_source"], cfg, key, f0_up)   # [B, F*spf]
    s_stft = _stft_ri(s, cfg.istft_n_fft, cfg.istft_hop)     # [B, F*up+1, 18]

    x = conv1d(mel, tree["conv_pre"])
    n_up = len(cfg.upsample_rates)
    for i in range(n_up):
        x = jax.nn.leaky_relu(x, 0.1)
        x = conv_transpose1d(
            x, tree["ups"][str(i)], stride=cfg.upsample_rates[i],
            kernel=cfg.upsample_kernels[i],
        )
        if i == n_up - 1:
            # upstream ReflectionPad1d((1, 0)) so x matches the center-
            # padded source STFT's +1 frame
            x = jnp.concatenate([x[:, 1:2], x], axis=1)
        # source fusion at this stage's rate
        stride = 1
        for r in cfg.upsample_rates[i + 1:]:
            stride *= r
        sd = tree["source_downs"][str(i)]
        if stride == 1:
            si = conv1d(s_stft, sd)
        else:
            k = sd["w"].shape[0]
            si = conv1d(s_stft, sd, stride=stride,
                        padding=(stride // 2, stride // 2))
            si = si[:, : x.shape[1]]
        si = _resblock(
            si, tree["source_resblocks"][str(i)],
            cfg.source_resblock_kernels[i], cfg.source_resblock_dilations[i],
        )
        x = x + si[:, : x.shape[1]]
        acc = None
        nk = len(cfg.resblock_kernels)
        for j, (kern, dils) in enumerate(
            zip(cfg.resblock_kernels, cfg.resblock_dilations)
        ):
            r = _resblock(x, tree["resblocks"][str(i * nk + j)], kern, dils)
            acc = r if acc is None else acc + r
        x = acc / nk
    x = jax.nn.leaky_relu(x)
    x = conv1d(x, tree["conv_post"])                          # [B, T, n_fft+2]
    n_bins = cfg.istft_n_fft // 2 + 1
    mag = jnp.exp(jnp.clip(x[..., :n_bins], -20.0, jnp.log(1e2)))
    phase = jnp.sin(x[..., n_bins:])     # upstream predicts sin(phase)
    spec_r = mag * jnp.cos(phase)
    spec_i = mag * jnp.sin(phase)
    wav = istft_overlap_add(spec_r, spec_i, cfg.istft_n_fft, cfg.istft_hop)
    wav = jnp.clip(wav, -0.99, 0.99)
    # drop the reflection-pad extra frame's samples; return F*spf samples
    return wav[:, : F * spf]
