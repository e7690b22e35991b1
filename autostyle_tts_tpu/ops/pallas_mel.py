"""Pallas fused log-mel kernel: frames -> windowed DFT -> power -> mel -> log
in ONE kernel, so the [T, n_bins] power spectrogram never round-trips HBM.

Complements ops/stft.py's GEMM-native formulation (PAPERS.md MelT): the XLA
path materializes the power spectrogram between its two matmuls; here both
matmuls and the elementwise square/log run back-to-back in VMEM. Grid over
frame blocks; the DFT bases + mel filterbank stay resident per program.

Used by ops.stft.log_mel_spectrogram(impl="pallas") on TPU; parity-tested in
interpret mode on CPU against the XLA path and the np.fft ground truth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mel_kernel(frames_ref, cos_ref, sin_ref, fb_ref, out_ref, *, eps: float):
    frames = frames_ref[0].astype(jnp.float32)           # [BT, win]
    re = jnp.dot(frames, cos_ref[...], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[...], preferred_element_type=jnp.float32)
    power = re * re + im * im                            # [BT, n_bins] in VMEM
    mel = jnp.dot(power, fb_ref[...], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(jnp.maximum(mel, eps))


@functools.partial(
    jax.jit, static_argnames=("block_t", "eps", "interpret")
)
def fused_log_mel(
    frames: jnp.ndarray,     # [B, T, win] framed signal (window folded in bases)
    cos_b: jnp.ndarray,      # [win, n_bins]
    sin_b: jnp.ndarray,
    fb: jnp.ndarray,         # [n_bins, n_mels]
    block_t: int = 128,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> [B, T, n_mels] natural-log mel. T padded up to block_t internally."""
    B, T, win = frames.shape
    n_mels = fb.shape[1]
    T_pad = -(-T // block_t) * block_t
    if T_pad != T:
        frames = jnp.pad(frames, ((0, 0), (0, T_pad - T), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_mel_kernel, eps=eps),
        grid=(B, T_pad // block_t),
        in_specs=[
            pl.BlockSpec(
                (1, block_t, win), lambda b, tb: (b, tb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(cos_b.shape, lambda b, tb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sin_b.shape, lambda b, tb: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fb.shape, lambda b, tb: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_t, n_mels), lambda b, tb: (b, tb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, n_mels), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T_pad * win * cos_b.shape[1] * 2
            + 2 * B * T_pad * cos_b.shape[1] * n_mels,
            bytes_accessed=frames.size * 4 + (cos_b.size + sin_b.size + fb.size) * 4
            + B * T_pad * n_mels * 4,
            transcendentals=B * T_pad * n_mels,
        ),
    )(frames, cos_b, sin_b, fb)
    return out[:, :T]
