"""GEMM-native mel/STFT frontend.

Replaces torchaudio/librosa C++ DSP (SURVEY §2.3.1 "Mel/STFT frontend").
TPU-first design: the DFT is not an FFT here — it is two matmuls that land on
the MXU (frames @ [window*cos|sin] basis, power, @ mel filterbank), following
the GEMM-native NDFT formulation (PAPERS.md: MelT). At n_fft<=1024 the matmul
form beats host FFT round-trips and fuses with downstream encoder layers
under one jit.

All functions are shape-static and jittable; a numpy mirror backs the tests.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------- bases (host, cached)


@functools.lru_cache(maxsize=None)
def _dft_basis(n_fft: int, win_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT basis: returns (cos, sin) each [win_length, n_bins],
    already multiplied by a periodic Hann window and zero-centred inside the
    n_fft frame (matches np.fft.rfft of the zero-padded windowed frame)."""
    n_bins = n_fft // 2 + 1
    window = _hann(win_length)
    # sample positions of the win_length window inside the n_fft frame (centered)
    pad = (n_fft - win_length) // 2
    t = np.arange(win_length) + pad
    k = np.arange(n_bins)
    ang = 2.0 * np.pi * np.outer(t, k) / n_fft
    cos = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin = (-np.sin(ang) * window[:, None]).astype(np.float32)
    return cos, sin


def _hann(n: int) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window(periodic=True))."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: Optional[float] = None
) -> np.ndarray:
    """Slaney-style triangular mel filterbank [n_bins, n_mels] (area-normed)."""
    fmax = fmax or sr / 2.0
    n_bins = n_fft // 2 + 1

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        min_log_hz, min_log_mel, logstep = 1000.0, 15.0, np.log(6.4) / 27.0
        lin = 3.0 * f / 200.0
        return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, lin)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        min_log_hz, min_log_mel, logstep = 1000.0, 15.0, np.log(6.4) / 27.0
        lin = 200.0 * m / 3.0
        return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), lin)

    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    fb = np.zeros((n_bins, n_mels), dtype=np.float64)
    for m in range(n_mels):
        lo, c, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(c - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - c, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    # slaney area normalisation
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    fb *= enorm[None, :]
    return fb.astype(np.float32)


# ----------------------------------------------------------------------- framing


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """[..., T] -> [..., n_frames, frame_length] strided frames. Callers apply
    any center padding explicitly (the librosa convention pads by n_fft//2,
    which this function cannot know when frame_length == win_length < n_fft —
    see power_spectrogram / log_mel_spectrogram)."""
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_length)[None, :]
    return x[..., idx]


def num_frames(
    t: int, n_fft: int, hop: int, win_length: Optional[int] = None, center: bool = True
) -> int:
    win_length = win_length or n_fft
    if center:
        t = t + 2 * (n_fft // 2)
    return 1 + (t - win_length) // hop


# ----------------------------------------------------------------------- spectrogram / mel


def power_spectrogram(
    x: jnp.ndarray, n_fft: int, hop: int, win_length: Optional[int] = None,
    center: bool = True,
) -> jnp.ndarray:
    """[..., T] -> [..., n_frames, n_bins] power spectrogram via matmul DFT."""
    win_length = win_length or n_fft
    cos_b, sin_b = _dft_basis(n_fft, win_length)
    if center:  # librosa/torch convention: reflect-pad n_fft//2 each side
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(x, win_length, hop)  # windowing folded into basis
    cos_j = jnp.asarray(cos_b)
    sin_j = jnp.asarray(sin_b)
    re = jnp.matmul(frames, cos_j, preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, sin_j, preferred_element_type=jnp.float32)
    return re * re + im * im


def log_mel_spectrogram(
    x: jnp.ndarray,
    sr: int,
    n_fft: int,
    hop: int,
    win_length: Optional[int] = None,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    center: bool = True,
    eps: float = 1e-5,
    impl: str = "xla",          # "xla" | "pallas" (fused kernel, TPU)
) -> jnp.ndarray:
    """[..., T] -> [..., n_frames, n_mels] natural-log mel spectrogram.

    impl="pallas" fuses DFT matmul -> power -> mel matmul -> log in one VMEM
    kernel (the [T, n_bins] power spectrogram never hits HBM); numerics match
    the XLA path (tests/test_quant_pallas.py)."""
    win_length = win_length or n_fft
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    if impl == "pallas":
        from .pallas_mel import fused_log_mel

        cos_b, sin_b = _dft_basis(n_fft, win_length)
        if center:
            pad = n_fft // 2
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
        frames = frame_signal(x, win_length, hop)
        lead = frames.shape[:-2]
        f3 = frames.reshape((-1,) + frames.shape[-2:])
        out = fused_log_mel(
            f3, jnp.asarray(cos_b), jnp.asarray(sin_b), fb, eps=eps,
            interpret=jax.default_backend() == "cpu",
        )
        return out.reshape(lead + out.shape[-2:])
    spec = power_spectrogram(x, n_fft, hop, win_length, center)
    mel = jnp.matmul(spec, fb, preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(mel, eps))


# ----------------------------------------------------------------------- numpy mirror (tests)


def log_mel_spectrogram_np(
    x: np.ndarray, sr: int, n_fft: int, hop: int, win_length: Optional[int] = None,
    n_mels: int = 80, fmin: float = 0.0, fmax: Optional[float] = None,
    center: bool = True, eps: float = 1e-5,
) -> np.ndarray:
    """Ground-truth mirror using np.fft.rfft, for parity tests."""
    win_length = win_length or n_fft
    window = _hann(win_length)
    if center:
        p = n_fft // 2
        x = np.pad(x, (p, p), mode="reflect")
    n_frames = 1 + (len(x) - win_length) // hop
    pad = (n_fft - win_length) // 2
    spec = np.empty((n_frames, n_fft // 2 + 1), dtype=np.float64)
    for i in range(n_frames):
        fr = x[i * hop : i * hop + win_length] * window
        full = np.zeros(n_fft)
        full[pad : pad + win_length] = fr
        f = np.fft.rfft(full)
        spec[i] = np.abs(f) ** 2
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    return np.log(np.maximum(spec @ fb, eps)).astype(np.float32)


# ----------------------------------------------------------------------- iSTFT (GEMM-native)


@functools.lru_cache(maxsize=None)
def _istft_basis(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse real-DFT synthesis basis (cos, -sin), each [n_bins, n_fft],
    with Hermitian weights (a_k = 2 except DC/Nyquist), 1/N normalization and
    the periodic-Hann synthesis window folded in."""
    n_bins = n_fft // 2 + 1
    w = _hann(n_fft)
    a = np.full(n_bins, 2.0)
    a[0] = 1.0
    if n_fft % 2 == 0:
        a[-1] = 1.0
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    cos = (a[:, None] * np.cos(ang) / n_fft * w[None, :]).astype(np.float32)
    msin = (-a[:, None] * np.sin(ang) / n_fft * w[None, :]).astype(np.float32)
    return cos, msin


@functools.lru_cache(maxsize=None)
def _ola_envelope(n_frames: int, n_fft: int, hop: int) -> np.ndarray:
    """Overlap-added squared-window normalization envelope [(F+R-1)*hop]."""
    w2 = _hann(n_fft) ** 2
    r = n_fft // hop
    out = np.zeros((n_frames + r - 1) * hop, np.float32)
    for f in range(n_frames):
        out[f * hop : f * hop + n_fft] += w2
    return out


def istft_overlap_add(
    spec_r: jnp.ndarray,   # [..., F, n_bins] real part
    spec_i: jnp.ndarray,   # [..., F, n_bins] imag part
    n_fft: int,
    hop: int,
) -> jnp.ndarray:
    """Standard iSTFT (Hann synthesis window, sum-w^2 normalization) as two
    MXU matmuls + R=n_fft/hop shifted adds -> [..., F*hop] samples.

    The frame->sample expansion is ONE GEMM ([F, n_bins] @ [n_bins, n_fft])
    instead of a ConvTranspose upsampling stack — the TPU-native vocoder
    output path (SURVEY §2.3.1 vocoder row). Output sample i sits at
    overlap-add buffer offset i + (n_fft - hop)/2, so frame f is centred on
    output block f (exactly hop samples per frame; the engine's frame<->
    sample crop invariant holds)."""
    assert n_fft % hop == 0, (n_fft, hop)
    r_chunks = n_fft // hop
    F = spec_r.shape[-2]
    cos_b, msin_b = _istft_basis(n_fft)
    frames = (
        jnp.matmul(spec_r, jnp.asarray(cos_b), preferred_element_type=jnp.float32)
        + jnp.matmul(spec_i, jnp.asarray(msin_b), preferred_element_type=jnp.float32)
    )                                                     # [..., F, n_fft]
    lead = frames.shape[:-2]
    L = (F + r_chunks - 1) * hop
    out = jnp.zeros(lead + (L,), jnp.float32)
    for r in range(r_chunks):
        seg = frames[..., :, r * hop : (r + 1) * hop].reshape(lead + (F * hop,))
        out = out.at[..., r * hop : r * hop + F * hop].add(seg)
    env = jnp.asarray(_ola_envelope(F, n_fft, hop))
    out = out / jnp.maximum(env, 1e-8)
    start = (n_fft - hop) // 2
    return out[..., start : start + F * hop]
