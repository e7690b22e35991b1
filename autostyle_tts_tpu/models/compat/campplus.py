"""CAM++ speaker-embedding compat (campplus.onnx) via graph execution.

The CosyVoice release embeds timbre wavs with campplus.onnx, a CAM++
D-TDNN export the reference ran under ONNX Runtime (SURVEY §2.3.1 "Speaker
embedding" row; upstream call: kaldi fbank(80, 16 kHz, dither 0) ->
mean-normalize over time -> campplus -> 192-d x-vector). Unlike the
whisper-named speech tokenizer, the D-TDNN export's initializer names are
not blind-reconstructible into a rule table — so this compat does not
guess: it executes the graph itself through `ops/onnx_exec.OnnxRunner`,
which traces every node to jax/XLA once and serves it as ONE jitted
program. Zero name assumptions; works for any campplus-shaped export whose
ops are in the executor's table (the convert CLI reports the op histogram
and anything unsupported).

The fbank frontend here implements the exact kaldi algorithm from spec
with the framework's GEMM-DFT pieces (ops/stft): preemphasis 0.97,
25 ms/10 ms povey-windowed frames (snip edges, per-frame DC removal),
512-bin left-aligned DFT, kaldi mel banks (triangles linear in the MEL
domain, nyquist excluded), natural log with the FLT_EPSILON floor,
per-utterance mean subtraction, float wav consumed UNSCALED (the
torchaudio.compliance.kaldi convention upstream uses — NOT kaldi's int16
range). The env has no torchaudio to diff against (docs/WEIGHTS.md);
instead tests/test_onnx_exec.py::test_kaldi_fbank_matches_cleanroom_reference
checks it against an independent float64 np.fft implementation written
directly from the kaldi sources' algorithm — agreement to float32
tolerance including floor-bound silent frames. The model half is exact
graph execution, so frontend spec-compliance is the whole parity story.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import onnx_exec
from ...ops.stft import frame_signal
from ...utils.onnx_load import OnnxGraph, load_onnx_graph

SAMPLE_RATE = 16000
FRAME_LEN = 400          # 25 ms
HOP = 160                # 10 ms
N_FFT = 512              # kaldi rounds the window up to the next pow2
N_MELS = 80


def _povey(n: int) -> np.ndarray:
    """Kaldi's povey window = hann^0.85."""
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))
    return (hann ** 0.85).astype(np.float32)


@lru_cache(maxsize=None)
def _mel_kaldi(sr: int, n_fft: int, n_mels: int, fmin: float = 20.0,
               fmax: Optional[float] = None) -> np.ndarray:
    """Kaldi triangular mel bank [n_bins, n_mels] (mel.cc semantics, peak-1):
    triangles are linear IN THE MEL DOMAIN — weight = (mel(f)-left_mel)/
    (center_mel-left_mel) — not in Hz (the librosa/HTK-tool convention this
    module used before round 3; Hz-linear triangles disagree by up to ~0.2
    in the low log-fbank bins, tests/test_cosy_compat.py clean-room check).
    The nyquist bin carries zero weight: kaldi iterates fft bins
    0..n_fft/2-1 only (torchaudio.compliance pads the last column with 0)."""
    fmax = fmax or sr / 2.0
    n_bins = n_fft // 2 + 1

    def to_mel(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)

    mlo, mhi = to_mel(fmin), to_mel(fmax)
    mel_freqs = to_mel(np.arange(n_fft // 2) * sr / float(n_fft))
    delta = (mhi - mlo) / (n_mels + 1)
    fb = np.zeros((n_bins, n_mels), np.float64)
    for m in range(n_mels):
        left, center, right = mlo + m * delta, mlo + (m + 1) * delta, mlo + (m + 2) * delta
        up = (mel_freqs - left) / (center - left)
        down = (right - mel_freqs) / (right - center)
        fb[: n_fft // 2, m] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


@lru_cache(maxsize=None)
def _fbank_basis():
    """(cos, sin) windowed DFT basis [FRAME_LEN, n_bins] with the povey
    window folded in (frames are NOT zero-centred in the 512 frame — kaldi
    left-aligns and zero-pads the tail)."""
    n_bins = N_FFT // 2 + 1
    w = _povey(FRAME_LEN)
    t = np.arange(FRAME_LEN)
    k = np.arange(n_bins)
    ang = 2.0 * np.pi * np.outer(t, k) / N_FFT
    cos = (np.cos(ang) * w[:, None]).astype(np.float32)
    sin = (-np.sin(ang) * w[:, None]).astype(np.float32)
    return cos, sin


@jax.jit
def kaldi_fbank(wav16: jnp.ndarray) -> jnp.ndarray:
    """[T] 16 kHz float wav -> [n_frames, 80] mean-normalized log-fbank
    (kaldi conventions: snip edges, per-frame DC removal, preemphasis 0.97,
    povey window, natural log; dither 0 as the upstream frontend sets).
    Jitted: ONE program per wav length instead of ~6 eager dispatches (each
    extra submission costs a tunnel RTT on this repo's device)."""
    # NO int16 rescale: upstream feeds torchaudio.compliance.kaldi.fbank the
    # float [-1,1] wav as-is. A global scale would cancel under the CMN below
    # EXCEPT where the log floor binds (quiet low-mel bins) — scaling by
    # 32768 shifted those frames by up to ~0.2 log units vs upstream.
    x = jnp.asarray(wav16, jnp.float32)
    frames = frame_signal(x, FRAME_LEN, HOP)        # [F, 400], snip edges
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    pre = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=-1)
    frames = frames - 0.97 * pre
    cos_b, sin_b = _fbank_basis()
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    power = re * re + im * im
    mel = power @ jnp.asarray(_mel_kaldi(SAMPLE_RATE, N_FFT, N_MELS))
    feat = jnp.log(jnp.maximum(mel, 1.1921e-07))    # kaldi's FLT_EPSILON
    return feat - jnp.mean(feat, axis=0, keepdims=True)   # upstream CMN


class CampPlusCompat:
    """Graph-executed campplus.onnx -> x-vector. Input convention follows
    the upstream frontend: feeds [1, n_frames, 80] mean-normalized fbank to
    the graph's (single) input; returns the first output flattened."""

    def __init__(self, graph_or_bytes):
        graph = (
            graph_or_bytes if isinstance(graph_or_bytes, OnnxGraph)
            else load_onnx_graph(graph_or_bytes)
        )
        if len(graph.inputs) != 1:
            raise ValueError(
                f"campplus graph: expected one input, got {graph.inputs}"
            )
        self.graph = graph
        self.runner = onnx_exec.OnnxRunner(graph)
        # optional frame-count buckets: one compile per bucket instead of
        # one per utterance length (tail pad repeats the last frame, which
        # slightly biases the stats pooling — exact length is the default)
        self.frame_buckets = (100, 200, 300, 500, 800, 1200, 2000)

    @property
    def input_name(self) -> str:
        return self.graph.inputs[0]

    def embed_fbank(self, feat: jnp.ndarray) -> np.ndarray:
        """[n_frames, 80] -> [emb_dim] (no padding — exact frame count)."""
        out = self.runner({self.input_name: feat[None]})[0]
        return np.asarray(out).reshape(-1)

    def embed_wav16(self, wav16: np.ndarray, bucket: bool = False) -> np.ndarray:
        """16 kHz wav -> x-vector, fbank + graph in one shot. bucket=True
        pads the frame count to the bucket family (fewer compiles when
        embedding many prompts; CMN still runs on the real frames only)."""
        wav16 = np.asarray(wav16).reshape(-1)
        if wav16.size < FRAME_LEN:
            raise ValueError(
                f"speaker prompt too short: {wav16.size} samples < one "
                f"{FRAME_LEN}-sample (25 ms @ 16 kHz) analysis frame"
            )
        feat = kaldi_fbank(jnp.asarray(wav16))
        n = feat.shape[0]
        if bucket:
            w = next((b for b in self.frame_buckets if b >= n), None)
            if w is not None and w != n:
                feat = jnp.concatenate(
                    [feat,
                     jnp.broadcast_to(feat[-1:], (w - n, feat.shape[1]))],
                    axis=0,
                )
        return self.embed_fbank(feat)
