"""Mel/STFT parity vs np.fft ground truth (SURVEY §4: 'mel frontend vs scipy
reference')."""

import jax.numpy as jnp
import numpy as np
import pytest

from autostyle_tts_tpu.ops import stft


def _sig(n=4000, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.3 * np.sin(2 * np.pi * 1333 * t)
        + 0.05 * rng.standard_normal(n)
    )
    return x.astype(np.float32)


@pytest.mark.parametrize(
    "n_fft,hop,win", [(400, 160, 400), (512, 128, 512), (1024, 480, 1024)]
)
def test_logmel_matches_fft_reference(n_fft, hop, win):
    x = _sig()
    ours = np.asarray(
        stft.log_mel_spectrogram(jnp.asarray(x), 16000, n_fft, hop, win, n_mels=80)
    )
    ref = stft.log_mel_spectrogram_np(x, 16000, n_fft, hop, win, n_mels=80)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_win_shorter_than_nfft():
    x = _sig(2000)
    ours = np.asarray(
        stft.log_mel_spectrogram(jnp.asarray(x), 16000, 512, 160, 400, n_mels=40)
    )
    ref = stft.log_mel_spectrogram_np(x, 16000, 512, 160, 400, n_mels=40)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_batched_shapes():
    x = np.stack([_sig(3200, seed=i) for i in range(3)])
    mel = stft.log_mel_spectrogram(jnp.asarray(x), 16000, 400, 160, n_mels=80)
    assert mel.shape == (3, stft.num_frames(3200, 400, 160), 80)


def test_pure_tone_peaks_at_expected_mel_bin():
    sr, f0 = 16000, 1000.0
    t = np.arange(8000) / sr
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    mel = np.asarray(
        stft.log_mel_spectrogram(jnp.asarray(x), sr, 512, 160, n_mels=80)
    )
    avg = mel.mean(axis=0)
    peak = int(avg.argmax())
    fb = stft.mel_filterbank(sr, 512, 80)
    freqs = np.linspace(0, sr / 2, 512 // 2 + 1)
    center = freqs[fb[:, peak].argmax()]
    assert abs(center - f0) < 150.0
