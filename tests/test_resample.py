"""Polyphase resampler: JAX conv path vs numpy mirror vs scipy, plus the
reference's rate pairs (22050<->16000, tts_with_rag.py:137; ->24000 output)."""

import jax.numpy as jnp
import numpy as np
import pytest

from autostyle_tts_tpu.ops.resample import resample, resample_poly_np


def _tone(sr, seconds=0.25, f=440.0):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * f * t).astype(np.float32)


@pytest.mark.parametrize(
    "sr_in,sr_out",
    [(22050, 16000), (16000, 22050), (16000, 24000), (24000, 16000), (22050, 24000)],
)
def test_jax_matches_np_mirror(sr_in, sr_out):
    x = _tone(sr_in)
    y_jax = np.asarray(resample(jnp.asarray(x), sr_in, sr_out))
    y_np = resample_poly_np(x, sr_in, sr_out)
    assert y_jax.shape == y_np.shape
    np.testing.assert_allclose(y_jax, y_np, rtol=1e-4, atol=1e-4)


def test_matches_scipy_resample_poly():
    scipy_signal = pytest.importorskip("scipy.signal")
    x = _tone(16000, 0.5)
    ours = resample_poly_np(x, 16000, 24000)
    ref = scipy_signal.resample_poly(x, 3, 2).astype(np.float32)
    n = min(len(ours), len(ref))
    # interior comparison (edge handling differs slightly)
    sl = slice(200, n - 200)
    err = np.abs(ours[sl] - ref[sl]).max()
    assert err < 5e-3


def test_tone_preserved():
    sr_in, sr_out, f = 16000, 24000, 440.0
    x = _tone(sr_in, 0.5, f)
    y = np.asarray(resample(jnp.asarray(x), sr_in, sr_out))
    # measure dominant frequency of resampled signal
    spec = np.abs(np.fft.rfft(y[1000:-1000] * np.hanning(len(y) - 2000)))
    freqs = np.fft.rfftfreq(len(y) - 2000, 1 / sr_out)
    assert abs(freqs[spec.argmax()] - f) < 5.0


def test_identity():
    x = _tone(16000)
    y = resample(jnp.asarray(x), 16000, 16000)
    np.testing.assert_array_equal(np.asarray(y), x)


def test_batched():
    x = np.stack([_tone(16000), _tone(16000, f=880)])
    y = resample(jnp.asarray(x), 16000, 24000)
    assert y.shape == (2, int(np.ceil(x.shape[1] * 3 / 2)))
