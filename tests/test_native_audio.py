"""Native C++ audio data plane vs the Python reference paths."""

import numpy as np
import pytest

from autostyle_tts_tpu.ops.resample import resample_poly_np
from autostyle_tts_tpu.utils import native_audio
from autostyle_tts_tpu.utils.audio_io import read_wav, write_wav

pytestmark = pytest.mark.skipif(
    not native_audio.available(), reason="native toolchain unavailable"
)


def _tone(sr, seconds=0.5, f=440.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    return (0.4 * np.sin(2 * np.pi * f * t) + 0.01 * rng.standard_normal(len(t))).astype(
        np.float32
    )


def test_native_wav_decode_matches_python(tmp_path):
    x = _tone(22050)
    p = tmp_path / "t.wav"
    write_wav(p, x, 22050)
    nx, nsr = native_audio.read_wav_native(str(p))
    px, psr = read_wav(p)
    assert nsr == psr == 22050
    np.testing.assert_allclose(nx, px, atol=1e-6)


def test_native_resample_bitmatches_python():
    x = _tone(22050)
    ours = native_audio.resample_native(x, 22050, 16000)
    ref = resample_poly_np(x, 22050, 16000)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_native_batch_loader(tmp_path):
    paths = []
    for i in range(6):
        x = _tone(22050, seconds=0.2 + 0.1 * i, f=200 + 50 * i, seed=i)
        p = tmp_path / f"w{i}.wav"
        write_wav(p, x, 22050)
        paths.append(str(p))
    stride = 16000
    batch, lengths, status = native_audio.load_batch_native(
        paths, target_sr=16000, expect_sr=22050, stride=stride, n_threads=4
    )
    assert (status == 0).all()
    assert batch.shape == (6, stride)
    for i, p in enumerate(paths):
        x, _ = read_wav(p)
        ref = resample_poly_np(x, 22050, 16000)
        m = min(len(ref), stride)
        assert lengths[i] == m
        np.testing.assert_allclose(batch[i, :m], ref[:m], atol=1e-5)
        np.testing.assert_allclose(batch[i, m:], 0.0)


def test_native_batch_mixed_rates(tmp_path):
    """target-rate files are copied verbatim; unexpected rates error."""
    w16 = tmp_path / "w16.wav"
    write_wav(w16, _tone(16000), 16000)
    w8 = tmp_path / "w8.wav"
    write_wav(w8, _tone(8000), 8000)
    batch, lengths, status = native_audio.load_batch_native(
        [str(w16), str(w8)], target_sr=16000, expect_sr=22050, stride=8000
    )
    assert status[0] == 0 and lengths[0] == 8000
    assert status[1] != 0 and lengths[1] == 0


def test_load_wav_fast_fallback(tmp_path):
    p = tmp_path / "t.wav"
    write_wav(p, _tone(22050), 22050)
    y = native_audio.load_wav_fast(str(p), 16000)
    ref = resample_poly_np(read_wav(p)[0], 22050, 16000)
    np.testing.assert_allclose(y, ref, atol=1e-5)
