"""iSTFT-kind (Vocos-class) vocoder: GEMM iSTFT correctness, generator,
engine integration and trainability. SURVEY §2.3.1 vocoder row — the
TPU-native alternative to the ConvTranspose HiFi-GAN topology."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from autostyle_tts_tpu.models import vocoder
from autostyle_tts_tpu.ops.stft import _hann, istft_overlap_add
from autostyle_tts_tpu.utils.config import VocoderConfig, tiny_config


def test_istft_overlap_add_reconstructs_stft():
    """iSTFT of a forward STFT recovers the signal (COLA, interior exact)."""
    n_fft, hop = 256, 64
    sr = 2400
    t = np.arange(hop * 40) / sr
    x = (
        0.5 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 730 * t)
    ).astype(np.float32)
    w = _hann(n_fft)
    pad = (n_fft - hop) // 2
    xp = np.pad(x, (pad, pad + n_fft))
    F = len(x) // hop
    S = np.stack(
        [np.fft.rfft(xp[f * hop : f * hop + n_fft] * w) for f in range(F)]
    )
    got = np.asarray(
        istft_overlap_add(
            jnp.asarray(S.real[None], jnp.float32),
            jnp.asarray(S.imag[None], jnp.float32),
            n_fft, hop,
        )
    )[0]
    assert got.shape == x.shape
    np.testing.assert_allclose(
        got[n_fft:-n_fft], x[n_fft:-n_fft], atol=1e-3
    )


def _tiny_istft_cfg():
    return VocoderConfig(
        n_mels=16, kind="istft", istft_hop=32, istft_n_fft=128,
        istft_channels=64, istft_blocks=2,
    )


def test_istft_generator_shapes_and_upsample():
    cfg = _tiny_istft_cfg()
    p = vocoder.init_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 20, 16)), jnp.float32
    )
    wav = vocoder.apply(p, cfg, mel)
    assert wav.shape == (2, 20 * 32)
    w = np.asarray(wav)
    assert np.isfinite(w).all() and np.abs(w).max() <= 1.0
    assert vocoder.total_upsample(cfg) == 32


def test_istft_vocoder_trains():
    """One optimizer step on the mel/STFT losses reduces... at least runs and
    updates params finitely (same step factory as the hifigan kind)."""
    from autostyle_tts_tpu.train.acoustic import make_vocoder_step

    cfg = _tiny_istft_cfg()
    p = vocoder.init_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-4)
    st = opt.init(p)
    step = make_vocoder_step(cfg, opt, sr=2400, n_fft=128, hop=32)
    rng = np.random.default_rng(1)
    batch = {
        "mel": jnp.asarray(rng.standard_normal((2, 16, 16)), jnp.float32),
        "wav": jnp.asarray(
            0.3 * rng.standard_normal((2, 16 * 32)), jnp.float32
        ),
    }
    losses = []
    for i in range(3):
        p, st, loss = step(p, st, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]      # moving downhill on a fixed batch


def test_engine_istft_streaming_vc():
    """Chunked streaming with the istft vocoder: OLA envelope normalization
    keeps chunk boundaries consistent (concat length == non-streaming)."""
    from autostyle_tts_tpu.pipeline.engine import Engine

    cfg = tiny_config()
    cfg.vocoder = _tiny_istft_cfg()
    eng = Engine(cfg, seed=0)
    sr = cfg.audio.prompt_sample_rate
    t = np.arange(4 * sr) / sr      # 4 s source (40 tokens) -> 2+ chunks
    src = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    prm = (0.3 * np.sin(2 * np.pi * 300 * t[: sr])).astype(np.float32)
    chunks = [o["tts_speech"][0] for o in eng.inference_vc(src, prm, stream=True)]
    assert len(chunks) >= 2
    stream_wav = np.concatenate(chunks)
    eng2 = Engine(cfg, params=eng.params, seed=0)
    full = next(eng2.inference_vc(src, prm))["tts_speech"][0]
    assert len(stream_wav) == len(full)
    assert np.isfinite(stream_wav).all()


def test_engine_istft_kind_end_to_end():
    """Full tiny pipeline with the istft vocoder (engine invariant holds via
    total_upsample == audio.hop_length)."""
    from autostyle_tts_tpu.pipeline.engine import Engine

    cfg = tiny_config()
    cfg.vocoder = _tiny_istft_cfg()
    eng = Engine(cfg, seed=0)
    sr = cfg.audio.prompt_sample_rate
    t = np.arange(sr) / sr
    prm = (0.3 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
    out = next(eng.inference_zero_shot("hello there", "prompt text", prm))
    wav = out["tts_speech"][0]
    assert wav.ndim == 1 and len(wav) > 0 and np.isfinite(wav).all()


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
