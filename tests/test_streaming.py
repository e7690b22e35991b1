"""Streaming synthesis: chunked iterator contract, fixed-window sizes,
deterministic chunk counts via the VC token-override path, and seam
consistency of the emitted mel history."""

import numpy as np
import pytest

from autostyle_tts_tpu.pipeline import Engine
from autostyle_tts_tpu.utils.config import tiny_config


@pytest.fixture(scope="module")
def engine():
    return Engine(tiny_config(), seed=3)


def _wav(seconds=1.0, sr=1600, f=220.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    return (0.4 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(len(t))).astype(
        np.float32
    )


def test_stream_vc_deterministic_chunk_count(engine):
    """VC streaming feeds source tokens directly -> chunk count is exactly
    ceil(n_tokens / chunk_tokens), no LM sampling involved."""
    cfg = engine.cfg
    hop_per_token = cfg.cfm.upsample * cfg.audio.hop_length
    chunk_tokens = cfg.token_lm.token_rate
    src = _wav(seconds=4.0, seed=3)   # long source -> several chunks
    prm = _wav(seconds=1.0, seed=4)
    chunks = [
        j["tts_speech"] for j in engine.inference_vc(src, prm, stream=True)
    ]
    hop_tok = cfg.audio.prompt_hop_length * int(
        np.prod(cfg.speech_tokenizer.strides)
    )
    n_tok = len(src) // hop_tok
    expected_chunks = -(-n_tok // chunk_tokens)
    assert len(chunks) == expected_chunks
    total = sum(c.shape[1] for c in chunks)
    assert total == n_tok * hop_per_token
    for c in chunks[:-1]:
        assert c.shape[1] == chunk_tokens * hop_per_token
    assert all(np.isfinite(c).all() for c in chunks)


def test_stream_tts_with_st(engine):
    chunks = [
        j["tts_speech"] for j in engine.inference_tts_with_st(
            "streaming test text", "style", _wav(seed=1), _wav(seed=2), stream=True
        )
    ]
    assert len(chunks) >= 1
    cfg = engine.cfg
    hpt = cfg.cfm.upsample * cfg.audio.hop_length
    total = sum(c.shape[1] for c in chunks)
    assert total % hpt == 0
    for c in chunks:
        assert c.ndim == 2 and c.shape[0] == 1 and c.shape[1] > 0
        assert np.isfinite(c).all()


def test_stream_zero_shot_and_sft(engine):
    outs = list(
        engine.inference_zero_shot("hello stream", "prompt", _wav(seed=4), stream=True)
    )
    assert len(outs) >= 1
    engine.register_speaker("s1", _wav(seed=5))
    outs = list(engine.inference_sft("sft stream", "s1", stream=True))
    assert len(outs) >= 1
    assert all(np.isfinite(c["tts_speech"]).all() for c in outs)


def test_stream_short_prompt_mel_clamped(engine):
    """A prompt shorter than one token hop yields fewer mel frames than
    n_p * upsample; the prompt mask must clamp to the available mel
    (non-streaming path clamps via mel_lens — parity check)."""
    src = _wav(seconds=2.0, seed=6)
    tiny_prompt = _wav(seconds=0.05, seed=7)  # < one token hop
    chunks = list(engine.inference_vc(src, tiny_prompt, stream=True))
    assert all(np.isfinite(c["tts_speech"]).all() for c in chunks)
