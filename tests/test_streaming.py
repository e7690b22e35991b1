"""Streaming synthesis: chunked iterator contract, chunk sizes, and
concatenated-output consistency with expected total length."""

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


def test_stream_yields_multiple_chunks(engine):
    chunks = [
        j["tts_speech"] for j in engine.inference_tts_with_st(
            "streaming test text", "style", _wav(seed=1), _wav(seed=2), stream=True
        )
    ]
    assert len(chunks) >= 2
    for c in chunks:
        assert c.ndim == 2 and c.shape[0] == 1 and c.shape[1] > 0
        assert np.isfinite(c).all()
    total = sum(c.shape[1] for c in chunks)
    cfg = engine.cfg
    # total samples = generated tokens * upsample * hop (same contract as
    # the non-streaming path)
    assert total % (cfg.cfm.upsample * cfg.audio.hop_length) == 0


def test_stream_zero_shot(engine):
    chunks = list(
        engine.inference_zero_shot("hello stream", "prompt", _wav(seed=4), stream=True)
    )
    assert len(chunks) >= 1
    assert all(np.isfinite(c["tts_speech"]).all() for c in chunks)


def test_stream_total_matches_each_chunk_rate(engine):
    cfg = engine.cfg
    hop_per_token = cfg.cfm.upsample * cfg.audio.hop_length
    chunks = [
        j["tts_speech"].shape[1] for j in engine.inference_tts_with_st(
            "another streaming utterance", "style words",
            _wav(seed=5), _wav(seed=6), stream=True,
        )
    ]
    # every chunk except possibly the last is exactly chunk_tokens long
    for c in chunks[:-1]:
        assert c == 25 * hop_per_token
    assert chunks[-1] <= 25 * hop_per_token
