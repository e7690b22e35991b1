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
    # the engine's default streaming chunk (~0.64 s of tokens)
    chunk_tokens = max(8, (2 * cfg.token_lm.token_rate) // 3)
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


def test_lm_bucket_prefix_determinism(engine):
    """The round-3 streaming path runs the LM twice (small bucket for first
    audio, full bucket behind it) with the SAME key and relies on the
    sampler splitting its key once per step: the small run's tokens must be
    a prefix of the full run's."""
    import jax
    import jax.numpy as jnp

    from autostyle_tts_tpu.models import token_lm

    cfg = engine.cfg.token_lm
    params = engine.params.token_lm
    text = jnp.asarray([[5, 9, 2, 7]], jnp.int32)
    tl = jnp.asarray([4])
    sty = jnp.asarray([[1, 2, 3]], jnp.int32)
    sl = jnp.asarray([3])
    spk = jnp.ones((1, cfg.spk_dim), jnp.float32) * 0.1
    key = jax.random.PRNGKey(99)
    outs = {}
    for mn in (64, 128):
        g = token_lm.generate_speech_from_ids(
            params, cfg, text, tl, sty, sl, spk, key, max_new_tokens=mn
        )
        outs[mn] = (np.asarray(g.tokens)[0], int(g.lengths[0]))
    n = min(64, outs[64][1] + 1, outs[128][1] + 1)
    np.testing.assert_array_equal(outs[64][0][:n], outs[128][0][:n])


def test_stream_decode_params_same_impl_for_both_runs(engine):
    """The first-chunk LM and the async full-length LM share one key and the
    chunk chain replays the full run's tokens after chunk 1 already played —
    so both must resolve to the SAME decode implementation. A long prompt
    can push only the larger bucket off the megakernel; then BOTH must fall
    back to the scanned path (round-3 review finding)."""
    sentinel = object()

    # larger bucket falls off the fused gate -> both scanned
    engine._fused_decode_params = lambda shape, mn: (
        sentinel if mn <= 32 else None
    )
    a, b = engine._stream_decode_params(128, 32, 128)
    assert a is None and b is None

    # both buckets fused -> both fused
    engine._fused_decode_params = lambda shape, mn: sentinel
    a, b = engine._stream_decode_params(128, 32, 128)
    assert a is sentinel and b is sentinel

    # no full run needed -> first bucket decides alone
    engine._fused_decode_params = lambda shape, mn: (
        sentinel if mn <= 32 else None
    )
    a, b = engine._stream_decode_params(128, 32, 32)
    assert a is sentinel and b is sentinel
    del engine._fused_decode_params   # restore the class method


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
