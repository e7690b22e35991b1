"""End-to-end engine tests (tiny config): every inference mode produces
finite 24 kHz-contract audio of the expected length; batching matches
single-item calls in shape; the reference's iterator contract holds."""

import numpy as np
import pytest

from autostyle_tts_tpu.pipeline import Engine
from autostyle_tts_tpu.utils.config import tiny_config


@pytest.fixture(scope="module")
def engine():
    return Engine(tiny_config(), seed=0)


def _wav(seconds=1.0, sr=1600, f=220.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    return (0.4 * np.sin(2 * np.pi * f * t) + 0.05 * rng.standard_normal(len(t))).astype(
        np.float32
    )


def test_zero_shot_contract(engine):
    outs = list(engine.inference_zero_shot("hello world", "prompt text", _wav()))
    assert len(outs) == 1
    speech = outs[0]["tts_speech"]
    assert speech.ndim == 2 and speech.shape[0] == 1
    assert speech.shape[1] > 0
    assert np.isfinite(speech).all()
    assert np.abs(speech).max() <= 1.0
    # sample count is a multiple of one mel frame's worth of samples
    hop = engine.cfg.audio.hop_length
    assert speech.shape[1] % hop == 0


def test_tts_with_st_distinct_prompts(engine):
    outs = list(
        engine.inference_tts_with_st(
            "some text", "style transcript", _wav(seed=1, f=200), _wav(seed=2, f=300)
        )
    )
    speech = outs[0]["tts_speech"]
    assert speech.shape[0] == 1 and np.isfinite(speech).all()


def test_vc_length_tracks_source(engine):
    src = _wav(seconds=2.0, seed=3)
    prm = _wav(seconds=1.0, seed=4)
    outs = list(engine.inference_vc(src, prm))
    speech = outs[0]["tts_speech"][0]
    # VC output duration ~ source duration (token-rate quantized):
    # tokens = src_samples // (hop * prod(strides)); out = tokens * up * hop
    st = engine.cfg
    hop_tok = st.audio.prompt_hop_length * int(np.prod(st.speech_tokenizer.strides))
    n_tok = len(src) // hop_tok
    expected = n_tok * st.cfm.upsample * st.audio.hop_length
    assert speech.shape[0] == expected


def test_sft_registered_speaker(engine):
    engine.register_speaker("spk_a", _wav(seed=5))
    outs = list(engine.inference_sft("text for sft", "spk_a"))
    assert outs[0]["tts_speech"].shape[1] > 0
    with pytest.raises(KeyError):
        list(engine.inference_sft("x", "unknown_spk"))


def test_batch_matches_shapes(engine):
    texts = ["first utterance", "second one"]
    stys = ["style a", "style b"]
    wavs = engine.synthesize_batch(
        texts, stys, [_wav(seed=6), _wav(seed=7)], [_wav(seed=8), _wav(seed=9)]
    )
    assert len(wavs) == 2
    for w in wavs:
        assert w.ndim == 1 and w.size > 0 and np.isfinite(w).all()


def test_batch_featurizes_repeated_wav_object_once(engine, monkeypatch):
    """Callers pass [wav]*L for a fixed prompt — synthesize_batch must
    featurize the shared object ONCE (and accept PromptFeatures in
    inference_zero_shot / inference_vc for cross-call reuse)."""
    calls = []
    orig = engine.prompt_features

    def counting(wavs):
        calls.append(len(wavs))
        return orig(wavs)

    monkeypatch.setattr(engine, "prompt_features", counting)
    sty, tim = _wav(seed=10, f=210), _wav(seed=11, f=260)
    wavs = engine.synthesize_batch(
        ["one", "two", "three"], ["s"] * 3, [sty] * 3, [tim] * 3
    )
    assert len(wavs) == 3 and calls == [2]  # 2 unique objects, not 6 rows

    # PromptFeatures pass-through on the single-wav APIs: no featurize call
    f = orig([_wav(seed=12)])[0]
    calls.clear()
    out = list(engine.inference_zero_shot("hi", "p", f))[0]["tts_speech"]
    assert out.shape[1] > 0 and calls == []
    outs = list(engine.inference_vc(_wav(seconds=1.0, seed=13), f))
    assert outs[0]["tts_speech"].shape[1] > 0 and calls == [1]  # source only


def test_fused_b1_matches_staged():
    """The fused B=1 synth_one program (LM + CFM + vocoder + crop in one
    dispatch) must produce the same audio as the staged path (profile=True
    forces staging) — same seed, same key-split order, f16 fetch rounding
    is the only allowed difference."""
    e_fused = Engine(tiny_config(), seed=7)
    e_staged = Engine(tiny_config(), seed=7, profile=True)
    sty, tim = _wav(seed=1, f=200), _wav(seed=2, f=300)
    wf = list(e_fused.inference_tts_with_st("fused parity", "style", sty, tim))
    ws = list(e_staged.inference_tts_with_st("fused parity", "style", sty, tim))
    a, b = wf[0]["tts_speech"], ws[0]["tts_speech"]
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-3)  # f16 mantissa on [-1, 1]
    # fused path really ran (observability span)
    assert "synth_one" in e_fused.watch.spans
    assert "lm_generate" in e_staged.watch.spans


def test_fused_b1_honors_fetch_dtype_f32():
    """fetch_dtype='float32' (the documented bit-tight parity knob) must
    reach the fused synth_one fetch too, not only the staged _vocode_crop
    (review finding: the fused program hard-coded f16, so the knob was
    silently ignored for every B=1 request)."""
    import dataclasses

    cfg = dataclasses.replace(tiny_config(), fetch_dtype="float32")
    e_fused = Engine(cfg, seed=7)
    e_staged = Engine(cfg, seed=7, profile=True)
    sty, tim = _wav(seed=1, f=200), _wav(seed=2, f=300)
    wf = list(e_fused.inference_tts_with_st("f32 parity", "style", sty, tim))
    ws = list(e_staged.inference_tts_with_st("f32 parity", "style", sty, tim))
    a, b = wf[0]["tts_speech"], ws[0]["tts_speech"]
    assert "synth_one" in e_fused.watch.spans
    assert a.shape == b.shape
    # f32 end-to-end: only cross-program fusion noise remains, far below
    # the f16 quantum (~5e-4) the default path allows
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_deterministic_given_same_engine_seed():
    e1 = Engine(tiny_config(), seed=42)
    e2 = Engine(tiny_config(), seed=42)
    w1 = list(e1.inference_zero_shot("abc", "p", _wav()))[0]["tts_speech"]
    w2 = list(e2.inference_zero_shot("abc", "p", _wav()))[0]["tts_speech"]
    np.testing.assert_allclose(w1, w2, atol=1e-5)


def test_speaker_registry_persistence(tmp_path, engine):
    engine.register_speaker("reg_a", _wav(seed=11))
    engine.register_speaker("reg_b", _wav(seed=12, f=260))
    engine.save_speakers(tmp_path / "speakers")
    e2 = Engine(tiny_config(), seed=0)
    e2.load_speakers(tmp_path / "speakers")
    assert set(e2.speakers) >= {"reg_a", "reg_b"}
    np.testing.assert_array_equal(
        e2.speakers["reg_a"].tokens, engine.speakers["reg_a"].tokens
    )
    out = list(e2.inference_sft("persisted speaker", "reg_a"))
    assert out[0]["tts_speech"].shape[1] > 0


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
