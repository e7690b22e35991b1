"""Continuous batching: slot scheduler, per-row decode positions, greedy
parity with the single-request path, and the serve.py --continuous mode."""

import json

import jax
import numpy as np

from autostyle_tts_tpu.models import token_lm
from autostyle_tts_tpu.ops.sampling import SamplerConfig
from autostyle_tts_tpu.pipeline.continuous import ContinuousBatcher
from autostyle_tts_tpu.pipeline.engine import Engine
from autostyle_tts_tpu.utils.audio_io import write_wav
from autostyle_tts_tpu.utils.config import tiny_config

SR = 1600


def _wav(f=220.0, seed=0, seconds=1.0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    return (0.4 * np.sin(2 * np.pi * f * t)
            + 0.02 * rng.standard_normal(len(t))).astype(np.float32)


def _engine():
    return Engine(tiny_config(), seed=0)


def test_continuous_greedy_matches_generate_speech():
    """A request decoded through chunked slots must produce the SAME greedy
    tokens as one generate_speech call over the identically padded prefix."""
    eng = _engine()
    feat = eng.prompt_features([_wav(seed=3)])[0]
    req = {"id": "x", "text": "hello parity", "style_text": "st",
           "style_feat": feat, "flow_feat": feat}
    bat = ContinuousBatcher(
        eng, slots=2, chunk=5, p_max=64,
        sampler=SamplerConfig(greedy=True), max_new=24,
    )
    bat.submit(dict(req))
    done = bat.drain()
    assert len(done) == 1
    got = done[0]["tokens"]

    pre = bat._build_prefix(req)
    ref = token_lm.generate_speech(
        eng.params.token_lm, eng.cfg.token_lm, pre, jax.random.PRNGKey(0),
        max_new_tokens=24, sampler=SamplerConfig(greedy=True), min_tokens=2,
    )
    n = int(ref.lengths[0])
    np.testing.assert_array_equal(got[:n], np.asarray(ref.tokens)[0, :n])
    assert len(got) == n or len(got) == 24   # eos'd identically or hit cap


def test_continuous_mixed_admission_all_finish():
    """More requests than slots: later requests join as slots free up; all
    finish and render to audio."""
    eng = _engine()
    feats = eng.prompt_features([_wav(seed=i, f=200 + 40 * i) for i in range(3)])
    bat = ContinuousBatcher(
        eng, slots=2, chunk=4, p_max=64,
        sampler=SamplerConfig(greedy=True), max_new=12,
    )
    for i, f in enumerate(feats):
        bat.submit({"id": f"r{i}", "text": f"request number {i} speaks",
                    "style_text": "", "style_feat": f, "flow_feat": f})
    done = bat.drain()
    assert sorted(d["id"] for d in done) == ["r0", "r1", "r2"]
    wavs = eng.synthesize_from_tokens(done, max_seconds=2.0)
    assert len(wavs) == 3
    for w in wavs:
        assert np.isfinite(w).all()


def test_serve_continuous_cli(tmp_path, capsys):
    from autostyle_tts_tpu.cli import serve

    sw = tmp_path / "s.wav"
    tw = tmp_path / "t.wav"
    write_wav(sw, _wav(seed=1, f=210), SR)
    write_wav(tw, _wav(seed=2, f=320), SR)
    reqs = [
        {"id": "a", "text": "first continuous request", "style_text": "st",
         "style_wav": str(sw), "timbre_wav": str(tw)},
        {"id": "too_long", "text": "x" * 4000, "style_text": "st",
         "style_wav": str(sw), "timbre_wav": str(tw)},   # prefix > p_max
        {"id": "b", "text": "second one", "style_text": "st",
         "style_wav": str(sw), "timbre_wav": str(tw)},
    ]
    rq = tmp_path / "requests.jsonl"
    rq.write_text("\n".join(json.dumps(r) for r in reqs) + "\n")
    out_dir = tmp_path / "served"
    serve.main([
        "--tiny", "--requests", str(rq), "--result_dir", str(out_dir),
        "--continuous", "--slots", "2", "--chunk", "6", "--max_seconds", "2",
        "--p_max", "128",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    by_id = {l.get("id"): l for l in lines if "wav" in l}
    assert set(by_id) == {"a", "b"}
    # oversized request is rejected per-request, not fatally
    errs = {l.get("id"): l for l in lines if "error" in l}
    assert "too_long" in errs
    for rid in ("a", "b"):
        assert (out_dir / f"{rid}.wav").exists()
        assert by_id[rid]["samples"] > 0
    done = [l for l in lines if l.get("done")]
    assert done and done[0]["served"] == 2


def test_continuous_empty_style_at_exact_pmax_rejected():
    """Empty style prompts occupy one pad row at admission (arrays can't be
    zero-width), so a request whose raw prefix exactly fills p_max must be
    REJECTED with an error — not admitted into a 2*p_max prefix whose decode
    window is empty (round-3 review finding)."""
    import dataclasses

    from autostyle_tts_tpu.models import frontend

    eng = _engine()
    feat = eng.prompt_features([_wav(seed=4)])[0]
    empty = dataclasses.replace(feat, tokens=np.zeros((0,), np.int32))
    text = "hello there"
    ids = frontend.encode(text, tokenizer=eng.text_tokenizer,
                          numbers=eng.normalize_numbers)
    p_max = 2 + len(ids)          # old validation passed at exactly p_max
    bat = ContinuousBatcher(
        eng, slots=2, chunk=4, p_max=p_max,
        sampler=SamplerConfig(greedy=True), max_new=8,
    )
    bat.submit({"id": "edge", "text": text, "style_text": "",
                "style_feat": empty, "flow_feat": feat})
    finished = bat.step()
    assert finished == []
    rej = bat.take_rejected()
    assert len(rej) == 1 and "p_max" in rej[0]["error"]
    assert bat.idle


def test_continuous_empty_style_with_headroom_finishes():
    """An empty style prompt WITH prefix headroom admits and decodes
    normally through the pad-row widening."""
    import dataclasses

    eng = _engine()
    feat = eng.prompt_features([_wav(seed=5)])[0]
    empty = dataclasses.replace(feat, tokens=np.zeros((0,), np.int32))
    bat = ContinuousBatcher(
        eng, slots=2, chunk=4, p_max=64,
        sampler=SamplerConfig(greedy=True), max_new=8,
    )
    bat.submit({"id": "ok", "text": "hello", "style_text": "",
                "style_feat": empty, "flow_feat": feat})
    done = bat.drain()
    assert len(done) == 1 and done[0]["id"] == "ok"
    assert len(done[0]["tokens"]) >= 1


def test_continuous_kv_int8_matches_one_shot_kv_int8():
    """int8-KV continuous decoding (cache stream halves at batch) must
    produce the SAME greedy tokens as the one-shot kv_int8 path — the
    appends quantize per row with the same formula the one-shot writes use,
    so the numerics line up exactly."""
    eng = _engine()
    feat = eng.prompt_features([_wav(seed=8)])[0]
    req = {"id": "q", "text": "hello quantized", "style_text": "st",
           "style_feat": feat, "flow_feat": feat}
    bat = ContinuousBatcher(
        eng, slots=2, chunk=5, p_max=64,
        sampler=SamplerConfig(greedy=True), max_new=24, kv_int8=True,
    )
    assert "k_scale" in bat.cache
    bat.submit(dict(req))
    done = bat.drain()
    assert len(done) == 1
    got = done[0]["tokens"]

    pre = bat._build_prefix(req)
    ref = token_lm.generate_speech(
        eng.params.token_lm, eng.cfg.token_lm, pre, jax.random.PRNGKey(0),
        max_new_tokens=24, sampler=SamplerConfig(greedy=True), min_tokens=2,
        kv_int8=True,
    )
    n = int(ref.lengths[0])
    np.testing.assert_array_equal(got[:n], np.asarray(ref.tokens)[0, :n])
    assert len(got) == n or len(got) == 24


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
