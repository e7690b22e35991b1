"""Concurrent streaming serving (pipeline/stream_serve.StreamingScheduler):
N sessions share the slot-pool decode while each emits windowed audio
chunks. Checks: (1) a solo session's audio is IDENTICAL to the engine's
single-session streaming path given the same tokens and cfm keys, (2)
concurrent sessions interleave — every session's first chunk arrives
before any session's completion — and each completes with the right
amount of audio, (3) per-request error isolation."""

import jax
import numpy as np
import pytest

from autostyle_tts_tpu.ops.sampling import SamplerConfig
from autostyle_tts_tpu.pipeline import Engine, StreamingScheduler
from autostyle_tts_tpu.utils.config import tiny_config


@pytest.fixture(scope="module")
def engine():
    return Engine(tiny_config(), seed=11)


def _wav(seconds=1.0, sr=1600, f=220.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    return (
        0.4 * np.sin(2 * np.pi * f * t)
        + 0.02 * rng.standard_normal(len(t))
    ).astype(np.float32)


def _req(engine, feat, text="stream serve test", n=None):
    r = {"text": text, "style_text": "st", "style_feat": feat,
         "flow_feat": feat}
    if n is not None:
        r["max_tokens"] = n
    return r


def test_solo_session_matches_engine_stream(engine):
    """Same tokens + same cfm key sequence -> bit-identical chunk audio vs
    Engine._synthesize_stream's token-override path."""
    feat = engine.prompt_features([_wav(seed=5)])[0]
    sch = StreamingScheduler(
        engine, slots=2, max_seconds=2.0,
        sampler=SamplerConfig(greedy=True),
    )
    engine.key = jax.random.PRNGKey(123)
    sid = sch.submit(_req(engine, feat, n=3 * sch.chunk))
    events = sch.run()[sid]
    kinds = [e.kind for e in events]
    assert kinds[-1] == "done" and kinds[:-1] == ["chunk"] * (len(kinds) - 1)
    got = np.concatenate([e.wav for e in events if e.kind == "chunk"])

    # reference: the engine's own streaming renderer over the SAME tokens
    sess = sch.finished[sid]
    engine.key = jax.random.PRNGKey(123)
    # burn the decode-side key splits the scheduler did NOT do (the batcher
    # has its own key); only cfm keys came from engine.key — one per chunk
    ref_chunks = list(engine._synthesize_stream(
        "", "", None, feat,
        lm_tokens_override=np.asarray(sess.tokens, np.int32),
    ))
    ref = np.concatenate(ref_chunks)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_concurrent_sessions_interleave(engine):
    feat = engine.prompt_features([_wav(seed=6, f=260.0)])[0]
    sch = StreamingScheduler(
        engine, slots=4, max_seconds=2.0,
        sampler=SamplerConfig(greedy=True),
    )
    n = 2 * sch.chunk
    sids = [sch.submit(_req(engine, feat, text=f"turn {i}", n=n))
            for i in range(3)]
    order = []      # (event index, sid, kind)
    i = 0
    per = {s: [] for s in sids}
    while not sch.idle and i < 10_000:
        for ev in sch.step():
            order.append((ev.session, ev.kind))
            per[ev.session].append(ev)
        i += 1
    # every session completed with ceil(n/chunk) chunks of audio
    up_hop = engine.cfg.cfm.upsample * engine.cfg.audio.hop_length
    for s in sids:
        kinds = [e.kind for e in per[s]]
        assert kinds[-1] == "done"
        total = sum(len(e.wav) for e in per[s])
        assert total == n * up_hop
    # interleaving: each session's FIRST chunk precedes every completion
    first_chunk = {s: next(i for i, (sid, k) in enumerate(order)
                           if sid == s and k == "chunk") for s in sids}
    first_done = min(i for i, (_, k) in enumerate(order) if k == "done")
    assert max(first_chunk.values()) < first_done


def test_error_isolation(engine):
    feat = engine.prompt_features([_wav(seed=7)])[0]
    sch = StreamingScheduler(
        engine, slots=2, max_seconds=2.0, p_max=64,
        sampler=SamplerConfig(greedy=True),
    )
    ok = sch.submit(_req(engine, feat, n=sch.chunk))
    bad = sch.submit(_req(engine, feat, text="x " * 500))  # prefix > p_max
    out = sch.run()
    assert out[bad][0].kind == "error" and "p_max" in out[bad][0].error
    assert out[ok][-1].kind == "done"
    assert sum(len(e.wav) for e in out[ok]) > 0


def test_serve_cli_continuous_stream(tmp_path, capsys):
    """cli.serve --continuous --stream: per-chunk JSONL events with ttfb on
    the first chunk, a stitched final wav per request, errors isolated."""
    import json

    from autostyle_tts_tpu.cli import serve
    from autostyle_tts_tpu.utils.audio_io import write_wav

    SR = 1600
    sw, tw = tmp_path / "s.wav", tmp_path / "t.wav"
    write_wav(sw, _wav(seed=1, f=210, sr=SR), SR)
    write_wav(tw, _wav(seed=2, f=320, sr=SR), SR)
    reqs = [
        {"id": "a", "text": "first streaming request", "style_text": "st",
         "style_wav": str(sw), "timbre_wav": str(tw)},
        {"id": "too_long", "text": "x" * 4000, "style_text": "st",
         "style_wav": str(sw), "timbre_wav": str(tw)},
        {"id": "b", "text": "second one", "style_text": "st",
         "style_wav": str(sw), "timbre_wav": str(tw)},
    ]
    rq = tmp_path / "requests.jsonl"
    rq.write_text("\n".join(json.dumps(r) for r in reqs) + "\n")
    out_dir = tmp_path / "served"
    serve.main([
        "--tiny", "--requests", str(rq), "--result_dir", str(out_dir),
        "--continuous", "--stream", "--slots", "2", "--max_seconds", "2",
        "--p_max", "128",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    finals = {l["id"]: l for l in lines if "chunks" in l}
    assert set(finals) == {"a", "b"}
    errs = {l.get("id") for l in lines if "error" in l}
    assert "too_long" in errs
    for rid in ("a", "b"):
        assert (out_dir / f"{rid}.wav").exists()
        chunk_events = [l for l in lines
                        if l.get("id") == rid and "chunk" in l]
        assert len(chunk_events) == finals[rid]["chunks"] >= 1
        assert "ttfb_ms" in chunk_events[0]
        assert sum(c["samples"] for c in chunk_events) == finals[rid]["samples"]
    done = [l for l in lines if l.get("done")]
    assert done and done[0]["served"] == 2


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
