"""SV-cosine similarity scorer + retrieval-quality report (the quality-eval
loop the reference fed via meta.lst, vc_from_dir.py:203-217, but never
shipped a scorer for)."""

import json
from pathlib import Path

import numpy as np
import pytest

from autostyle_tts_tpu.pipeline.simeval import (
    SpeakerScorer, read_meta_lst, retrieval_report, score_meta_lst,
)
from autostyle_tts_tpu.retrieval import StyleStore
from autostyle_tts_tpu.utils.audio_io import write_wav
from autostyle_tts_tpu.utils.config import tiny_config
from autostyle_tts_tpu.utils.manifest import meta_lst_row, write_meta_lst


@pytest.fixture(scope="module")
def engine():
    from autostyle_tts_tpu.pipeline.engine import Engine

    return Engine(tiny_config())


def _tone(freq, sr, seconds=1.0, seed=None):
    t = np.arange(int(sr * seconds)) / sr
    x = 0.3 * np.sin(2 * np.pi * freq * t)
    if seed is not None:
        x = x + 0.05 * np.random.default_rng(seed).standard_normal(t.size)
    return x.astype(np.float32)


def test_speaker_scorer_self_similarity(engine):
    sr = engine.cfg.audio.prompt_sample_rate
    a = _tone(220, sr, seed=0)
    b = _tone(700, sr, seed=1)
    scorer = SpeakerScorer(engine)
    sims = scorer.similarity([a, b], [a, b])
    np.testing.assert_allclose(sims, 1.0, atol=1e-3)  # identical speaker
    cross = scorer.similarity([a], [b])
    assert cross[0] < 1.0 - 1e-4  # different content scores below self


def test_speaker_scorer_batch_padding_invariance(engine):
    """Scores must not depend on what else is in the batch (padding bucket)."""
    sr = engine.cfg.audio.prompt_sample_rate
    a = _tone(220, sr, 0.5, seed=0)
    long = _tone(330, sr, 2.0, seed=2)
    scorer = SpeakerScorer(engine)
    alone = scorer.embed_wavs([a])[0]
    padded = scorer.embed_wavs([a, long])[0]
    np.testing.assert_allclose(alone, padded, atol=2e-3)


def test_score_meta_lst_end_to_end(engine, tmp_path):
    sr = engine.cfg.audio.prompt_sample_rate
    timbre = _tone(250, sr, seed=3)
    synth_same = timbre.copy()
    synth_other = _tone(800, sr, seed=4)
    tp = tmp_path / "timbre.wav"
    write_wav(tp, timbre, sr)
    wav_dir = tmp_path / "out"
    wav_dir.mkdir()
    write_wav(wav_dir / "utt_same.wav", synth_same, sr)
    write_wav(wav_dir / "utt_other.wav", synth_other, sr)
    write_meta_lst(tmp_path / "meta.lst", [
        meta_lst_row("utt_same", "style text", str(tp), "hello"),
        meta_lst_row("utt_other", "style text", str(tp), "world"),
    ])

    rows = read_meta_lst(tmp_path / "meta.lst")
    assert rows[0]["timbre_path"] == str(tp)

    report = score_meta_lst(engine, tmp_path / "meta.lst", wav_dir)
    assert report["summary"]["n"] == 2
    by_name = {r["name"]: r["similarity"] for r in report["rows"]}
    assert by_name["utt_same"] > 0.999
    assert by_name["utt_other"] < by_name["utt_same"]


def test_score_similarity_cli(engine, tmp_path):
    sr = 1600  # tiny prompt rate
    timbre = _tone(250, sr, seed=5)
    tp = tmp_path / "t.wav"
    write_wav(tp, timbre, sr)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    write_wav(wav_dir / "x.wav", timbre, sr)
    write_meta_lst(tmp_path / "meta.lst",
                   [meta_lst_row("x", "s", str(tp), "txt")])
    from autostyle_tts_tpu.cli.score_similarity import main

    out = tmp_path / "sim.json"
    main(["--tiny", "--meta_lst", str(tmp_path / "meta.lst"),
          "--wav_dir", str(wav_dir), "--output_json", str(out)])
    rep = json.loads(out.read_text())
    assert rep["summary"]["n"] == 1
    assert rep["rows"][0]["similarity"] > 0.999


def test_retrieval_report_healthy_store():
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((30, 16)).astype(np.float32)
    store = StyleStore(dim=16, capacity=64)
    store.insert(vecs, [{"file_id": str(i), "text": ""} for i in range(30)])
    rep = retrieval_report(store, k=5)
    assert rep["n"] == 30
    assert rep["recall_at_k"] == 1.0
    c = rep["cross_top1"]
    assert -1.0 <= c["min"] <= c["p50"] <= c["max"] <= 1.0


def test_retrieval_report_cli_on_reference_corpus(tmp_path):
    """CI regression on the imported reference Milvus corpus: recall@5 = 1.0
    (VERDICT next-step 7; corpus = milvus/milvus_demo.db, 130 x 6144)."""
    db = Path("/root/reference/milvus/milvus_demo.db")
    if not db.exists():
        pytest.skip("reference corpus not present")
    from autostyle_tts_tpu.retrieval.milvus_import import import_milvus_db

    store = import_milvus_db(str(db))
    rep = retrieval_report(store, k=5)
    assert rep["n"] >= 100
    assert rep["recall_at_k"] == 1.0
    # exercise the CLI path on a snapshot
    snap = tmp_path / "db"
    store.save(snap)
    from autostyle_tts_tpu.cli.retrieval_report import main

    out = tmp_path / "report.json"
    main(["--db_path", str(snap), "--k", "5",
          "--output_json", str(out), "--fail_below_recall", "1.0"])
    rep2 = json.loads(out.read_text())
    assert rep2["recall_at_k"] == 1.0


def test_levenshtein_and_collapse():
    from autostyle_tts_tpu.pipeline.simeval import (
        collapse_phoneme_frames, levenshtein, text_to_phoneme_ids,
    )

    assert levenshtein([], []) == 0
    assert levenshtein([1, 2, 3], [1, 2, 3]) == 0
    assert levenshtein([1, 2, 3], [1, 3]) == 1          # delete
    assert levenshtein([1, 2, 3], [1, 2, 4, 3]) == 1    # insert
    assert levenshtein([1, 2, 3], [1, 9, 3]) == 1       # substitute
    assert levenshtein("kitten", "sitting") == 3        # classic
    # collapse: merge runs, drop silence (0)
    assert collapse_phoneme_frames([0, 0, 5, 5, 5, 0, 3, 3, 5]) == [5, 3, 5]
    assert collapse_phoneme_frames([]) == []
    assert collapse_phoneme_frames([0, 0]) == []
    # orthography: letters map through PHONE_ID; spaces/unknowns dropped
    from autostyle_tts_tpu.train.synthcorpus import PHONE_ID

    ids = text_to_phoneme_ids("ma pa")
    assert ids == [PHONE_ID["m"], PHONE_ID["a"], PHONE_ID["p"], PHONE_ID["a"]]


def test_phoneme_recognizer_on_random_engine():
    """Recognizer machinery (shape/plumbing) on an untrained tiny engine:
    transcribe runs, returns a (possibly empty) id sequence, and PER against
    a corpus text is finite. Quality is gated by the trained-demo test."""
    import jax

    from autostyle_tts_tpu.pipeline.engine import Engine
    from autostyle_tts_tpu.pipeline.simeval import (
        PhonemeRecognizer, phoneme_error_rate,
    )
    from autostyle_tts_tpu.train.synthcorpus import N_PHONEME_CLASSES

    cfg = tiny_config()
    eng = Engine(cfg, seed=0)
    head = np.asarray(
        jax.random.normal(
            jax.random.PRNGKey(0),
            (cfg.speech_tokenizer.dim, N_PHONEME_CLASSES),
        )
    )
    rec = PhonemeRecognizer(eng, head)
    sr = cfg.audio.sample_rate
    wav = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(
        np.float32
    )
    seq = rec.transcribe(wav)
    assert isinstance(seq, list)
    per = phoneme_error_rate(rec, wav, "ma pa ta")
    assert np.isfinite(per) and per >= 0.0


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
