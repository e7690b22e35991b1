"""Precomputed style-DB artifacts: featurize at insert time, serve from DB
rows with zero wav loads (SURVEY §7 hard part 5 / north-star path)."""

import json

import numpy as np
import pytest

from autostyle_tts_tpu.retrieval import StyleStore
from autostyle_tts_tpu.utils.audio_io import write_wav

SR = 1600


def _make_wav(path, seconds=1.0, f=220.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    x = 0.4 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(len(t))
    write_wav(path, x.astype(np.float32), SR)
    return str(path)


def test_artifacts_persist_roundtrip(tmp_path):
    store = StyleStore(dim=8, capacity=16)
    store.insert(
        np.random.default_rng(0).standard_normal((3, 8)).astype(np.float32),
        [{"file_id": str(i), "text": ""} for i in range(3)],
    )
    store.artifacts = {
        "speech_tokens": np.arange(12, dtype=np.int32).reshape(3, 4),
        "speech_token_lens": np.asarray([4, 3, 2], np.int64),
    }
    store.save(tmp_path / "s")
    loaded = StyleStore.load(tmp_path / "s")
    np.testing.assert_array_equal(
        loaded.artifacts["speech_tokens"], store.artifacts["speech_tokens"]
    )
    np.testing.assert_array_equal(
        loaded.artifacts["speech_token_lens"], store.artifacts["speech_token_lens"]
    )


def test_end_to_end_store_serving(tmp_path):
    """insert (featurized) -> search (row index) -> synthesize from artifacts,
    and verify the artifact path matches featurizing the wav directly."""
    from autostyle_tts_tpu.cli import insert_embeddings, search_json, tts_with_rag

    styles_dir = tmp_path / "styles"
    styles_dir.mkdir()
    manifest = []
    for i in range(3):
        fid = f"s{i}"
        _make_wav(styles_dir / f"{fid}.wav", f=180 + 40 * i, seed=i)
        manifest.append({"speaker": "w1", "zh_text": f"sample {i}", "file_id": fid})
    mpath = tmp_path / "styles.json"
    mpath.write_text(json.dumps(manifest))
    db = tmp_path / "store"
    insert_embeddings.main([
        "--tiny", "--input_json", str(mpath), "--db_path", str(db),
        "--style_wav_dir", str(styles_dir),
    ])
    store = StyleStore.load(db)
    assert "speech_tokens" in store.artifacts
    assert store.artifacts["spk"].shape[0] == 3

    turns = tmp_path / "turns.jsonl"
    turns.write_text('{"zh_text": "hello", "speaker": "w1"}\n')
    results = tmp_path / "res.jsonl"
    search_json.main([
        "--tiny", "--input_json", str(turns), "--db_path", str(db),
        "--output_file", str(results),
    ])
    row = json.loads(results.read_text().splitlines()[0])
    assert 0 <= row["retrieved_index"] < 3

    # artifact features == featurizing the wav directly
    from autostyle_tts_tpu.cli.common import build_engine

    class A:
        config = None; overrides = []; checkpoint = None; tiny = True; seed = 42

    engine = build_engine(A())
    idx = row["retrieved_index"]
    from_store = engine.prompt_features_from_store(store, [idx])[0]
    from autostyle_tts_tpu.utils.audio_io import load_wav

    wav = load_wav(styles_dir / f"{store.meta[idx]['file_id']}.wav", SR)
    direct = engine.prompt_features([wav])[0]
    np.testing.assert_array_equal(from_store.tokens, direct.tokens)
    np.testing.assert_allclose(from_store.spk, direct.spk, atol=1e-5)

    # the --style_db serving path produces audio without touching style wavs
    timbre = _make_wav(tmp_path / "timbre.wav", f=300, seed=9)
    out_dir = tmp_path / "out"
    tts_with_rag.main([
        "--tiny", "--corresponding_json", str(results),
        "--result_dir", str(out_dir), "--style_db", str(db),
        "--timbre_map", f"w1={timbre}",
    ])
    wavs = list(out_dir.glob("*/*.wav"))
    assert len(wavs) == 1
