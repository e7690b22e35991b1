"""CLI contract tests: every entry point runs end-to-end at tiny geometry on
synthetic fixtures and produces the reference's file formats (SURVEY §4
'golden-file tests for the JSON/JSONL CLI contracts')."""

import json
import wave
from pathlib import Path

import numpy as np
import pytest

from autostyle_tts_tpu.utils.audio_io import write_wav

SR = 1600  # tiny config prompt rate


def _make_wav(path, seconds=1.0, f=220.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    x = (0.4 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(len(t)))
    write_wav(path, x.astype(np.float32), SR)
    return str(path)


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_fixtures")
    style = _make_wav(d / "style.wav", f=200, seed=1)
    timbre = _make_wav(d / "timbre.wav", f=300, seed=2)
    txt = d / "lines.txt"
    txt.write_text("hello world\nsecond line\n")
    return {"dir": d, "style": style, "timbre": timbre, "txt": str(txt)}


def _wav_ok(path):
    with wave.open(str(path), "rb") as w:
        assert w.getnframes() > 0
        return w.getframerate()


def test_cli_basic(fixtures, tmp_path):
    from autostyle_tts_tpu.cli import basic

    basic.main([
        "--tiny", "--prompt_wav", fixtures["style"],
        "--tts_text", "hi", "--prompt_text", "p",
        "--result_dir", str(tmp_path),
    ])
    out = tmp_path / "zero_shot_0.wav"
    assert _wav_ok(out) == 2400  # tiny config output rate


def test_cli_tts_with_style_and_timbre_both_modes(fixtures, tmp_path):
    from autostyle_tts_tpu.cli import tts_with_style_and_timbre as m

    for mode, pattern in (("false", "*_st_0.wav"), ("true", "*_exp_0_0.wav")):
        rd = tmp_path / f"mode_{mode}"
        m.main([
            "--tiny", "--style_wav_path", fixtures["style"],
            "--timbre_wav_path", fixtures["timbre"],
            "--style_wav_text", "style text", "--txt_path", fixtures["txt"],
            "--result_dir", str(rd), "--is_exp", mode,
        ])
        outs = list(rd.glob(pattern))
        assert len(outs) == 2, f"mode {mode}: {list(rd.iterdir())}"
        _wav_ok(outs[0])


def test_cli_tts_from_lines(fixtures, tmp_path):
    from autostyle_tts_tpu.cli import tts_from_lines

    tts_from_lines.main([
        "--tiny", "--txt_path", fixtures["txt"],
        "--prompt_wav", fixtures["style"], "--prompt_text", "p",
        "--result_dir", str(tmp_path),
    ])
    assert len(list(tmp_path.glob("line_*.wav"))) == 2


def test_cli_insert_then_search_json_then_rag_tts(fixtures, tmp_path):
    """The full reference workflow: C8 insert -> C10 search -> C3 synthesis."""
    from autostyle_tts_tpu.cli import insert_embeddings, search_json, tts_with_rag

    d = fixtures["dir"]
    # style manifest + per-file wavs named by file_id
    styles_dir = tmp_path / "styles"
    styles_dir.mkdir()
    manifest = []
    for i in range(4):
        fid = f"denoise_s{i}.wav"
        _make_wav(styles_dir / fid, f=180 + 30 * i, seed=10 + i)
        manifest.append(
            {"speaker": "w1" if i % 2 else "m1",
             "zh_text": f"style sample {i}", "file_id": fid}
        )
    mpath = tmp_path / "styles.json"
    mpath.write_text(json.dumps(manifest))

    db = tmp_path / "store"
    insert_embeddings.main([
        "--tiny", "--input_json", str(mpath), "--db_path", str(db),
        "--capacity", "64",
    ])
    assert (tmp_path / "store.npz").exists()
    assert (tmp_path / "store.meta.json").exists()

    turns = tmp_path / "turns.jsonl"
    turns.write_text(
        '{"zh_text": "hello there", "speaker": "w1"}\n'
        '{"zh_text": "reply text", "speaker": "m1"}\n'
    )
    results = tmp_path / "search_results.jsonl"
    search_json.main([
        "--tiny", "--input_json", str(turns), "--db_path", str(db),
        "--output_file", str(results), "--file_prefix_path", str(styles_dir),
    ])
    rows = [json.loads(l) for l in results.read_text().splitlines()]
    assert len(rows) == 2
    for r in rows:
        assert set(r) >= {"zh_text", "speaker", "retrieved_file_id",
                          "retrieved_text", "distance"}
        assert Path(r["retrieved_file_id"]).exists()

    out_dir = tmp_path / "rag_out"
    tts_with_rag.main([
        "--tiny", "--corresponding_json", str(results),
        "--result_dir", str(out_dir),
        "--timbre_map", f"w1={fixtures['timbre']},m1={fixtures['style']}",
    ])
    wavs = list(out_dir.glob("*/*.wav"))  # timestamped subdir
    assert len(wavs) == 2
    _wav_ok(wavs[0])


def test_cli_search_embeddings_and_search(fixtures, tmp_path, capsys):
    from autostyle_tts_tpu.cli import insert_embeddings, search, search_embeddings

    manifest = [{"speaker": "w1", "zh_text": f"t{i}", "file_id": f"f{i}"} for i in range(3)]
    mpath = tmp_path / "m.json"
    mpath.write_text(json.dumps(manifest))
    db = tmp_path / "db"
    insert_embeddings.main(
        ["--tiny", "--input_json", str(mpath), "--db_path", str(db)]
    )
    # vector-only query from a reference-shaped embedding dump
    store_meta = json.loads((tmp_path / "db.meta.json").read_text())
    vecs = np.load(tmp_path / "db.npz")["db"]
    dump = [{"file_id": store_meta[0]["file_id"], "combined_embedding": vecs[0].tolist()}]
    qpath = tmp_path / "q.json"
    qpath.write_text(json.dumps(dump))
    search_embeddings.main([
        "--query_json", str(qpath), "--db_path", str(db), "--top_k", "2",
    ])
    out = capsys.readouterr().out
    assert "distance=1.0000" in out
    # text query path
    search.main([
        "--tiny", "--db_path", str(db), "--query_text", "hello", "--top_k", "1",
    ])
    out = capsys.readouterr().out
    assert "file_id=" in out


def test_cli_vc_from_dir(fixtures, tmp_path):
    from autostyle_tts_tpu.cli import vc_from_dir

    style_dir = tmp_path / "styles"
    timbre_dir = tmp_path / "timbres"
    style_dir.mkdir(); timbre_dir.mkdir()
    manifest = []
    for i in range(3):
        stem = f"denoise_sty{i}"
        _make_wav(style_dir / f"sty{i}.wav", f=200 + i * 20, seed=20 + i)
        # reference looks up 'denoise_' + stem of the sampled file
        manifest.append({"file_id": f"denoise_sty{i}", "zh_text": f"style text {i}"})
        _make_wav(timbre_dir / f"tim{i}.wav", f=260 + i * 20, seed=30 + i)
    sj = tmp_path / "style.json"
    sj.write_text(json.dumps(manifest))
    rd = tmp_path / "out"
    vc_from_dir.main([
        "--tiny", "--txt_path", fixtures["txt"],
        "--style_dir", str(style_dir), "--timbre_dir", str(timbre_dir),
        "--result_dir", str(rd), "--style_num", "2", "--timbre_num", "1",
        "--style_json", str(sj), "--seed", "0",
    ])
    meta = (rd / "meta.lst").read_text().splitlines()
    assert len(meta) == 2 * 1 * 2  # styles x timbres x lines
    for row in meta:
        parts = row.split("|")
        assert len(parts) == 4
        assert parts[0].endswith("_new")
    assert len(list(rd.glob("*.wav"))) == 4


def test_cli_vc_from_dir_seed(fixtures, tmp_path):
    from autostyle_tts_tpu.cli import vc_from_dir_seed

    style_dir = tmp_path / "styles"
    style_dir.mkdir()
    _make_wav(style_dir / "sty0.wav", f=210, seed=40)
    sj = tmp_path / "style.json"
    sj.write_text(json.dumps([{"file_id": "denoise_sty0", "zh_text": "st"}]))
    # seed meta.lst points at wavs (col 3) with text (col 2)
    tw = _make_wav(fixtures["dir"] / "seed-wavs-a.wav", f=240, seed=41)
    # the rewrite rules map '-wavs'->'_temp' — create the rewritten target
    target = str(tw).replace("-wavs", "_temp").replace(".wav", "_16k.wav")
    _make_wav(Path(target), f=240, seed=41)
    lst = tmp_path / "seed_meta.lst"
    lst.write_text(f"name0|seed text|{tw}|target text\n")
    rd = tmp_path / "out"
    vc_from_dir_seed.main([
        "--tiny", "--txt_path", fixtures["txt"],
        "--style_dir", str(style_dir), "--timbre_dir_unused" if False else "--result_dir", str(rd),
        "--style_num", "1", "--timbre_num", "1",
        "--style_json", str(sj), "--seed_meta_lst", str(lst), "--seed", "0",
    ])
    assert (rd / "meta.lst").exists()
    assert len(list(rd.glob("*.wav"))) == 2


def test_cli_tts_for_dialog(fixtures, tmp_path):
    from autostyle_tts_tpu.cli import tts_for_dialog

    d = tmp_path
    (d / "dialog.jsonl").write_text(
        '{"zh_text": "turn one"}\n{"zh_text": "turn two"}\n'
    )
    styles_dir = d / "swav"
    styles_dir.mkdir()
    _make_wav(styles_dir / "s1.wav", f=200, seed=50)
    (d / "styledb.jsonl").write_text('{"file_id": "s1", "zh_text": "style one"}\n')
    (d / "correspond.json").write_text(json.dumps({
        "1": {"value": 1, "speaker": "jinjing", "emotion": "happy"},
        "2": "null",
    }))
    rd = d / "out"
    tts_for_dialog.main([
        "--tiny", "--corresponding_json", str(d / "correspond.json"),
        "--dialogue_json", str(d / "dialog.jsonl"),
        "--style_wav_json", str(d / "styledb.jsonl"),
        "--style_wav_dir", str(styles_dir), "--result_dir", str(rd),
        "--timbre_map", f"jinjing={fixtures['timbre']}",
    ])
    wavs = list(rd.glob("*/*.wav"))
    assert len(wavs) == 1  # null turn skipped
    assert "1_s1_to_jinjing_0.wav" == wavs[0].name


def test_cli_ft_llm_and_eval(tmp_path):
    from autostyle_tts_tpu.cli import evaluate_base_model, ft_llm

    data = {
        "Ses01_c1": {
            "labels": [0, 1], "sentences": ["great!", "bad."], "genders": ["F", "M"],
        },
        "Ses02_c2": {
            "labels": [2, 3], "sentences": ["ok.", "no!"], "genders": ["M", "F"],
        },
    }
    folder = tmp_path / "data"
    folder.mkdir()
    for split in ("train", "valid", "test"):
        (folder / f"iemocap.{split}.json").write_text(json.dumps(data))
    out = tmp_path / "ft"
    ft_llm.main([
        "--tiny", "--data_folder", str(folder), "--re_gen_data", "--do_train",
        "--do_eval_test", "--out_dir", str(out), "--window", "1",
        "--set", "train.epochs=1", "--set", "train.batch_size=2",
        "--set", "train.grad_accum=1", "--set", "train.max_seq_len=128",
        "--set", "train.eval_every=1000", "--set", "train.remat=false",
    ])
    assert (out / "summary.json").exists()
    assert (folder / "iemocap.train.0shot_w1_default.jsonl").exists()
    evaluate_base_model.main([
        "--tiny", "--test_jsonl",
        str(folder / "iemocap.test.0shot_w1_default.jsonl"),
        "--output_file", str(tmp_path / "eval.json"),
        "--set", "embedder.max_seq_len=1024",
    ])
    res = json.loads((tmp_path / "eval.json").read_text())
    assert "weighted_f1" in res and len(res["predictions"]) == 4


def test_cli_llm_bio_extract_with_resume(tmp_path):
    from autostyle_tts_tpu.cli import llm_bio_extract

    data = {
        "Ses01_c1": {"labels": [0], "sentences": ["hello"], "genders": ["F"]},
        "Ses02_c2": {"labels": [1], "sentences": ["bye"], "genders": ["M"]},
    }
    dj = tmp_path / "d.json"
    dj.write_text(json.dumps(data))
    out = tmp_path / "bios.json"
    llm_bio_extract.main([
        "--tiny", "--data_json", str(dj), "--output_json", str(out),
    ])
    bios = json.loads(out.read_text())
    assert set(bios) == {"Ses01_c1", "Ses02_c2"}
    assert len(bios["Ses01_c1"]) == 1
    # resume: pre-existing results are kept and backed up
    llm_bio_extract.main([
        "--tiny", "--data_json", str(dj), "--output_json", str(out),
    ])
    assert (tmp_path / "bios.json_backup.json").exists()


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
