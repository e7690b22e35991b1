"""Acoustic training pipeline + CLI: manifests -> batches -> steps -> ckpts."""

import json
from pathlib import Path

import numpy as np
import pytest

from autostyle_tts_tpu.utils.audio_io import write_wav

SR = 1600


@pytest.fixture(scope="module")
def manifest(tmp_path_factory):
    d = tmp_path_factory.mktemp("acoustic_data")
    rows = []
    rng = np.random.default_rng(0)
    for i in range(4):
        t = np.arange(int(SR * 1.2)) / SR
        x = 0.4 * np.sin(2 * np.pi * (180 + 40 * i) * t)
        x += 0.02 * rng.standard_normal(len(t))
        write_wav(d / f"u{i}.wav", x.astype(np.float32), SR)
        rows.append({"wav": str(d / f"u{i}.wav"), "text": f"utterance {i}",
                     "speaker": "spk"})
    mp = d / "manifest.json"
    mp.write_text(json.dumps(rows))
    return str(mp)


def test_batch_pipeline_shapes(manifest):
    from autostyle_tts_tpu.cli.common import build_engine
    from autostyle_tts_tpu.train.data import (
        load_acoustic_manifest, make_acoustic_batches,
    )

    class A:
        config = None; overrides = []; checkpoint = None; tiny = True; seed = 0

    engine = build_engine(A())
    items = load_acoustic_manifest(manifest)
    assert len(items) == 4
    batches = list(
        make_acoustic_batches(engine, items, batch_size=2, prompt_seconds=0.4,
                              shuffle=False)
    )
    assert len(batches) == 2
    b = batches[0]
    lm, cf, vo = b["token_lm"], b["cfm"], b["vocoder"]
    assert lm["text"].shape[0] == 2
    assert (np.asarray(lm["target_len"]) > 0).all()
    assert (np.asarray(lm["style_len"]) > 0).all()
    up = engine.cfg.cfm.upsample
    assert cf["mel"].shape[1] == cf["tokens"].shape[1] * up
    assert vo["wav"].shape[1] == cf["mel"].shape[1] * engine.cfg.audio.hop_length
    # prompt region is a strict subset of real frames
    assert (np.asarray(cf["prompt_mask"]) <= np.asarray(cf["frame_mask"])).all()


@pytest.mark.parametrize("stage", ["token_lm", "cfm", "vocoder"])
def test_train_acoustic_cli_stages(manifest, tmp_path, stage):
    from autostyle_tts_tpu.cli import train_acoustic

    out = tmp_path / stage
    train_acoustic.main([
        "--tiny", "--manifest", manifest, "--stage", stage,
        "--out_dir", str(out), "--batch_size", "2", "--epochs", "1",
        "--prompt_seconds", "0.4", "--save_every", "1", "--log_every", "1",
    ])
    assert list(Path(out).glob("checkpoint-*"))


def test_train_acoustic_cli_gan(manifest, tmp_path):
    from autostyle_tts_tpu.cli import train_acoustic

    out = tmp_path / "gan"
    train_acoustic.main([
        "--tiny", "--manifest", manifest, "--stage", "vocoder_gan",
        "--out_dir", str(out), "--batch_size", "2", "--epochs", "1",
        "--prompt_seconds", "0.4", "--save_every", "1", "--log_every", "1",
    ])
    assert list(Path(out).glob("checkpoint-*"))


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
