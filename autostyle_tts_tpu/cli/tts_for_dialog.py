"""Dialog batch TTS (reference C4, tts_for_dialog.py): a correspondence JSON
{turn_idx: {value: style_idx, speaker, emotion} | 'null'} joins a dialog
JSONL (zh_text per turn, 1-indexed) and a style-DB JSONL (file_id + zh_text,
1-indexed); each non-null turn is synthesized with the mapped style wav and
the speaker's timbre. Flags preserved: --corresponding_json --dialogue_json
--style_wav_json --style_wav_dir --result_dir (reference :216-224); the
hardcoded jinjing/lijiaqi timbre paths (:43-51) become --timbre_map.
Batched on the data axis (--batch) instead of the reference's per-turn loop.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from ..utils.native_audio import load_wav_fast as load_wav
from ..utils.manifest import read_jsonl
from .common import (
    add_common_args, build_engine, save_wav_22050_or_24k, timestamped_dir,
)
from .tts_with_rag import parse_timbre_map


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--corresponding_json", type=str, required=True)
    p.add_argument("--dialogue_json", type=str, required=True)
    p.add_argument("--style_wav_json", type=str, required=True)
    p.add_argument("--style_wav_dir", type=str, required=True)
    p.add_argument("--result_dir", type=str, required=True)
    p.add_argument("--timbre_map", type=str, required=True)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args(argv)

    engine = build_engine(args)
    sr = engine.cfg.audio.prompt_sample_rate
    dialogue = read_jsonl(args.dialogue_json)
    style_db = read_jsonl(args.style_wav_json)
    # featurize each fixed per-speaker timbre ONCE; batches reuse the
    # PromptFeatures across the whole dialog (reference re-loaded per turn)
    tmap = parse_timbre_map(args.timbre_map)
    timbres = dict(zip(
        tmap, engine.prompt_features([load_wav(v, sr) for v in tmap.values()])
    )) if tmap else {}
    with open(args.corresponding_json, encoding="utf-8") as f:
        correspond = json.load(f)
    result_dir = timestamped_dir(args.result_dir)

    items = []
    cnt = 0
    for key, value in correspond.items():
        if value == "null" or value is None:
            continue
        cnt += 1
        turn_idx = int(key)
        style_idx = int(value["value"])
        speaker = value["speaker"]
        if not (1 <= turn_idx <= len(dialogue)) or not (1 <= style_idx <= len(style_db)):
            print(f"skip turn {key}: index out of range")
            continue
        if speaker not in timbres:
            print(f"skip turn {key}: no timbre for speaker {speaker!r}")
            continue
        zh_text = dialogue[turn_idx - 1]["zh_text"]
        entry = style_db[style_idx - 1]
        file_id = entry["file_id"]
        style_text = entry["zh_text"]
        style_path = Path(args.style_wav_dir) / f"{file_id}.wav"
        items.append((cnt, zh_text, style_text, str(style_path), speaker))

    for s0 in range(0, len(items), max(args.batch, 1)):
        chunk = items[s0 : s0 + args.batch]
        texts = [c[1] for c in chunk]
        stexts = [c[2] for c in chunk]
        styles = [load_wav(c[3], sr) for c in chunk]
        timbs = [timbres[c[4]] for c in chunk]
        wavs = engine.synthesize_batch(texts, stexts, styles, timbs)
        for (n, _, _, spath, spk), wav in zip(chunk, wavs):
            out = result_dir / f"{n}_{Path(spath).stem}_to_{spk}_0.wav"
            save_wav_22050_or_24k(out, wav, engine)
            print(f"saved {out}")


if __name__ == "__main__":
    from .common import run_cli

    run_cli(main)
