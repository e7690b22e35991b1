"""RAG-driven TTS (reference C3, tts_with_rag.py): consume the retrieval
JSONL (zh_text/speaker/retrieved_file_id/retrieved_text/distance[/whisper])
and synthesize each turn with the retrieved style wav + the speaker's timbre
wav. Flags preserved: --corresponding_json --result_dir --is_exp
(reference :226-230); the reference's HARDCODED w1/w2/m1/m2 timbre paths
(:66-75) become --timbre_map (id=path,... or a JSON file), and whisper turns
(:93) use --whisper_timbre.

TPU-first upgrade over the reference's one-utterance-at-a-time loop
(SURVEY §3.1): --batch N synthesizes N turns per device program.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict

from ..utils.native_audio import load_wav_fast as load_wav
from ..utils.manifest import JsonDataReader
from .common import (
    add_common_args, build_engine, save_wav_22050_or_24k, timestamped_dir,
)


def parse_timbre_map(spec: str) -> Dict[str, str]:
    if spec.endswith(".json"):
        with open(spec, encoding="utf-8") as f:
            return json.load(f)
    out = {}
    for part in spec.split(","):
        if part.strip():
            k, v = part.split("=", 1)
            out[k.strip()] = v.strip()
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--corresponding_json", type=str, required=True,
                   help="retrieval JSONL from search_json")
    p.add_argument("--result_dir", type=str, required=True)
    p.add_argument("--timbre_map", type=str, required=True,
                   help="'w1=/p/w1.wav,m1=/p/m1.wav' or a JSON file")
    p.add_argument("--whisper_timbre", type=str, default=None,
                   help="timbre wav for whisper-flagged turns")
    p.add_argument("--style_db", type=str, default=None,
                   help="StyleStore snapshot with precomputed prompt "
                        "artifacts: style features come from the DB row "
                        "(retrieved_index) instead of loading the style wav")
    p.add_argument("--is_exp", type=str, default="false")
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args(argv)

    engine = build_engine(args)
    sr = engine.cfg.audio.prompt_sample_rate
    reader = JsonDataReader(args.corresponding_json)
    # featurize each fixed per-speaker timbre ONCE (the reference re-loaded
    # the same w1/w2/m1/m2 wavs per turn, tts_with_rag.py:180-186); batches
    # then reuse the PromptFeatures and their device-side caches
    tmap = parse_timbre_map(args.timbre_map)
    wlist = [load_wav(v, sr) for v in tmap.values()]
    if args.whisper_timbre:
        wlist.append(load_wav(args.whisper_timbre, sr))
    tfeats = engine.prompt_features(wlist) if wlist else []
    timbres = dict(zip(tmap, tfeats))
    whisper_timbre = tfeats[-1] if args.whisper_timbre else None
    style_store = None
    if args.style_db:
        from ..retrieval import StyleStore

        style_store = StyleStore.load(args.style_db)
    result_dir = timestamped_dir(args.result_dir)

    rows = list(reader)
    for s0 in range(0, len(rows), max(args.batch, 1)):
        chunk = rows[s0 : s0 + args.batch]
        texts, style_texts, styles, timbs, names = [], [], [], [], []
        for cnt, r in enumerate(chunk, start=s0):
            if r.retrieved_file_id in ("N/A", "Error", ""):
                print(f"skip row {cnt}: no retrieval result")
                continue
            if style_store is not None and r.retrieved_index >= 0:
                style = engine.prompt_features_from_store(
                    style_store, [r.retrieved_index]
                )[0]
            else:
                style = load_wav(r.retrieved_file_id, sr)
            if r.whisper and whisper_timbre is not None:
                timbre = whisper_timbre
                tname = "whisper"
            else:
                if r.speaker not in timbres:
                    print(f"skip row {cnt}: no timbre for speaker {r.speaker!r}")
                    continue
                timbre = timbres[r.speaker]
                tname = r.speaker
            texts.append(r.zh_text)
            style_texts.append(r.retrieved_text)
            styles.append(style)
            timbs.append(timbre)
            names.append(
                f"{cnt}_{Path(r.retrieved_file_id).stem}_to_{tname}"
            )
        if not texts:
            continue
        wavs = engine.synthesize_batch(texts, style_texts, styles, timbs)
        for name, wav in zip(names, wavs):
            out = result_dir / f"{name}.wav"
            save_wav_22050_or_24k(out, wav, engine)
            print(f"saved {out}")


if __name__ == "__main__":
    from .common import run_cli

    run_cli(main)
