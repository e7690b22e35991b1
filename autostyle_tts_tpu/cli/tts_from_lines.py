"""Per-line zero-shot TTS from a text file + one prompt wav.

The reference's tts_prompt_generate.sh:8 invokes a `tts_from_lines.py` that
does not exist in its repo (missing-file bug recorded in SURVEY §7). This is
the working equivalent: each line of --txt_path is synthesized zero-shot with
--prompt_wav / --prompt_text.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ..utils.native_audio import load_wav_fast as load_wav
from .common import add_common_args, build_engine, read_lines, save_wav_22050_or_24k


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--txt_path", type=str, required=True)
    p.add_argument("--prompt_wav", type=str, required=True)
    p.add_argument("--prompt_text", type=str, required=True)
    p.add_argument("--result_dir", type=str, required=True)
    args = p.parse_args(argv)

    engine = build_engine(args)
    prompt = load_wav(args.prompt_wav, engine.cfg.audio.prompt_sample_rate)
    lines = read_lines(args.txt_path)
    Path(args.result_dir).mkdir(parents=True, exist_ok=True)
    wavs = engine.synthesize_batch(
        lines, [args.prompt_text] * len(lines),
        [prompt] * len(lines), [prompt] * len(lines),
    )
    for cnt, wav in enumerate(wavs, start=1):
        out = Path(args.result_dir) / f"line_{cnt}.wav"
        save_wav_22050_or_24k(out, wav, engine)
        print(f"saved {out}")


if __name__ == "__main__":
    from .common import run_cli

    run_cli(main)
