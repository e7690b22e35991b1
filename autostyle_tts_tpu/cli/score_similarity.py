"""SV-cosine similarity scorer over vc_from_dir meta.lst manifests.

The reference emitted meta.lst "for cal_sim" (vc_from_dir.py:203-217) and
relied on an external scorer it never shipped. This CLI closes the loop with
the framework's own timbre encoder: for every row, score
cosine(spk(synthesized wav), spk(timbre prompt wav)) in batched jitted
programs, and write a JSON report (per-row scores + mean/p50/min/max).

  python -m autostyle_tts_tpu.cli.score_similarity \\
      --meta_lst results/meta.lst --wav_dir results \\
      --output_json results/similarity.json [--checkpoint engine.npz]
"""

from __future__ import annotations

import argparse
import json

from ..pipeline.simeval import score_meta_lst, write_report
from .common import add_common_args, build_engine, run_cli


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--meta_lst", type=str, required=True)
    p.add_argument("--wav_dir", type=str, required=True,
                   help="directory holding the synthesized {name}.wav files")
    p.add_argument("--output_json", type=str, required=True)
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args(argv)

    engine = build_engine(args)
    report = score_meta_lst(
        engine, args.meta_lst, args.wav_dir, batch=args.batch
    )
    write_report(args.output_json, report)
    s = report["summary"]
    print(json.dumps({"similarity_summary": s}, ensure_ascii=False))


if __name__ == "__main__":
    run_cli(main)
