"""Speaker-biography extraction over ERC datasets (reference C18/C19,
src/llm_bio_extract.py + _cn.py): for every conversation and speaker, prompt
the LLM for a 250-word characterization; batch by length; resume
incrementally by skipping processed conversation ids with a backup file
(reference :378-385); fall back down a batch-size ladder on failure
(reference :400, CN :233). One CLI, --language picks the prompt/name maps.

Output: {conv_id: [bio per utterance]} matching the reference's
{dataset}.{split}_spdescV2_{model}.json shape consumed by the spdescV2
reformatter."""

from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path

from ..pipeline.rag import EmbedderService
from ..train.reformat import _names  # same speaker-name contract
from .common import add_common_args, build_config
from .insert_embeddings import add_embedder_args, build_embedder


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    add_embedder_args(p)
    p.add_argument("--data_json", type=str, required=True,
                   help="{conv_id: {sentences, genders, labels}} dataset JSON")
    p.add_argument("--output_json", type=str, required=True)
    # --language comes from add_embedder_args (shared: prompt/name maps here,
    # emotion label set in the embedder service)
    p.add_argument("--batch_ladder", type=int, nargs="+", default=[8, 4, 2, 1],
                   help="fallback batch sizes (reference [6,5,2,1] / [32,16,8])")
    args = p.parse_args(argv)

    cfg = build_config(args)
    embedder = build_embedder(args, cfg)
    with open(args.data_json, encoding="utf-8") as f:
        data = json.load(f)

    out_path = Path(args.output_json)
    results = {}
    if out_path.exists():  # incremental resume (reference :378-385)
        shutil.copy(out_path, str(out_path) + "_backup.json")
        with open(out_path, encoding="utf-8") as f:
            results = json.load(f)
        print(f"resuming: {len(results)} conversations already processed")

    pending = [(cid, conv) for cid, conv in data.items() if cid not in results]
    for cid, conv in pending:
        names = _names(conv, cid, args.language)
        conv_text = "\n".join(
            f"{n}: {s}" for n, s in zip(names, conv["sentences"])
        )
        items = [(conv_text, n) for n in names]
        bios = None
        for bs in args.batch_ladder:  # batch-size fallback ladder
            try:
                bios = []
                for s0 in range(0, len(items), bs):
                    bios.extend(embedder.biographies(items[s0 : s0 + bs]))
                break
            except Exception as e:  # OOM/compile failure -> smaller batch
                print(f"conv {cid}: batch {bs} failed ({e}); retrying smaller")
                bios = None
        if bios is None:
            print(f"conv {cid}: all batch sizes failed; skipping")
            continue
        results[cid] = bios
        out_path.parent.mkdir(parents=True, exist_ok=True)
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(results, f, ensure_ascii=False)
        print(f"conv {cid}: {len(bios)} bios ({len(results)}/{len(data)})")
    print(f"done -> {out_path}")


if __name__ == "__main__":
    from .common import run_cli

    run_cli(main)
