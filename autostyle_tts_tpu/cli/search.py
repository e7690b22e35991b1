"""Interactive/one-shot text query (reference C9, milvus/search.py +
src/search_milvus.py): embed a query text (emotion label via the LLM + a
biography — per-speaker if provided, else the reference's placeholder,
search_milvus.py:111-117,:237), concat to 6144-d, top-k cosine search."""

from __future__ import annotations

import argparse
import json

from ..pipeline.rag import PLACEHOLDER_BIO
from ..retrieval import StyleStore
from .common import add_common_args, build_config
from .insert_embeddings import add_embedder_args, build_embedder


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    add_embedder_args(p)
    p.add_argument("--db_path", type=str, required=True)
    p.add_argument("--query_text", type=str, default=None,
                   help="one-shot query; omit for interactive mode")
    p.add_argument("--speaker_bios", type=str, default=None,
                   help="JSON {speaker: biography} (search_milvus.py:111-117)")
    p.add_argument("--speaker", type=str, default=None)
    p.add_argument("--top_k", type=int, default=3)
    args = p.parse_args(argv)

    cfg = build_config(args)
    embedder = build_embedder(args, cfg)
    store = StyleStore.load(args.db_path)
    bios = {}
    if args.speaker_bios:
        with open(args.speaker_bios, encoding="utf-8") as f:
            bios = json.load(f)

    def one(text: str) -> None:
        emotion = embedder.emotion_label(text)
        bio = bios.get(args.speaker, PLACEHOLDER_BIO)
        q = embedder.combined_embedding([emotion], [bio])
        for rank, h in enumerate(store.search(q, k=args.top_k)[0]):
            print(f"  #{rank + 1} file_id={h.file_id!r} "
                  f"distance={h.distance:.4f} text={h.text[:60]!r}")

    if args.query_text is not None:
        one(args.query_text)
        return
    print("interactive search — empty line to quit")
    while True:
        try:
            text = input("query> ").strip()
        except EOFError:
            break
        if not text:
            break
        one(text)


if __name__ == "__main__":
    from .common import run_cli

    run_cli(main)
