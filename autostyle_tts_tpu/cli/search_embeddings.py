"""Vector-only search (reference C13, milvus/search_embeddings.py): load raw
6144-d vector(s) from a JSON dump, top-k cosine search, print
file_id/text/distance — no LLM in the loop (the minimal retrieval benchmark
config in BASELINE.json). Accepts the reference's embedding-dump format
([{file_id, text, combined_embedding, ...}] or {"embedding": [...]}).
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from ..retrieval import StyleStore


def load_query_vectors(path: str) -> np.ndarray:
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    if isinstance(data, dict):
        for key in ("combined_embedding", "embedding", "vector"):
            if key in data:
                return np.asarray([data[key]], np.float32)
        data = list(data.values())
    vecs = []
    for entry in data:
        for key in ("combined_embedding", "embedding", "vector"):
            if key in entry:
                vecs.append(entry[key])
                break
    if not vecs:
        raise ValueError(f"no embedding vectors found in {path}")
    return np.asarray(vecs, np.float32)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--query_json", type=str, required=True)
    p.add_argument("--db_path", type=str, required=True)
    p.add_argument("--top_k", type=int, default=5)
    p.add_argument("--max_queries", type=int, default=0, help="0 = all")
    args = p.parse_args(argv)

    store = StyleStore.load(args.db_path)
    q = load_query_vectors(args.query_json)
    if args.max_queries:
        q = q[: args.max_queries]
    print(f"{q.shape[0]} queries (dim {q.shape[1]}) against {len(store)} vectors")
    hits = store.search(q, k=args.top_k)
    for qi, hl in enumerate(hits):
        print(f"query {qi}:")
        for rank, h in enumerate(hl):
            print(f"  #{rank + 1} file_id={h.file_id!r} distance={h.distance:.4f} "
                  f"text={h.text[:60]!r}")


if __name__ == "__main__":
    from .common import run_cli

    run_cli(main)
