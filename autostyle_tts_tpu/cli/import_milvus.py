"""Migrate a Milvus Lite .db (the reference's vector store format,
milvus/milvus_demo.db) into a StyleStore snapshot — existing AutoStyle-TTS
deployments switch without re-embedding their style corpus."""

from __future__ import annotations

import argparse

from ..retrieval.milvus_import import import_milvus_db, list_collections


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--milvus_db", type=str, required=True)
    p.add_argument("--collection", type=str, default=None,
                   help="default: the largest non-empty collection")
    p.add_argument("--out", type=str, required=True, help="StyleStore snapshot path")
    p.add_argument("--list", action="store_true", help="list collections and exit")
    args = p.parse_args(argv)

    if args.list:
        for c in list_collections(args.milvus_db):
            print(c)
        return
    store = import_milvus_db(args.milvus_db, args.collection)
    ok = store.self_verify(sample=min(64, len(store)))
    store.save(args.out)
    print(f"imported {len(store)} vectors (dim {store.dim}) -> {args.out}; "
          f"self-verify {'ok' if ok else 'FAILED'}")


if __name__ == "__main__":
    from .common import run_cli

    run_cli(main)
