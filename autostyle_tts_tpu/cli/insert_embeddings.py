"""Style-DB build (reference C7/C8, milvus/insert_embeddings.py + RAG.py):
load style-sample manifests ({speaker, zh_text, file_id}), generate one
biography per speaker and an emotion label per utterance with the embedder
LLM, insert the 6144-d combined embeddings, self-verify, snapshot.

Replaces Milvus Lite collection create/insert (insert_embeddings.py:43-80,
:519) with the in-HBM StyleStore + npz snapshot. Flags: --input_json(s)
--db_path --collection_name kept in spirit; embedder checkpoint/LoRA via
--embedder_checkpoint/--lora_checkpoint.
"""

from __future__ import annotations

import argparse

from ..pipeline.rag import EmbedderService, build_style_db, labels_for_language
from ..utils.manifest import load_style_manifests
from .common import add_common_args, build_config


def build_embedder(args, cfg):
    import jax

    from ..models import transformer as core

    ecfg = cfg.embedder
    tokenizer = None
    if getattr(args, "embedder_hf_dir", None):
        # real HF checkpoint (the reference's Llama-3.2-3B / Qwen2.5-7B path)
        from ..utils.hf_convert import load_hf_checkpoint

        ecfg, params = load_hf_checkpoint(args.embedder_hf_dir)
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(jnp.asarray, params)
        import transformers

        tokenizer = transformers.AutoTokenizer.from_pretrained(args.embedder_hf_dir)
    else:
        if getattr(args, "quantize_base", False):
            # int8 frozen base (the reference served its embedder 8-bit,
            # milvus/RAG.py:89-92): the only way a 3B base + adapter fits
            # one 15.75G chip next to anything else
            params = core.init_params_quantized(
                jax.random.PRNGKey(args.seed), ecfg, bits=8
            )
        else:
            params = core.init_params(jax.random.PRNGKey(args.seed), ecfg)
        if getattr(args, "embedder_checkpoint", None):
            from ..utils.checkpoint import load_pytree

            params = load_pytree(args.embedder_checkpoint, params)
    lora = None
    lora_scale = 0.0
    if getattr(args, "lora_checkpoint", None):
        from ..utils.checkpoint import load_pytree

        import jax.numpy as jnp

        lora0 = core.init_lora(jax.random.PRNGKey(0), ecfg, cfg.train.lora.r)
        # f16 artifact (artifacts/ft3b/adapter_f16.npz) loads fine; compute
        # in f32 like training did
        lora = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32),
            load_pytree(args.lora_checkpoint, lora0),
        )
        lora_scale = cfg.train.lora.alpha / cfg.train.lora.r
    if tokenizer is None and getattr(args, "bpe_path", None):
        from ..models.bpe import BPETokenizer

        tokenizer = BPETokenizer.load(args.bpe_path)
    return EmbedderService(
        ecfg, params, lora=lora, lora_scale=lora_scale, tokenizer=tokenizer,
        labels=labels_for_language(getattr(args, "language", "en")),
        language=getattr(args, "language", "en"),
    )


def add_embedder_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--embedder_checkpoint", type=str, default=None,
                   help="framework npz param snapshot")
    p.add_argument("--embedder_hf_dir", type=str, default=None,
                   help="local HF checkpoint dir (Llama/Qwen2) — converted on load")
    p.add_argument("--lora_checkpoint", type=str, default=None)
    p.add_argument("--quantize_base", action="store_true",
                   help="int8 frozen base via the bounded layer-at-a-time "
                        "builder (RAG.py:89-92 8-bit serving parity)")
    p.add_argument("--language", type=str, default="en", choices=("en", "zh"),
                   help="emotion label set for classification prompts "
                        "(zh = the 7-label CN set, reformat_data_ft_llm_cn.py)")
    p.add_argument("--bpe_path", type=str, default=None,
                   help="trained framework BPE vocab (models/bpe.py) — 512 "
                        "embed truncation then counts tokens, not bytes")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    add_embedder_args(p)
    p.add_argument("--input_json", type=str, nargs="+", required=True,
                   help="style-sample manifest JSON(s)")
    p.add_argument("--db_path", type=str, required=True,
                   help="output snapshot path (npz + meta sidecar)")
    p.add_argument("--capacity", type=int, default=4096)
    p.add_argument("--style_wav_dir", type=str, default=None,
                   help="featurize wav_dir/file_id[.wav] at insert time and "
                        "store speech tokens/mel/spk as DB artifacts so "
                        "serving needs no wav loads (tts_with_rag --style_db)")
    p.add_argument("--dump_embeddings", type=str, default=None,
                   help="also write a reference-shaped embedding dump JSON "
                        "([{file_id, text, combined_embedding, ...}], like "
                        "output_emb/embeddings_biographies_en.json)")
    args = p.parse_args(argv)

    cfg = build_config(args)
    embedder = build_embedder(args, cfg)
    samples = load_style_manifests(args.input_json)
    print(f"loaded {len(samples)} style samples from {len(args.input_json)} file(s)")
    engine = None
    if args.style_wav_dir:
        from .common import build_engine

        engine = build_engine(args)
    store = build_style_db(
        embedder, samples, capacity=args.capacity,
        engine=engine, wav_dir=args.style_wav_dir or "",
    )
    store.save(args.db_path)
    print(f"inserted {len(store)} vectors (dim {store.dim}); "
          f"self-verify ok; snapshot -> {args.db_path}")
    if args.dump_embeddings:
        import json

        import numpy as np

        n = len(store)
        vecs = np.asarray(store.db[:n])
        dump = [
            {
                **store.meta[i],
                "combined_embedding": vecs[i].tolist(),
                "combined_embedding_shape": [store.dim],
            }
            for i in range(n)
        ]
        from pathlib import Path

        Path(args.dump_embeddings).parent.mkdir(parents=True, exist_ok=True)
        with open(args.dump_embeddings, "w", encoding="utf-8") as f:
            json.dump(dump, f, ensure_ascii=False)
        print(f"embedding dump -> {args.dump_embeddings}")


if __name__ == "__main__":
    from .common import run_cli

    run_cli(main)
