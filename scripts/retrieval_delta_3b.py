"""Retrieval delta from the trained 3B adapter, through the production
ablation mechanism (r4 VERDICT #2, last clause).

The reference's C11/C12 ablations (search_json_ab_text.py:406-420) measure
retrieval with only the emotion half of the combined query. This script runs
that exact mechanism at the REAL Llama-3.2-3B geometry on the real IEMOCAP
valid split, with the base embedder vs base + the artifacts/ft3b adapter:

  DB side     256 turns -> per-turn predicted emotion label ->
              combined_embedding(label, placeholder bio) -> StyleStore
  query side  256 disjoint turns -> search_dialog(ablation="emotion_only")
  metric      precision@k = retrieved row's GOLD label == query turn's GOLD
              label (the adapter never sees gold labels at serve time)

Both sides run through the same model, exactly like production: a better
ERC classifier clusters turns by true emotion, so same-gold precision rises
above the class-prior matching baseline sum_c p_q(c) * p_db(c).

Writes artifacts/ft3b/retrieval_delta.json.

  python scripts/retrieval_delta_3b.py [--n 256] [--k 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
DATA = Path("/root/reference/data")


WINDOW = 5  # the fine-tune's ±context window (train_llm.sh:21)


def valid_conversations():
    """[(text, gold_label, speaker)] per conversation in the valid split,
    in utterance order (the dialog structure production inputs carry)."""
    from autostyle_tts_tpu.train.reformat import EN_LABELS

    convs = json.loads((DATA / "iemocap.valid.json").read_text())
    out = []
    for conv_id, conv in convs.items():
        genders = conv.get("genders", [])
        rows = []
        for i, (lab, text) in enumerate(zip(conv["labels"], conv["sentences"])):
            g = genders[i] if i < len(genders) else "X"
            rows.append((text, EN_LABELS[int(lab)], f"{conv_id}_{g}"))
        out.append(rows)
    return out


def window_contexts(conv):
    """±WINDOW dialog context per turn, the training prompt shape
    (reformat.context_window)."""
    lines = [f" {s}: {t}" for t, _, s in conv]
    return [
        "\n".join(lines[max(0, i - WINDOW) : i + WINDOW + 1])
        for i in range(len(conv))
    ]


def run_side(emb, db_convs, query_convs, k: int):
    """Insert DB conversations, query with the emotion-only ablation through
    the production dialog path (context_window=WINDOW), score @1/@k."""
    from autostyle_tts_tpu.pipeline.rag import (
        PLACEHOLDER_BIO, DialogTurn, search_dialog,
    )
    from autostyle_tts_tpu.retrieval import StyleStore

    store = StyleStore(dim=2 * emb.cfg.dim, capacity=1024)
    golds_db = []
    for conv in db_convs:
        emotions = emb.emotion_labels(
            [t for t, _, _ in conv],
            contexts=window_contexts(conv),
            names=[s for _, _, s in conv],
        )
        vecs = emb.combined_embedding(
            emotions, [PLACEHOLDER_BIO] * len(conv)
        )
        store.insert(
            vecs,
            [
                {"file_id": str(len(golds_db) + i), "text": t, "emotion": e}
                for i, ((t, _, _), e) in enumerate(zip(conv, emotions))
            ],
        )
        golds_db.extend(g for _, g, _ in conv)

    # precision@1 through the full production path, one dialog at a time
    p1_hits, accs = [], []
    pk_hits = []
    for conv in query_convs:
        turns = [DialogTurn(zh_text=t, speaker=s) for t, _, s in conv]
        rows = search_dialog(
            emb, store, turns, top_k=k, ablation="emotion_only",
            context_window=WINDOW,
        )
        p1_hits.extend(
            golds_db[r.retrieved_index] == g
            for r, (_, g, _) in zip(rows, conv)
            if r.retrieved_index is not None
        )
        # @k + label accuracy through the same windowed query construction
        emotions_q = emb.emotion_labels(
            [t for t, _, _ in conv],
            contexts=window_contexts(conv),
            names=[s for _, _, s in conv],
        )
        accs.extend(e == g for e, (_, g, _) in zip(emotions_q, conv))
        qv = emb.combined_embedding(
            emotions_q, [PLACEHOLDER_BIO] * len(conv)
        )
        half = qv.shape[1] // 2
        qv[:, half:] = 0.0
        qv /= np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-12)
        hits = store.search(qv, k=k)
        pk_hits.extend(
            np.mean([golds_db[h.index] == g for h in hl]) if hl else 0.0
            for hl, (_, g, _) in zip(hits, conv)
        )
    p1 = float(np.mean(p1_hits))
    pk = float(np.mean(pk_hits))
    acc = float(np.mean(accs))
    return {"precision_at_1": round(p1, 4), f"precision_at_{k}": round(pk, 4),
            "label_accuracy_serving_prompt": round(acc, 4)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256, help="turns per side")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--art", type=str, default=str(REPO / "artifacts" / "ft3b"))
    p.add_argument("--dry", action="store_true",
                   help="CPU validation: tiny geometry, random adapter")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from autostyle_tts_tpu.models import transformer as core
    from autostyle_tts_tpu.pipeline.rag import EmbedderService
    from autostyle_tts_tpu.utils.checkpoint import load_pytree
    from autostyle_tts_tpu.utils.config import Config

    art = Path(args.art)
    tcfg = Config().train
    if args.dry:
        from autostyle_tts_tpu.utils.config import tiny_config

        meta = {"seed": 42}
        cfg = tiny_config().embedder
        args.n = min(args.n, 24)
    else:
        meta = json.loads((art / "meta.json").read_text())
        cfg = Config().embedder

    convs = valid_conversations()
    rng = np.random.default_rng(0)
    order = rng.permutation(len(convs))
    # disjoint CONVERSATIONS per side (dialog context stays intact), turns
    # capped at args.n per side
    db, queries, nd, nq = [], [], 0, 0
    for idx in order:
        conv = convs[idx]
        if nd <= nq and nd < args.n:
            db.append(conv[: args.n - nd]); nd += len(db[-1])
        elif nq < args.n:
            queries.append(conv[: args.n - nq]); nq += len(queries[-1])
    db_flat = [x for c in db for x in c]
    q_flat = [x for c in queries for x in c]
    p_db = {g: np.mean([x[1] == g for x in db_flat])
            for g in set(x[1] for x in db_flat)}
    p_q = {g: np.mean([x[1] == g for x in q_flat]) for g in p_db}
    chance = float(sum(p_db[g] * p_q[g] for g in p_db))

    params = core.init_params_quantized(
        jax.random.PRNGKey(int(meta["seed"])), cfg, bits=8
    )
    lora0 = core.init_lora(jax.random.PRNGKey(0), cfg, tcfg.lora.r)
    lora = lora0 if args.dry else jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32),
        load_pytree(art / "adapter_f16.npz", lora0),
    )

    # both sides serve through the ERC chat format (the adapter's training
    # distribution) so the delta isolates the ADAPTER, not the prompt shape:
    # served via the plain EMOTION_PROMPT instead, the tuned side measured
    # IDENTICAL to base (every prediction fell back to 'neutral')
    t0 = time.time()
    base = run_side(
        EmbedderService(cfg, params, erc_chat=True), db, queries, args.k
    )
    print(f"base: {base} ({time.time() - t0:.1f}s)", flush=True)
    t0 = time.time()
    tuned = run_side(
        EmbedderService(
            cfg, params, lora=lora, lora_scale=tcfg.lora.alpha / tcfg.lora.r
        ),
        db, queries, args.k,
    )
    print(f"tuned: {tuned} ({time.time() - t0:.1f}s)", flush=True)

    out = {
        "mechanism": "C12 emotion_only ablation (search_json_ab_text.py:"
                     "406-420 contract) at llama32_3b geometry, real valid "
                     "split (disjoint conversations per side), gold-label "
                     "precision; BOTH sides labeled via the ERC chat format "
                     "with ±5-turn dialog context (search_dialog "
                     "context_window=5 — the adapter's training "
                     "distribution) so only the adapter differs",
        "n_db": len(db_flat), "n_query": len(q_flat), "k": args.k,
        "chance_prior_match": round(chance, 4),
        "base": base,
        "tuned": tuned,
    }
    dst = Path("/tmp/retrieval_delta_dry.json") if args.dry \
        else art / "retrieval_delta.json"
    dst.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
