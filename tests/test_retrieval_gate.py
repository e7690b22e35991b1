"""The paper's core claim, closed end-to-end as a gated number (round-3
VERDICT #4): a LoRA-SFT'd style embedder retrieves better than the base.

Mechanism under test = the reference's actual retrieval mechanism
(milvus/search_json.py:382-411): the LLM predicts an emotion label for the
turn, the label text is embedded, and the query matches the style DB by
cosine. Fine-tuning on ERC (src/ft_llm.py:88-157) improves label prediction,
which improves retrieval THROUGH the embedding.

Setup: six emotion classes realized by DISJOINT synonym sets on the DB and
query sides, so surface byte overlap cannot solve retrieval — only a model
that maps synonyms to the shared label clusters them. The base (random-init)
model retrieves at chance; ~360 SFT steps at toy geometry lift label accuracy
to ~0.65 and precision@5 to ~2.4x chance (CPU, minutes — the ablation CLIs
C11/C12 exist to measure exactly this split on real data)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autostyle_tts_tpu.models import frontend
from autostyle_tts_tpu.models import transformer as core
from autostyle_tts_tpu.pipeline.rag import EmbedderService
from autostyle_tts_tpu.retrieval import StyleStore
from autostyle_tts_tpu.train import lora_sft
from autostyle_tts_tpu.utils.config import TrainConfig, TransformerConfig

pytestmark = pytest.mark.slow

# (db-side synonyms, query-side synonyms) per class — deliberately disjoint
SYN = {
    "happy":      (["delighted", "joyful", "thrilled"], ["cheerful", "glad"]),
    "sad":        (["miserable", "gloomy", "sorrowful"], ["downcast", "blue"]),
    "angry":      (["furious", "irate", "enraged"], ["livid", "cross"]),
    "neutral":    (["ordinary", "routine", "plain"], ["regular", "typical"]),
    "excited":    (["ecstatic", "exhilarated", "eager"], ["pumped", "stoked"]),
    "frustrated": (["stuck", "thwarted", "annoyed"], ["exasperated", "irked"]),
}
LABELS = list(SYN)
TEMPL = ["i feel so {w} about this", "that makes me {w} honestly",
         "what a {w} day it has been", "she sounded {w} on the phone",
         "he was {w} when it happened"]


def _sentences(words, n, seed):
    rng = np.random.default_rng(seed)
    return [
        TEMPL[rng.integers(len(TEMPL))].format(w=words[rng.integers(len(words))])
        for _ in range(n)
    ]


def _sample(text, lab=None):
    msgs = [{"role": "system", "content": "label the emotion"},
            {"role": "user", "content": text}]
    if lab is not None:
        msgs.append({"role": "assistant", "content": lab})
    return {"messages": msgs}


def test_sft_improves_retrieval():
    cfg = TransformerConfig(
        vocab_size=frontend.VOCAB_SIZE, dim=64, n_layers=2, n_heads=4,
        n_kv_heads=4, ffn_dim=128, max_seq_len=128, dtype="float32",
    )
    tcfg = TrainConfig(batch_size=8, grad_accum=1, max_seq_len=64,
                       learning_rate=3e-3, remat=False, neftune_alpha=0.0)
    params = core.init_params(jax.random.PRNGKey(0), cfg)

    train_samples = []
    for li, lab in enumerate(LABELS):
        for s in _sentences(SYN[lab][0] + SYN[lab][1], 40, li):
            train_samples.append(_sample(s, lab))

    db, dbl, q, ql = [], [], [], []
    for li, lab in enumerate(LABELS):
        for s in _sentences(SYN[lab][0], 8, 100 + li):
            db.append(s)
            dbl.append(lab)
        for s in _sentences(SYN[lab][1], 4, 200 + li):
            q.append(s)
            ql.append(lab)

    opt = lora_sft.make_optimizer(tcfg, 400)
    step = lora_sft.make_train_step(cfg, tcfg, opt, packed=True)
    lora = core.init_lora(jax.random.PRNGKey(1), cfg, tcfg.lora.r)
    ost = opt.init(lora)
    n = 0
    for epoch in range(12):
        for b in lora_sft.make_packed_batches(
            train_samples, 64, 8, seed=epoch, pad_to_batch=True
        ):
            lora, ost, _ = step(
                lora, ost, params,
                jnp.asarray(b.tokens), jnp.asarray(b.loss_mask),
                jnp.asarray(b.segment_ids), jax.random.PRNGKey(n),
            )
            n += 1
    lscale = tcfg.lora.alpha / tcfg.lora.r

    def precision_at_5(lora_, lscale_):
        # label each text via the training-matched chat protocol (the
        # reference's generation-based eval, ft_llm.py:88-157), then run
        # the production embed + cosine-top-k retrieval
        _, preds_db = lora_sft.evaluate_generation(
            params, cfg, [_sample(t, l) for t, l in zip(db, dbl)], LABELS,
            lora=lora_, lora_scale=lscale_, max_prompt=64, max_new=8,
        )
        _, preds_q = lora_sft.evaluate_generation(
            params, cfg, [_sample(t, l) for t, l in zip(q, ql)], LABELS,
            lora=lora_, lora_scale=lscale_, max_prompt=64, max_new=8,
        )
        # reference falls back to 'neutral' on an unparseable label
        preds_db = [p or "neutral" for p in preds_db]
        preds_q = [p or "neutral" for p in preds_q]
        emb = EmbedderService(cfg, params, lora=lora_, lora_scale=lscale_,
                              labels=LABELS)
        store = StyleStore(dim=cfg.dim, capacity=128)
        store.insert(
            emb.embed(preds_db, width=16),
            [{"file_id": str(i), "text": db[i]} for i in range(len(db))],
        )
        _, idx = store.search_arrays(emb.embed(preds_q, width=16), k=5)
        hits = sum(dbl[j] == ql[i] for i in range(len(q)) for j in idx[i])
        acc = float(np.mean([p == t for p, t in zip(preds_q, ql)]))
        return hits / (len(q) * 5), acc

    p_base, acc_base = precision_at_5(None, 0.0)
    p_tuned, acc_tuned = precision_at_5(lora, lscale)

    chance = 1.0 / len(LABELS)
    # base: random-init labels are noise -> retrieval at ~chance
    assert p_base < chance * 1.8, (p_base, chance)
    # tuned: labels become informative and retrieval rises well above both
    # chance and the base embedder (measured ~0.40 vs 0.167 at this seed)
    assert acc_tuned > acc_base + 0.25, (acc_base, acc_tuned)
    assert p_tuned > chance * 1.8, (p_tuned, chance)
    assert p_tuned > p_base + 0.15, (p_base, p_tuned)
