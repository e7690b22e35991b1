"""RAG layer: embedding contracts, generation shapes, DB build pipeline,
dialog search rows + ablations (reference C7-C13 behaviours at tiny scale)."""

import jax
import numpy as np
import pytest

from autostyle_tts_tpu.models import frontend
from autostyle_tts_tpu.models import transformer as core
from autostyle_tts_tpu.pipeline.rag import (
    DialogTurn,
    EmbedderService,
    build_style_db,
    search_dialog,
)
from autostyle_tts_tpu.utils.config import TransformerConfig
from autostyle_tts_tpu.utils.manifest import StyleSample


@pytest.fixture(scope="module")
def embedder():
    cfg = TransformerConfig(
        vocab_size=frontend.VOCAB_SIZE, dim=32, n_layers=2, n_heads=4,
        n_kv_heads=2, ffn_dim=64, max_seq_len=1600, dtype="float32",
    )
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    return EmbedderService(cfg, params)


def test_embed_shape_and_determinism(embedder):
    e1 = embedder.embed(["hello world", "你好"])
    e2 = embedder.embed(["hello world", "你好"])
    assert e1.shape == (2, 32) and e1.dtype == np.float32
    np.testing.assert_allclose(e1, e2, atol=1e-6)
    assert not np.allclose(e1[0], e1[1])


def test_combined_embedding_halves(embedder):
    c = embedder.combined_embedding(["happy"], ["a biography"])
    assert c.shape == (1, 64)
    np.testing.assert_allclose(c[0, :32], embedder.embed(["happy"])[0], atol=1e-5)
    np.testing.assert_allclose(c[0, 32:], embedder.embed(["a biography"])[0], atol=1e-5)


def test_emotion_label_always_in_set(embedder):
    labels = embedder.emotion_labels(["I am so glad!", "terrible news", "ok"])
    assert all(l in embedder.labels or l == "neutral" for l in labels)
    assert len(labels) == 3


def test_biography_batched(embedder):
    bios = embedder.biographies([("A: hi\nB: hello", "A"), ("A: x", "B")])
    assert len(bios) == 2
    assert all(isinstance(b, str) for b in bios)


def test_generate_kv_budget_chunking(embedder, monkeypatch):
    """A KV budget smaller than the batch forces _generate to chunk; greedy
    decoding must be bit-identical to the single-call path (the 3B OOM fix:
    a bucket-of-32 bio batch allocated a 4.7 GB cache next to the int8 base)."""
    from autostyle_tts_tpu.pipeline import rag as rag_mod

    texts = ["glad tidings", "terrible news", "fine", "angry words", "meh"]
    whole = embedder.emotion_labels(texts)
    row = (embedder.cfg.n_layers * (512 + rag_mod.EMOTION_MAX_NEW + 1)
           * embedder.cfg.n_kv_heads * embedder.cfg.head_dim * 4)
    monkeypatch.setattr(rag_mod, "GEN_KV_BUDGET_BYTES", 2 * row)
    chunked = embedder.emotion_labels(texts)  # cap=2 -> 3 device calls
    assert chunked == whole


def test_erc_chat_serving_mode(embedder):
    """Chat-format emotion labeling (the ERC fine-tune's training format)
    yields valid labels; 'auto' turns it on exactly when an adapter rides a
    byte-frontend service."""
    from autostyle_tts_tpu.pipeline.rag import EmbedderService

    chat = EmbedderService(embedder.cfg, embedder.params, erc_chat=True)
    labels = chat.emotion_labels(["I am so glad!", "terrible news"])
    assert len(labels) == 2
    assert all(l in chat.labels or l == "neutral" for l in labels)

    assert not embedder.erc_chat  # no adapter -> plain EMOTION_PROMPT
    lora = core.init_lora(jax.random.PRNGKey(1), embedder.cfg, 4)
    tuned = EmbedderService(embedder.cfg, embedder.params, lora=lora,
                            lora_scale=1.0)
    assert tuned.erc_chat


def test_embed_budget_chunking(embedder, monkeypatch):
    """Same budget mechanism on the embed forward (the 256-row combined-
    embedding call OOM'd at 3B): chunked == whole-batch embeddings."""
    from autostyle_tts_tpu.pipeline import rag as rag_mod

    texts = [f"sample text number {i}" for i in range(5)]
    whole = embedder.embed(texts)
    row = rag_mod.EMBED_MAX_TOKENS * embedder.cfg.dim * 2 * 8
    monkeypatch.setattr(rag_mod, "GEN_KV_BUDGET_BYTES", 2 * row)
    chunked = embedder.embed(texts)
    np.testing.assert_allclose(chunked, whole, atol=1e-5)


def _samples():
    return [
        StyleSample(speaker="w1", zh_text=f"utterance {i} about topic {i%3}", file_id=f"denoise_{i}.wav")
        for i in range(6)
    ] + [
        StyleSample(speaker="m1", zh_text=f"different voice line {i}", file_id=f"denoise_m{i}.wav")
        for i in range(4)
    ]


def test_build_style_db_and_verify(embedder):
    store = build_style_db(embedder, _samples(), capacity=64, batch=4)
    assert len(store) == 10
    assert store.self_verify(sample=10)
    assert store.meta[0]["file_id"] == "denoise_0.wav"
    assert "emotion" in store.meta[0]


def test_search_dialog_rows_and_prefix(embedder):
    store = build_style_db(embedder, _samples(), capacity=64, batch=4)
    turns = [DialogTurn("utterance 1 about topic 1", "w1"),
             DialogTurn("different voice line 2", "m1")]
    rows = search_dialog(
        embedder, store, turns, file_prefix_path="/data/styles"
    )
    assert len(rows) == 2
    for r in rows:
        assert r.retrieved_file_id.startswith("/data/styles/denoise_")
        assert 0.0 <= r.distance <= 1.0 + 1e-5
        assert r.retrieved_text


def test_search_dialog_ablations_differ(embedder):
    store = build_style_db(embedder, _samples(), capacity=64, batch=4)
    turns = [DialogTurn("utterance 0 about topic 0", "w1")]
    full = search_dialog(embedder, store, turns)
    emo = search_dialog(embedder, store, turns, ablation="emotion_only")
    bio = search_dialog(embedder, store, turns, ablation="bio_only")
    # ablated scores must be <= full combined score (half the signal)
    assert emo[0].distance <= full[0].distance + 1e-5
    assert bio[0].distance <= full[0].distance + 1e-5


def test_search_dialog_round_trips_jsonl(tmp_path, embedder):
    from autostyle_tts_tpu.utils.manifest import JsonDataReader, write_jsonl

    store = build_style_db(embedder, _samples(), capacity=64, batch=4)
    rows = search_dialog(embedder, store, [DialogTurn("hello", "w1")])
    p = tmp_path / "search_results.jsonl"
    write_jsonl(p, (r.to_dict() for r in rows))
    back = JsonDataReader(p)
    assert back[0].retrieved_file_id == rows[0].retrieved_file_id
