"""BPE tokenizer: training, roundtrip, CJK plane, frontend/engine/embedder
integration (VERDICT round-1 gap #4: byte-level inflated ZH ~3x and made the
512 embed truncation bytes instead of tokens, reference RAG.py:129)."""

import numpy as np
import pytest

from autostyle_tts_tpu.models import bpe, frontend
from autostyle_tts_tpu.models.bpe import BPETokenizer, train_bpe

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the dog sleeps and the fox runs through the forest",
    "hello world, hello there, hello again and again",
    "what do you think about the characteristics of the speaker",
] * 10


@pytest.fixture(scope="module")
def tok():
    return train_bpe(CORPUS, n_merges=200)


def test_train_learns_merges(tok):
    assert 10 < len(tok.merges) <= 200
    # frequent words compress below byte length
    ids = tok.encode_segment("the hello speaker")
    assert len(ids) < len("the hello speaker".encode("utf-8"))


def test_roundtrip_ascii(tok):
    for t in ["hello world!", "the quick brown fox", "abc 123 xyz?!"]:
        assert tok.decode_segment(tok.encode_segment(t)) == t


def test_roundtrip_mixed_and_unseen(tok):
    # chars never seen in training fall back to bytes, still lossless
    for t in ["schön grüß", "emoji 🎉 ok", "tab\tand\nnewline"]:
        assert tok.decode_segment(tok.encode_segment(t)) == t


def test_cjk_plane_3x_compression(tok):
    zh = "今天天气真好我们一起去公园散步吧"
    ids = tok.encode_segment(zh)
    assert len(ids) == len(zh)  # 1 token per han char
    assert len(zh.encode("utf-8")) == 3 * len(ids)  # exactly 3x vs bytes
    assert tok.decode_segment(ids) == zh
    # ids are deterministic codepoint offsets, independent of training data
    assert ids[0] == bpe.CJK_BASE + (ord("今") - bpe.CJK_LO)


def test_kana_plane(tok):
    jp = "こんにちはカタカナ"
    ids = tok.encode_segment(jp)
    assert len(ids) == len(jp)
    assert all(bpe.KANA_BASE <= i < bpe.VOCAB_SIZE for i in ids)
    assert tok.decode_segment(ids) == jp


def test_save_load_identical(tok, tmp_path):
    p = tmp_path / "vocab.json"
    tok.save(p)
    tok2 = BPETokenizer.load(p)
    t = "the quick brown fox 公园 こんにちは"
    assert tok.encode_segment(t) == tok2.encode_segment(t)


def test_frontend_encode_with_bpe(tok):
    ids = frontend.encode("hello the world", tokenizer=tok)
    byte_ids = frontend.encode("hello the world")
    assert ids[0] == frontend.BOS_ID and ids[-1] == frontend.EOS_ID
    assert len(ids) < len(byte_ids)
    assert frontend.decode(ids, tokenizer=tok) == "hello the world"
    # language tags still work
    ids_zh = frontend.encode("<|zh|>你好世界", tokenizer=tok)
    assert frontend.LANG_TAGS["zh"] in ids_zh.tolist()


def test_frontend_tn_numbers():
    ids = frontend.encode("I have 21 cats", numbers=True)
    assert frontend.decode(ids) == "I have twenty-one cats"
    ids_zh = frontend.encode("我有21只猫", numbers=True)
    assert frontend.decode(ids_zh) == "我有二十一只猫"


def test_shipped_vocab_loads():
    tok = BPETokenizer.load("vocab/bpe_en_2k.json")
    assert len(tok.merges) > 1000
    s = "So, we're on the beach, and he gets down on one knee."
    ids = tok.encode_segment(s)
    assert len(ids) < 0.5 * len(s.encode("utf-8"))  # >2x on in-domain text
    assert tok.decode_segment(ids) == s


def test_engine_with_bpe_frontend(tmp_path):
    """Full tiny engine with frontend.tokenizer='bpe' — vocab assert + e2e."""
    import dataclasses

    from autostyle_tts_tpu.pipeline.engine import Engine
    from autostyle_tts_tpu.utils.config import tiny_config

    tok = train_bpe(CORPUS, n_merges=64)
    vp = tmp_path / "v.json"
    tok.save(vp)
    cfg = tiny_config()
    cfg.frontend.tokenizer = "bpe"
    cfg.frontend.bpe_path = str(vp)
    with pytest.raises(AssertionError):
        Engine(cfg)  # tiny text vocab (272) < BPE vocab
    cfg.token_lm = dataclasses.replace(
        cfg.token_lm, text_vocab_size=bpe.VOCAB_SIZE
    )
    eng = Engine(cfg)
    sr = cfg.audio.prompt_sample_rate
    t = np.arange(sr) / sr
    prompt = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    out = next(iter(eng.inference_zero_shot(
        "the quick brown fox", "hello there", prompt
    )))
    wav = np.asarray(out["tts_speech"]).ravel()
    assert wav.size > 0 and np.isfinite(wav).all()


def test_embedder_truncation_counts_tokens():
    """With BPE, the 512 truncation is ~3x more text than with bytes."""
    from autostyle_tts_tpu.pipeline.rag import EmbedderService

    tok = BPETokenizer.load("vocab/bpe_en_2k.json")
    from autostyle_tts_tpu.utils.config import tiny_config
    import dataclasses
    import jax

    from autostyle_tts_tpu.models import transformer as core

    ecfg = dataclasses.replace(
        tiny_config().embedder, vocab_size=bpe.VOCAB_SIZE
    )
    params = core.init_params(jax.random.PRNGKey(0), ecfg)
    svc = EmbedderService(ecfg, params, tokenizer=tok)
    long_text = "the quick brown fox jumps over the lazy dog " * 40
    ids = svc._encode(long_text, 64)
    assert len(ids) == 64
    covered = frontend.decode(ids, tokenizer=tok)
    byte_covered = long_text[:64]  # what 64 BYTES would have covered
    assert len(covered) > 2 * len(byte_covered)


def test_zh_learned_merges_roundtrip_and_compression():
    """Round-2 VERDICT weak #6: ZH got only the static char plane. Learned
    plane-id merges must (a) round-trip exactly, (b) beat the plane's
    1 char = 1 token on in-distribution text, (c) persist through v2 JSON."""
    from autostyle_tts_tpu.models.bpe import (
        BPETokenizer, train_bpe, train_bpe_zh,
    )

    corpus = [
        "请根据上述对话判断说话人的情感状态。",
        "说话人的情感状态是开心。",
        "说话人的情感状态是愤怒。",
        "请判断下面说话人的情感。",
        "对话中说话人的情感是悲伤。",
    ] * 3
    base = train_bpe(corpus, n_merges=8)
    zh = train_bpe_zh(corpus, n_merges=64, n_base_merges=len(base.merges))
    assert len(zh) > 0
    tok = BPETokenizer(base.merges, zh)
    for t in corpus[:5]:
        ids = tok.encode_segment(t)
        assert tok.decode_segment(ids) == t
        # fewer tokens than characters -> merges actually fire
        assert len(ids) < len(t)
    plane_only = BPETokenizer(base.merges)
    t = corpus[0]
    ratio = len(plane_only.encode_segment(t)) / len(tok.encode_segment(t))
    assert ratio > 1.2, ratio


def test_zh_merges_persistence(tmp_path):
    from autostyle_tts_tpu.models.bpe import BPETokenizer, train_bpe_zh

    corpus = ["我们在说话", "我们不说话", "我们说话了"] * 4
    zh = train_bpe_zh(corpus, n_merges=16)
    tok = BPETokenizer([], zh)
    p = tmp_path / "v.json"
    tok.save(p)
    back = BPETokenizer.load(p)
    assert back.zh_merges == tok.zh_merges
    t = "我们在说话"
    assert back.encode_segment(t) == tok.encode_segment(t)
    assert back.decode_segment(back.encode_segment(t)) == t


def test_shipped_multilingual_vocab():
    """vocab/bpe_multi_2k.json: EN merges + ZH plane merges trained on the
    reference's own text (IEMOCAP EN + the CN prompt corpus — see
    scripts/extract_zh_corpus.py for why that IS the serving-time ZH)."""
    from pathlib import Path

    from autostyle_tts_tpu.models.bpe import BPETokenizer

    p = Path(__file__).parent.parent / "vocab" / "bpe_multi_2k.json"
    tok = BPETokenizer.load(p)
    assert len(tok.merges) >= 1024
    assert len(tok.zh_merges) >= 100
    zh = "请根据对话判断说话人的情感状态。"
    ids = tok.encode_segment(zh)
    assert tok.decode_segment(ids) == zh
    assert len(ids) < len(zh), (len(ids), len(zh))
    en = "He finished the race in record time."
    ids_en = tok.encode_segment(en)
    assert tok.decode_segment(ids_en) == en
    assert len(ids_en) < len(en.encode("utf-8"))


def test_zh_merge_heap_matches_quadratic_reference():
    """_merge_zh_run moved to a linked-list+heap (O(n log n)); it must pick
    the same (lowest-rank, leftmost) merge sequence as the straightforward
    full-rescan-per-merge implementation it replaced."""
    from autostyle_tts_tpu.models.bpe import CJK_BASE, BPETokenizer, train_bpe_zh

    rng = np.random.default_rng(7)
    corpus = [
        "".join(chr(0x4E00 + int(c)) for c in rng.integers(0, 6, 40))
        for _ in range(50)
    ]
    zh = train_bpe_zh(corpus, n_merges=48)
    tok = BPETokenizer([], zh)
    assert len(tok.zh_merges) > 8

    def quadratic(run):
        parts = list(run)
        while len(parts) > 1:
            best, bi = None, -1
            for i in range(len(parts) - 1):
                r = tok.zh_ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            parts[bi : bi + 2] = [tok.zh_id_of_rank[best]]
        return parts

    for _ in range(200):
        n = int(rng.integers(2, 60))
        run = [CJK_BASE + int(x) for x in rng.integers(0, 6, n)]
        assert tok._merge_zh_run(run) == quadratic(run)


def test_vocab_version_gate(tmp_path):
    """A vocab written by a NEWER format version must fail loudly, not load
    partially (silently dropping fields corrupts decoded text)."""
    import json as _json

    p = tmp_path / "future.json"
    p.write_text(_json.dumps({"version": 3, "merges": []}))
    with pytest.raises(ValueError, match="version"):
        BPETokenizer.load(p)


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
