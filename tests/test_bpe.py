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
