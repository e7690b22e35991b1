"""Int8 weight-only quantization + Pallas flash attention parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autostyle_tts_tpu.models import transformer as tfm
from autostyle_tts_tpu.ops import quant
from autostyle_tts_tpu.ops.attention import causal_mask, sdpa
from autostyle_tts_tpu.ops.pallas_attn import flash_attention
from autostyle_tts_tpu.utils.config import TransformerConfig


# ----------------------------------------------------------------------- quant


def test_quant_roundtrip_error_small():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    t = quant.quantize(w)
    back = quant.dequantize(t)
    err = np.abs(np.asarray(back - w)).max() / np.abs(np.asarray(w)).max()
    assert err < 0.01  # 127-level symmetric grid


def test_qmatmul_matches_dense():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    dense = x @ w
    qd = quant.qmatmul(x, quant.quantize(w))
    rel = np.abs(np.asarray(qd - dense)).max() / np.abs(np.asarray(dense)).max()
    assert rel < 0.02


def test_quantize_tree_stacked_layers():
    cfg = TransformerConfig(
        vocab_size=97, dim=32, n_layers=3, n_heads=4, n_kv_heads=2,
        ffn_dim=64, max_seq_len=64, dtype="float32",
    )
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_tree(params)
    # projections quantized, embeddings/norms untouched
    assert isinstance(qparams["layers"]["wqkv"], quant.QTensor)
    assert qparams["layers"]["wqkv"].q.dtype == jnp.int8
    # per-layer, per-output-channel scales over the fused (H+2K)*hd columns
    assert qparams["layers"]["wqkv"].s.shape == (3, 1, (4 + 2 * 2) * 8)
    assert not isinstance(qparams["tok_emb"], quant.QTensor)
    assert quant.tree_bytes(qparams) < 0.55 * quant.tree_bytes(params)


def test_quantized_forward_close_and_generate_runs():
    cfg = TransformerConfig(
        vocab_size=97, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, max_seq_len=64, dtype="float32",
    )
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_tree(params)
    tokens = jnp.asarray([[1, 2, 3, 4, 5]], jnp.int32)
    full = tfm.forward(params, cfg, tokens).logits
    qout = tfm.forward(qparams, cfg, tokens).logits
    # logits track closely in probability space
    pf = jax.nn.softmax(full, -1)
    pq = jax.nn.softmax(qout, -1)
    assert float(jnp.abs(pf - pq).max()) < 0.05
    # generate works on a quantized tree
    from autostyle_tts_tpu.ops.sampling import SamplerConfig

    toks, lens = tfm.left_pad([[1, 2, 3]], pad_id=0)
    cache = tfm.make_cache(cfg, 1, 16, jnp.float32)
    res = tfm.generate(
        qparams, cfg, jnp.asarray(toks), jnp.asarray(lens), cache,
        jax.random.PRNGKey(0), max_new_tokens=4,
        sampler=SamplerConfig.label(), eos_id=96,
    )
    assert res.tokens.shape == (1, 4)


# ----------------------------------------------------------------------- pallas flash attention


@pytest.mark.parametrize("kv_heads", [4, 2, 1])
def test_flash_matches_sdpa_causal(kv_heads):
    rng = np.random.default_rng(0)
    B, T, H, hd = 2, 128, 4, 32
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, kv_heads, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, kv_heads, hd)), jnp.float32)
    offset = jnp.asarray([0, 13], jnp.int32)  # row 1 left-padded by 13

    got = flash_attention(q, k, v, offset, block_t=64, block_s=64, interpret=True)

    slot = jnp.arange(T)
    mask = causal_mask(T, T) & (slot[None, :] >= offset[:, None])[:, None, None, :]
    ref = sdpa(q, k, v, mask)
    # padded query rows (slots < offset) attend nothing in flash; compare valid
    valid_q = (slot[None, :] >= offset[:, None])[..., None, None]
    g = np.asarray(jnp.where(valid_q, got, 0))
    r = np.asarray(jnp.where(valid_q, ref, 0))
    np.testing.assert_allclose(g, r, atol=2e-5)


def test_flash_block_boundaries():
    """T not aligned to a single block: multiple q blocks, diagonal skipping."""
    rng = np.random.default_rng(1)
    B, T, H, hd = 1, 256, 2, 16
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    offset = jnp.zeros((B,), jnp.int32)
    got = flash_attention(q, k, v, offset, block_t=64, block_s=128, interpret=True)
    ref = sdpa(q, k, v, causal_mask(T, T))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_embed_text_flash_matches_masked_sdpa(monkeypatch):
    """embed_text's flash prefill path (prefix_mask + right padding): plain
    causal attention must equal the explicit prefix-mask path on every real
    row — pad rows are pooled away (transformer.embed_text contract)."""
    cfg = TransformerConfig(
        vocab_size=211, dim=128, n_layers=2, n_heads=2, n_kv_heads=1,
        ffn_dim=128, max_seq_len=256, dtype="float32",
    )
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    B, T = 2, 128
    lens = np.asarray([T, 57])
    toks = np.zeros((B, T), np.int32)
    for i, n in enumerate(lens):
        toks[i, :n] = rng.integers(1, cfg.vocab_size, n)
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.int32)
    ref = tfm.embed_text(
        params, cfg, jnp.asarray(toks), jnp.asarray(mask), prefix_mask=False
    )
    monkeypatch.setattr(tfm, "flash_ok", lambda t, hd: True)
    got = tfm.embed_text(
        params, cfg, jnp.asarray(toks), jnp.asarray(mask), prefix_mask=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


# ----------------------------------------------------------------------- int4


def test_quant4_roundtrip_and_packing():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    t = quant.quantize4(w)
    assert t.packed.shape == (32, 32) and t.packed.dtype == jnp.uint8
    back = quant.dequantize4(t)
    err = np.abs(np.asarray(back - w)).max() / np.abs(np.asarray(w)).max()
    assert err < 0.16  # 15-level grid
    # pack/unpack is exact on the int grid
    np.testing.assert_array_equal(
        np.asarray(quant.unpack4(t)),
        np.clip(np.round(np.asarray(w) / np.asarray(t.s)), -7, 7).astype(np.int8),
    )


def test_q4matmul_matches_dense():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    qd = quant.q4matmul(x, quant.quantize4(w))
    dense = x @ w
    rel = np.abs(np.asarray(qd - dense)).max() / np.abs(np.asarray(dense)).max()
    assert rel < 0.15


def test_int4_forward_and_generate():
    cfg = TransformerConfig(
        vocab_size=97, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, max_seq_len=64, dtype="float32",
    )
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    q4 = quant.quantize_tree(params, bits=4)
    assert isinstance(q4["layers"]["wqkv"], quant.Q4Tensor)
    # ~quarter the bytes of f32 projections overall
    assert quant.tree_bytes(q4) < 0.35 * quant.tree_bytes(params)
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    out = tfm.forward(q4, cfg, tokens)
    assert np.isfinite(np.asarray(out.logits)).all()
    from autostyle_tts_tpu.ops.sampling import SamplerConfig

    toks, lens = tfm.left_pad([[1, 2]], pad_id=0)
    cache = tfm.make_cache(cfg, 1, 16, jnp.float32)
    res = tfm.generate(
        q4, cfg, jnp.asarray(toks), jnp.asarray(lens), cache,
        jax.random.PRNGKey(0), max_new_tokens=4,
        sampler=SamplerConfig.label(), eos_id=96,
    )
    assert res.tokens.shape == (1, 4)


# ----------------------------------------------------------------------- pallas fused log-mel


def test_pallas_mel_matches_xla():
    from autostyle_tts_tpu.ops import stft

    rng = np.random.default_rng(0)
    sr = 16000
    x = jnp.asarray(rng.standard_normal((2, 4000)) * 0.3, jnp.float32)
    ref = stft.log_mel_spectrogram(x, sr, 512, 160, n_mels=80, impl="xla")
    got = stft.log_mel_spectrogram(x, sr, 512, 160, n_mels=80, impl="pallas")
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_pallas_mel_1d_input_and_blocks():
    from autostyle_tts_tpu.ops import stft

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(48000) * 0.2, jnp.float32)  # >128 frames
    ref = stft.log_mel_spectrogram(x, 16000, 400, 160, n_mels=40, impl="xla")
    got = stft.log_mel_spectrogram(x, 16000, 400, 160, n_mels=40, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_kv_int8_cache_decode_parity():
    """int8 KV cache (sdpa_quant) tracks the bf16-cache decode closely and
    produces identical greedy tokens on the tiny LM."""
    import numpy as np

    from autostyle_tts_tpu.models import token_lm
    from autostyle_tts_tpu.ops.sampling import SamplerConfig
    from autostyle_tts_tpu.utils.config import tiny_config

    cfg = tiny_config().token_lm
    params = token_lm.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B = 2
    text = jnp.asarray(rng.integers(16, 200, (B, 12)), jnp.int32)
    tl = jnp.full((B,), 12, jnp.int32)
    sty = jnp.asarray(rng.integers(0, 64, (B, 6)), jnp.int32)
    sl = jnp.full((B,), 6, jnp.int32)
    spk = jnp.asarray(rng.standard_normal((B, cfg.spk_dim)), jnp.float32)
    pre = token_lm.build_prefix(params, cfg, text, tl, sty, sl, spk)
    greedy = SamplerConfig(temperature=0.0)
    g_ref = token_lm.generate_speech(
        params, cfg, pre, jax.random.PRNGKey(1), max_new_tokens=24,
        sampler=greedy, kv_int8=False,
    )
    g_q = token_lm.generate_speech(
        params, cfg, pre, jax.random.PRNGKey(1), max_new_tokens=24,
        sampler=greedy, kv_int8=True,
    )
    np.testing.assert_array_equal(np.asarray(g_ref.tokens),
                                  np.asarray(g_q.tokens))
    np.testing.assert_array_equal(np.asarray(g_ref.lengths),
                                  np.asarray(g_q.lengths))


def test_sdpa_quant_matches_sdpa():
    import numpy as np

    from autostyle_tts_tpu.ops.attention import (
        causal_mask, quantize_kv, sdpa, sdpa_quant,
    )

    rng = np.random.default_rng(2)
    B, T, S, H, K, hd = 2, 4, 4, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, K, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, K, hd)), jnp.float32)
    mask = jnp.broadcast_to(causal_mask(T, S), (B, 1, T, S))
    ref = sdpa(q, k, v, mask)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    got = sdpa_quant(q, kq, ks, vq, vs, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0.05, rtol=0.05)


@pytest.mark.parametrize("kv_heads,mask_heads", [(4, 1), (2, 1), (2, 4), (1, 1)])
def test_sdpa_decode_path_matches_einsum(kv_heads, mask_heads):
    """T=1 native-layout decode attention (ops/attention._sdpa_decode) must
    match the einsum formulation for MHA and GQA, with [B,1,1,S] and
    [B,H,1,S] masks."""
    from autostyle_tts_tpu.ops.attention import _sdpa_decode, _repeat_kv

    rng = np.random.default_rng(4)
    B, S, H, hd = 3, 40, 4, 16
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, kv_heads, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, kv_heads, hd)), jnp.float32)
    valid = jnp.asarray(rng.random((B, mask_heads, 1, S)) > 0.3)
    valid = valid.at[:, :, :, 0].set(True)      # at least one slot per row

    got = _sdpa_decode(q, k, v, valid)

    kr, vr = _repeat_kv(k, H // kv_heads), _repeat_kv(v, H // kv_heads)
    logits = jnp.einsum(
        "bthd,bshd->bhts", q, kr
    ) * hd ** -0.5
    logits = jnp.where(valid, logits, -1e30)
    ref = jnp.einsum("bhts,bshd->bthd", jax.nn.softmax(logits, -1), vr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("kv_heads", [4, 2])
def test_sdpa_quant_decode_path_matches_einsum(kv_heads):
    """T=1 native-layout int8-KV attention must match the einsum
    formulation of sdpa_quant (scales folded identically)."""
    from autostyle_tts_tpu.ops.attention import (
        _repeat_kv, _sdpa_quant_decode, quantize_kv,
    )

    rng = np.random.default_rng(5)
    B, S, H, hd = 2, 24, 4, 16
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, kv_heads, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, kv_heads, hd)), jnp.float32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    mask = jnp.asarray(rng.random((B, 1, 1, S)) > 0.3).at[:, :, :, 0].set(True)

    got = _sdpa_quant_decode(q, kq, ks, vq, vs, mask)

    rep = H // kv_heads
    kr = _repeat_kv(kq, rep).astype(jnp.float32)
    vr = _repeat_kv(vq, rep).astype(jnp.float32)
    ks_h = jnp.repeat(ks, rep, axis=2).transpose(0, 2, 1)[:, :, None, :]
    vs_h = jnp.repeat(vs, rep, axis=2).transpose(0, 2, 1)[:, :, None, :]
    logits = jnp.einsum("bthd,bshd->bhts", q, kr) * (hd ** -0.5 * ks_h)
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, -1) * vs_h
    ref = jnp.einsum("bhts,bshd->bthd", probs, vr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
