"""Parity tests for the fused Pallas decode kernels (interpret mode on CPU).

The fused path must be numerically interchangeable with the scanned XLA
decode (models/transformer.py): same rmsnorm/RoPE/attention/MLP math, f32
accumulation, bf16 dots. Compile-checked on the real chip separately."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autostyle_tts_tpu.models import token_lm
from autostyle_tts_tpu.models import transformer as core
from autostyle_tts_tpu.ops.attention import apply_rope, rope_table, sdpa
from autostyle_tts_tpu.ops.pallas_decode import attn_step, fused_ok, mlp_step
from autostyle_tts_tpu.ops.quant import QTensor, quantize, quantize_tree
from autostyle_tts_tpu.utils.config import tiny_config

EPS = 1e-5


def _rmsnorm(x, w):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + EPS) * w


def _mk_qtensor(key, shape, scale=0.02):
    w = jax.random.normal(key, shape, jnp.float32) * scale
    return quantize(w)


def test_attn_step_matches_xla_composition():
    H = K = 4
    hd = 16
    D = H * hd
    S = 24
    t, off = 9, 3
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    h = (jax.random.normal(ks[0], (1, D)) * 0.5).astype(jnp.bfloat16)
    norm = 1.0 + 0.1 * jax.random.normal(ks[1], (1, D))
    wqkv = _mk_qtensor(ks[2], (D, 3 * D))
    wo = _mk_qtensor(ks[3], (D, D))
    kcache = (jax.random.normal(ks[4], (S, K * hd)) * 0.3).astype(jnp.bfloat16)
    vcache = (jax.random.normal(ks[5], (S, K * hd)) * 0.3).astype(jnp.bfloat16)
    # slots outside [off, t] are garbage the kernel must mask out
    cos_tab, sin_tab = rope_table(64, hd)
    pos = t - off
    cosf = jnp.tile(jnp.concatenate([cos_tab[pos], cos_tab[pos]]), K)[None, :]
    sinf = jnp.tile(jnp.concatenate([sin_tab[pos], sin_tab[pos]]), K)[None, :]

    got_h, got_k, got_v = attn_step(
        h, norm, wqkv, wo, cosf, sinf, kcache, vcache,
        jnp.int32(t), jnp.int32(off),
        n_heads=H, head_dim=hd, eps=EPS, interpret=True,
    )

    # reference: same math via the shipped XLA ops
    x = _rmsnorm(h, norm).astype(jnp.bfloat16)
    qkv = jnp.matmul(x, wqkv.q.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) * wqkv.s
    q = qkv[:, :D].reshape(1, 1, H, hd)
    k_new = qkv[:, D:2 * D].reshape(1, 1, K, hd)
    v_new = qkv[:, 2 * D:].reshape(1, 1, K, hd)
    posa = jnp.full((1, 1), pos, jnp.int32)
    q = apply_rope(q.astype(jnp.float32), cos_tab, sin_tab, posa)
    k_new = apply_rope(k_new.astype(jnp.float32), cos_tab, sin_tab, posa)
    # cache as [B, S, K, hd] with the new row written at t
    kc = kcache.reshape(S, K, hd)[None].astype(jnp.float32)
    vc = vcache.reshape(S, K, hd)[None].astype(jnp.float32)
    kc = kc.at[:, t].set(k_new[:, 0])
    vc = vc.at[:, t].set(v_new[:, 0])
    slot = jnp.arange(S)
    mask = ((slot >= off) & (slot <= t))[None, None, None, :]
    attn = sdpa(q, kc, vc, mask).reshape(1, D).astype(jnp.bfloat16)
    delta = jnp.matmul(attn, wo.q.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32) * wo.s
    want_h = (h.astype(jnp.float32) + delta).astype(jnp.bfloat16)

    np.testing.assert_allclose(
        np.asarray(got_h, np.float32), np.asarray(want_h, np.float32),
        rtol=0.05, atol=0.02,
    )
    # cache rows: new row written at t, everything else untouched
    np.testing.assert_allclose(
        np.asarray(got_k[t], np.float32).reshape(K, hd),
        np.asarray(k_new[0, 0], np.float32), rtol=0.05, atol=0.02,
    )
    np.testing.assert_array_equal(
        np.asarray(got_k[:t]), np.asarray(kcache[:t])
    )
    np.testing.assert_allclose(
        np.asarray(got_v[t], np.float32).reshape(K, hd),
        np.asarray(v_new[0, 0], np.float32), rtol=0.05, atol=0.02,
    )


def test_mlp_step_matches_xla_composition():
    D, F = 64, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    h = (jax.random.normal(ks[0], (1, D)) * 0.5).astype(jnp.bfloat16)
    norm = 1.0 + 0.1 * jax.random.normal(ks[1], (1, D))
    wgu = _mk_qtensor(ks[2], (D, 2 * F))
    wdn = _mk_qtensor(ks[2], (F, D))

    got = mlp_step(h, norm, wgu, wdn, eps=EPS, tile_f=64, interpret=True)

    x = _rmsnorm(h, norm).astype(jnp.bfloat16)
    gu = jnp.matmul(x, wgu.q.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * wgu.s
    g, u = gu[:, :F], gu[:, F:]
    tmid = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
    dn = jnp.matmul(tmid, wdn.q.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * wdn.s
    want = (h.astype(jnp.float32) + dn).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.02,
    )


def test_generate_speech_fused_matches_scan_greedy():
    """End-to-end: fused Pallas decode == scanned XLA decode, greedy tokens."""
    from autostyle_tts_tpu.ops.sampling import SamplerConfig

    cfg = tiny_config().token_lm
    params = token_lm.init_params(jax.random.PRNGKey(0), cfg)
    params = quantize_tree(params)
    assert fused_ok(params, token_lm.core_config(cfg), batch=1)
    dparams = token_lm.unstack_decode_params(params, cfg)

    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(16, 200, (1, 12)), jnp.int32)
    sty = jnp.asarray(rng.integers(0, 64, (1, 8)), jnp.int32)
    spk = jnp.asarray(rng.standard_normal((1, cfg.spk_dim)), jnp.float32)
    pre = token_lm.build_prefix(
        params, cfg, text, jnp.asarray([12]), sty, jnp.asarray([8]), spk
    )
    key = jax.random.PRNGKey(7)
    sampler = SamplerConfig(greedy=True)
    ref = token_lm.generate_speech(
        params, cfg, pre, key, max_new_tokens=16, sampler=sampler,
        min_tokens=2,
    )
    got = token_lm.generate_speech(
        params, cfg, pre, key, max_new_tokens=16, sampler=sampler,
        min_tokens=2, fused=True, decode_params=dparams,
    )
    assert int(got.lengths[0]) == int(ref.lengths[0])
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))


def test_generate_speech_megakernel_matches_scan_greedy():
    """One-call-per-step megakernel == scanned XLA decode, greedy tokens."""
    from autostyle_tts_tpu.ops.sampling import SamplerConfig

    cfg = tiny_config().token_lm
    params = quantize_tree(token_lm.init_params(jax.random.PRNGKey(3), cfg))
    mp = token_lm.mega_decode_params(params, cfg, tile_f=64)
    assert mp["wd_t"].shape[1] == cfg.ffn_dim // 64      # JM tiles

    rng = np.random.default_rng(3)
    text = jnp.asarray(rng.integers(16, 200, (1, 10)), jnp.int32)
    sty = jnp.asarray(rng.integers(0, 64, (1, 6)), jnp.int32)
    spk = jnp.asarray(rng.standard_normal((1, cfg.spk_dim)), jnp.float32)
    pre = token_lm.build_prefix(
        params, cfg, text, jnp.asarray([10]), sty, jnp.asarray([6]), spk
    )
    key = jax.random.PRNGKey(11)
    sampler = SamplerConfig(greedy=True)
    ref = token_lm.generate_speech(
        params, cfg, pre, key, max_new_tokens=12, sampler=sampler,
        min_tokens=2,
    )
    got = token_lm.generate_speech(
        params, cfg, pre, key, max_new_tokens=12, sampler=sampler,
        min_tokens=2, fused=True, decode_params=mp,
    )
    assert int(got.lengths[0]) == int(ref.lengths[0])
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))


def test_fused_ok_gates():
    cfg = tiny_config().token_lm
    ccfg = token_lm.core_config(cfg)
    params = token_lm.init_params(jax.random.PRNGKey(0), cfg)
    assert not fused_ok(params, ccfg, batch=1)          # not quantized
    qparams = quantize_tree(params)
    assert fused_ok(qparams, ccfg, batch=1)
    assert not fused_ok(qparams, ccfg, batch=2)         # batched -> XLA path


def test_fused_ok_rejects_untileable_ffn():
    """ffn_dim=768 passes 768 %% min(1024, 768) == 0 trivially but the
    megakernel tiles at 512 — the gate must route it to the scanned path
    instead of crashing in mega_decode_params (round-2 ADVICE #3)."""
    import dataclasses

    cfg = dataclasses.replace(tiny_config().token_lm, ffn_dim=768)
    ccfg = token_lm.core_config(cfg)
    qparams = quantize_tree(token_lm.init_params(jax.random.PRNGKey(0), cfg))
    assert not fused_ok(qparams, ccfg, batch=1)


def test_generate_speech_megakernel_int4_matches_int8():
    """int4 megakernel parity: weights constrained so the 4-bit
    re-quantization is EXACT (q in [-7,7], per-channel absmax forced to 7
    -> identical effective weights), then greedy tokens must match the int8
    megakernel bit for bit."""
    from autostyle_tts_tpu.ops.quant import QTensor
    from autostyle_tts_tpu.ops.sampling import SamplerConfig

    cfg = tiny_config().token_lm
    params = quantize_tree(token_lm.init_params(jax.random.PRNGKey(5), cfg))

    def fix(t):
        if isinstance(t, QTensor):
            q = jnp.clip(t.q, -7, 7).at[..., 0, :].set(7)
            return QTensor(q=q, s=t.s)
        return t

    params = jax.tree_util.tree_map(
        fix, params, is_leaf=lambda x: isinstance(x, QTensor)
    )
    mp8 = token_lm.mega_decode_params(params, cfg, tile_f=64, bits=8)
    mp4 = token_lm.mega_decode_params(params, cfg, tile_f=64, bits=4)
    assert mp4["wqkv3"].dtype == jnp.int8     # int8 byte carrier
    assert mp4["wqkv3"].shape[-1] == mp8["wqkv3"].shape[-1] // 2
    # exact re-quantization: scales must agree to float rounding
    np.testing.assert_allclose(
        np.asarray(mp4["wqs3"]), np.asarray(mp8["wqs3"]), rtol=1e-6
    )

    rng = np.random.default_rng(5)
    text = jnp.asarray(rng.integers(16, 200, (1, 10)), jnp.int32)
    sty = jnp.asarray(rng.integers(0, 64, (1, 6)), jnp.int32)
    spk = jnp.asarray(rng.standard_normal((1, cfg.spk_dim)), jnp.float32)
    pre = token_lm.build_prefix(
        params, cfg, text, jnp.asarray([10]), sty, jnp.asarray([6]), spk
    )
    key = jax.random.PRNGKey(13)
    sampler = SamplerConfig(greedy=True)
    ref = token_lm.generate_speech(
        params, cfg, pre, key, max_new_tokens=12, sampler=sampler,
        min_tokens=2, fused=True, decode_params=mp8,
    )
    got = token_lm.generate_speech(
        params, cfg, pre, key, max_new_tokens=12, sampler=sampler,
        min_tokens=2, fused=True, decode_params=mp4,
    )
    assert int(got.lengths[0]) == int(ref.lengths[0])
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
