"""Transformer core: cache/prefill parity, generate loop, LoRA, GQA, pooling,
and tensor-parallel sharding equivalence on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autostyle_tts_tpu.models import transformer as tfm
from autostyle_tts_tpu.ops.attention import causal_mask
from autostyle_tts_tpu.ops.sampling import SamplerConfig
from autostyle_tts_tpu.utils.config import TransformerConfig


def _cfg(**kw):
    base = dict(
        vocab_size=97, dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=64, max_seq_len=64, dtype="float32",
    )
    base.update(kw)
    return TransformerConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_forward_shapes(setup):
    cfg, params = setup
    tokens = jnp.arange(12, dtype=jnp.int32).reshape(2, 6) % cfg.vocab_size
    out = tfm.forward(params, cfg, tokens)
    assert out.logits.shape == (2, 6, cfg.vocab_size)
    assert out.hidden.shape == (2, 6, cfg.dim)
    assert out.logits.dtype == jnp.float32


def test_causality(setup):
    """Changing a future token must not change past logits."""
    cfg, params = setup
    t1 = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.int32)
    t2 = t1.at[0, 4].set(77)
    l1 = tfm.forward(params, cfg, t1).logits
    l2 = tfm.forward(params, cfg, t2).logits
    np.testing.assert_allclose(l1[0, :4], l2[0, :4], atol=1e-5)
    assert np.abs(np.asarray(l1[0, 4:]) - np.asarray(l2[0, 4:])).max() > 1e-6


def test_cache_parity_with_full_forward(setup):
    """Prefill 4 tokens + decode 3 one at a time == one 7-token forward."""
    cfg, params = setup
    B, P, T = 1, 4, 7
    tokens = (jnp.arange(T, dtype=jnp.int32) * 5 % cfg.vocab_size)[None, :]
    full = tfm.forward(params, cfg, tokens).logits

    S = 16
    cache = tfm.make_cache(cfg, B, S, dtype=jnp.float32)
    slot = jnp.arange(S)
    pmask = causal_mask(P, S)
    out = tfm.forward(
        params, cfg, tokens[:, :P],
        positions=jnp.arange(P, dtype=jnp.int32)[None, :],
        mask=jnp.broadcast_to(pmask, (B, 1, P, S)),
        cache=cache, cache_start=jnp.int32(0),
    )
    np.testing.assert_allclose(
        np.asarray(out.logits), np.asarray(full[:, :P]), atol=1e-4
    )
    cache = out.cache
    for i in range(P, T):
        mask = (slot[None, :] <= i)[:, None, None, :]
        step = tfm.forward(
            params, cfg, tokens[:, i : i + 1],
            positions=jnp.full((B, 1), i, jnp.int32),
            mask=jnp.broadcast_to(mask, (B, 1, 1, S)),
            cache=cache, cache_start=jnp.int32(i),
        )
        cache = step.cache
        np.testing.assert_allclose(
            np.asarray(step.logits[:, 0]), np.asarray(full[:, i]), atol=1e-4
        )


def test_generate_greedy_matches_naive(setup):
    """scan-fused generate == per-step full recompute argmax decoding."""
    cfg, params = setup
    prompts = [[3, 1, 4], [1, 5, 9, 2, 6]]
    P = 5
    toks, lens = tfm.left_pad(prompts, pad_id=0, width=P)
    max_new = 6
    cache = tfm.make_cache(cfg, 2, P + max_new + 1, dtype=jnp.float32)
    res = tfm.generate(
        params, cfg, jnp.asarray(toks), jnp.asarray(lens), cache,
        jax.random.PRNGKey(0), max_new_tokens=max_new,
        sampler=SamplerConfig.label(), eos_id=cfg.vocab_size - 1, pad_id=0,
    )
    for b, prompt in enumerate(prompts):
        seq = list(prompt)
        naive = []
        for _ in range(max_new):
            logits = tfm.forward(
                params, cfg, jnp.asarray([seq], jnp.int32)
            ).logits[0, -1]
            nxt = int(jnp.argmax(logits))
            if nxt == cfg.vocab_size - 1:
                break
            naive.append(nxt)
            seq.append(nxt)
        got = [int(t) for t in np.asarray(res.tokens[b])[: len(naive)]]
        assert got == naive, f"row {b}: {got} != {naive}"
        assert int(res.lengths[b]) >= len(naive)


def test_generate_eos_stops_row(setup):
    """After EOS a row emits only pad_id and its length freezes."""
    cfg, params = setup
    toks, lens = tfm.left_pad([[1, 2]], pad_id=0)
    cache = tfm.make_cache(cfg, 1, 40, dtype=jnp.float32)
    # force EOS at step 0 by making eos the argmax token: pick eos = actual argmax
    first = tfm.forward(params, cfg, jnp.asarray(toks)).logits[0, -1]
    eos = int(jnp.argmax(first))
    res = tfm.generate(
        params, cfg, jnp.asarray(toks), jnp.asarray(lens), cache,
        jax.random.PRNGKey(0), max_new_tokens=5,
        sampler=SamplerConfig.label(), eos_id=eos, pad_id=0,
    )
    assert int(res.lengths[0]) == 0
    assert np.asarray(res.tokens[0]).tolist() == [eos, 0, 0, 0, 0]


def test_lora_zero_b_is_identity_and_train_path_differs(setup):
    cfg, params = setup
    tokens = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    base = tfm.forward(params, cfg, tokens).logits
    lora = tfm.init_lora(jax.random.PRNGKey(1), cfg, r=4)
    with_lora = tfm.forward(params, cfg, tokens, lora=lora, lora_scale=2.0).logits
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)
    # perturb B -> output changes
    lora["layers"]["wqkv_lora_b"] = (
        lora["layers"]["wqkv_lora_b"] + 0.1
    )
    changed = tfm.forward(params, cfg, tokens, lora=lora, lora_scale=2.0).logits
    assert np.abs(np.asarray(changed) - np.asarray(base)).max() > 1e-4


def test_embed_text_mask_semantics(setup):
    """Padding tokens must not affect the pooled embedding
    (reference mean-pool: milvus/RAG.py:139-140)."""
    cfg, params = setup
    t1 = jnp.asarray([[4, 5, 6, 0, 0]], jnp.int32)
    m1 = jnp.asarray([[1, 1, 1, 0, 0]], jnp.int32)
    t2 = jnp.asarray([[4, 5, 6, 9, 9]], jnp.int32)
    e1 = tfm.embed_text(params, cfg, t1, m1)
    e2 = tfm.embed_text(params, cfg, t2, m1)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)
    assert e1.shape == (1, cfg.dim)


def test_gqa_and_mha_both_run():
    for kv in (1, 2, 4):
        cfg = _cfg(n_kv_heads=kv)
        params = tfm.init_params(jax.random.PRNGKey(0), cfg)
        out = tfm.forward(params, cfg, jnp.ones((1, 3), jnp.int32))
        assert out.logits.shape == (1, 3, cfg.vocab_size)


def test_remat_matches(setup):
    cfg, params = setup
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    a = tfm.forward(params, cfg, tokens, remat=False).logits
    b = tfm.forward(params, cfg, tokens, remat=True).logits
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_tensor_parallel_matches_single_device(mesh8):
    """pjit forward under the TP sharding rules == unsharded forward."""
    from autostyle_tts_tpu.parallel.sharding import batch_sharding, param_shardings

    cfg = _cfg(dim=32, n_heads=4, n_kv_heads=2, ffn_dim=64)
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 97, (8, 6)), jnp.int32)
    ref = tfm.forward(params, cfg, tokens).logits

    with mesh8:
        shardings = param_shardings(mesh8, params)
        p_sharded = jax.device_put(params, shardings)
        t_sharded = jax.device_put(tokens, batch_sharding(mesh8, 2))
        fn = jax.jit(lambda p, t: tfm.forward(p, cfg, t).logits)
        got = fn(p_sharded, t_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_param_count_3b_geometry():
    from autostyle_tts_tpu.utils.config import llama32_3b_config

    cfg = llama32_3b_config()
    # formula check only (no allocation): 3B-class
    D, F, L, V = cfg.dim, cfg.ffn_dim, cfg.n_layers, cfg.vocab_size
    H, K, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    per_layer = D * H * hd + 2 * D * K * hd + H * hd * D + 3 * D * F
    total = V * D + L * per_layer + D * V + D
    assert 2.5e9 < total < 4.0e9


@pytest.mark.parametrize("bits", [8, 4])
def test_init_params_quantized_matches_quantize_tree_structure(bits):
    """init_params_quantized is the memory-bounded build used by bench.py's
    3B sections (whole-tree init+quantize held ~17 GB of f32 stacks at peak
    and OOM'd the v5e intermittently). Same pytree structure/shapes/dtypes
    as quantize_tree(init_params(.)), and the result must drive the full
    decode path."""
    from autostyle_tts_tpu.ops.quant import quantize_tree

    cfg = _cfg(tie_embeddings=False)
    ref = quantize_tree(tfm.init_params(jax.random.PRNGKey(0), cfg), bits=bits)
    got = tfm.init_params_quantized(jax.random.PRNGKey(0), cfg, bits=bits)

    ref_leaves = jax.tree_util.tree_structure(ref)
    got_leaves = jax.tree_util.tree_structure(got)
    assert ref_leaves == got_leaves
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        assert a.shape == b.shape and a.dtype == b.dtype

    prompt = jnp.asarray([[5, 7, 11, 13]], jnp.int32)
    cache = tfm.make_cache(cfg, 1, 16)
    out = tfm.generate(
        got, cfg, prompt, jnp.asarray([4], jnp.int32), cache,
        jax.random.PRNGKey(1), max_new_tokens=4,
        sampler=SamplerConfig.label(), eos_id=-1,
    )
    assert int(out.lengths[0]) >= 1
