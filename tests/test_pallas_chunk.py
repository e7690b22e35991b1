"""Parity tests for the batched chunk megakernel (interpret mode on CPU).

ops/pallas_decode.mega_chunk_step fuses the continuous batcher's per-step
batched forward into one pallas program; token_lm.decode_chunk_mega wraps it
with decode_chunk's exact sampling/bookkeeping. Greedy tokens and slot state
must match token_lm.decode_chunk bit-for-bit; caches/logits to f32 rounding.
Compile/profile on the real chip happens separately (bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autostyle_tts_tpu.models import token_lm
from autostyle_tts_tpu.models import transformer as core
from autostyle_tts_tpu.ops.quant import quantize_tree
from autostyle_tts_tpu.ops.sampling import SamplerConfig
from autostyle_tts_tpu.utils.config import tiny_config


def _setup(seed=0, B=4, s_max=48, fill=(11, 7, 19, 3), off=(2, 0, 5, 1)):
    cfg = tiny_config().token_lm
    params = quantize_tree(token_lm.init_params(jax.random.PRNGKey(seed), cfg))
    mp = token_lm.mega_decode_params(params, cfg, tile_f=64)
    ccfg = token_lm.core_config(cfg)
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
    cache = core.make_cache(ccfg, B, s_max)
    # random-but-masked state: slots outside each row's [off, t) window hold
    # garbage both paths must ignore
    cache["k"] = (jax.random.normal(ks[0], cache["k"].shape) * 0.3).astype(
        jnp.bfloat16
    )
    cache["v"] = (jax.random.normal(ks[1], cache["v"].shape) * 0.3).astype(
        jnp.bfloat16
    )
    V = cfg.speech_vocab_size
    logits = jax.random.normal(ks[2], (B, V)) * 2.0
    t = jnp.asarray(fill, jnp.int32)
    offset = jnp.asarray(off, jnp.int32)
    return cfg, params, mp, cache, logits, t, offset


def _run_both(cfg, params, mp, cache, logits, t, offset, done, steps,
              sampler, n_chunks=2, n_steps=5, min_tokens=2, seed=9):
    key = jax.random.PRNGKey(seed)
    # the mega path donates its cache buffers (in-place pallas aliasing), so
    # each branch gets its own copy
    ref = ({k: jnp.copy(v) for k, v in cache.items()}, logits, t, done, steps)
    got = ({k: jnp.copy(v) for k, v in cache.items()}, logits, t, done, steps)
    ref_toks, got_toks = [], []
    k_ref = k_got = key
    for c in range(n_chunks):
        k_ref, sub = jax.random.split(k_ref)
        *ref, toks = token_lm.decode_chunk(
            params, cfg, ref[0], ref[1], ref[2], offset, ref[3], ref[4],
            sub, n_steps=n_steps, sampler=sampler, min_tokens=min_tokens,
        )
        ref_toks.append(np.asarray(toks))
        k_got, sub = jax.random.split(k_got)
        *got, toks = token_lm.decode_chunk_mega(
            mp, cfg, got[0], got[1], got[2], offset, got[3], got[4],
            sub, n_steps=n_steps, sampler=sampler,
            min_tokens=min_tokens, interpret=True,
        )
        got_toks.append(np.asarray(toks))
    return ref, np.concatenate(ref_toks, 1), got, np.concatenate(got_toks, 1)


def test_chunk_megakernel_matches_decode_chunk_greedy():
    """Greedy tokens + slot bookkeeping bit-equal across TWO chunks (the
    second chunk reads rows the kernel wrote in place during the first)."""
    cfg, params, mp, cache, logits, t, offset = _setup()
    B = 4
    done = jnp.asarray([False, False, False, True])   # row 3 pre-done: PADs
    steps = jnp.zeros((B,), jnp.int32)
    sampler = SamplerConfig(greedy=True)
    ref, ref_toks, got, got_toks = _run_both(
        cfg, params, mp, cache, logits, t, offset, done, steps, sampler
    )
    np.testing.assert_array_equal(got_toks, ref_toks)
    for a, b in zip(ref[2:], got[2:]):                # t, done, steps
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # carry logits: bf16 rounding points differ (the kernel ropes in f32 and
    # rounds on the cache write; XLA rounds qkv before rope), accumulating
    # ~2% over layers x steps — greedy picks above still matched exactly
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(ref[1]), rtol=5e-2, atol=5e-2
    )
    # caches: decode_chunk folds appends at chunk-start fill levels; the
    # kernel wrote the same rows in place
    np.testing.assert_allclose(
        np.asarray(got[0]["k"], np.float32),
        np.asarray(ref[0]["k"], np.float32), rtol=5e-2, atol=5e-2,
    )
    np.testing.assert_allclose(
        np.asarray(got[0]["v"], np.float32),
        np.asarray(ref[0]["v"], np.float32), rtol=5e-2, atol=5e-2,
    )


def test_chunk_megakernel_min_tokens_suppresses_eos():
    """min_tokens must gate EOS identically (steps-based, per row)."""
    cfg, params, mp, cache, logits, t, offset = _setup(seed=5)
    B = 4
    # force EOS-greedy logits: without the min_tokens gate every live row
    # would EOS immediately
    logits = logits.at[:, cfg.speech_eos].set(50.0)
    done = jnp.zeros((B,), bool)
    steps = jnp.zeros((B,), jnp.int32)
    sampler = SamplerConfig(greedy=True)
    ref, ref_toks, got, got_toks = _run_both(
        cfg, params, mp, cache, logits, t, offset, done, steps, sampler,
        n_chunks=1, n_steps=4, min_tokens=3,
    )
    np.testing.assert_array_equal(got_toks, ref_toks)
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    # the forced-EOS first sample must have been suppressed on every row
    assert (got_toks[:, 0] != cfg.speech_eos).all()


def test_chunk_megakernel_sampled_valid():
    """Sampled path: same key stream + same sampler; tokens must be in-vocab,
    PAD/BOS-free on live rows, and the slot state identical when the sampled
    streams happen to agree (they use identical keys over near-identical
    logits — assert only validity, not bit-parity)."""
    cfg, params, mp, cache, logits, t, offset = _setup(seed=11)
    B = 4
    done = jnp.zeros((B,), bool)
    steps = jnp.zeros((B,), jnp.int32)
    sampler = SamplerConfig(temperature=1.0, top_k=8)
    _, _, got, got_toks = _run_both(
        cfg, params, mp, cache, logits, t, offset, done, steps, sampler,
        n_chunks=1, n_steps=5,
    )
    V = cfg.speech_vocab_size
    assert got_toks.shape == (B, 5)
    assert (got_toks >= 0).all() and (got_toks < V).all()
    assert (got_toks != cfg.speech_bos).all()
    # PAD may appear only AFTER a row retires (EOS): every token up to and
    # including the first EOS must be a real speech token
    for b in range(B):
        row = np.asarray(got_toks[b])
        eos_pos = np.flatnonzero(row == cfg.speech_eos)
        end = eos_pos[0] if eos_pos.size else len(row)
        assert (row[:end] != cfg.speech_pad).all()
    assert np.isfinite(np.asarray(got[1])).all()


def test_continuous_batcher_megakernel_greedy_parity():
    """ContinuousBatcher(megakernel=True) must produce the same greedy token
    streams as the default scanned decode_chunk across mixed admissions."""
    import dataclasses

    from autostyle_tts_tpu.pipeline.continuous import ContinuousBatcher
    from autostyle_tts_tpu.pipeline.engine import Engine

    cfg = tiny_config()
    cfg.quantize_lm_int8 = True          # megakernel weights are QTensors
    eng = Engine(cfg, seed=0)
    sr = cfg.audio.prompt_sample_rate
    rng = np.random.default_rng(0)
    wavs = [
        (0.4 * np.sin(2 * np.pi * (200 + 40 * i)
                      * np.arange(sr) / sr)).astype(np.float32)
        + 0.02 * rng.standard_normal(sr).astype(np.float32)
        for i in range(3)
    ]
    feats = eng.prompt_features(wavs)
    reqs = [
        {"id": f"r{i}", "text": f"parity case {i}", "style_text": "st",
         "style_feat": feats[i], "flow_feat": feats[i]}
        for i in range(3)
    ]

    def run(megakernel):
        bat = ContinuousBatcher(
            eng, slots=2, chunk=4, p_max=64, max_new=8,
            sampler=SamplerConfig(greedy=True),
            megakernel=megakernel, mega_interpret=megakernel,
        )
        for r in reqs:
            bat.submit(dict(r))
        done = bat.drain()
        return {d["id"]: d["tokens"] for d in done}

    ref = run(False)
    got = run(True)
    assert set(ref) == set(got) == {"r0", "r1", "r2"}
    for rid in ref:
        np.testing.assert_array_equal(got[rid], ref[rid])


def test_continuous_batcher_megakernel_rejects_int8_kv():
    from autostyle_tts_tpu.pipeline.continuous import ContinuousBatcher
    from autostyle_tts_tpu.pipeline.engine import Engine

    cfg = tiny_config()
    cfg.quantize_lm_int8 = True
    eng = Engine(cfg, seed=0)
    with pytest.raises(ValueError, match="bf16 KV pool"):
        ContinuousBatcher(eng, slots=2, kv_int8=True, megakernel=True)


def test_continuous_batcher_megakernel_rejects_unquantized_lm():
    """megakernel=True with a float LM must raise a clear error, not die
    in mega_decode_params with AttributeError('.q')."""
    from autostyle_tts_tpu.pipeline.continuous import ContinuousBatcher
    from autostyle_tts_tpu.pipeline.engine import Engine

    cfg = tiny_config()
    assert not cfg.quantize_lm_int8          # the default config
    eng = Engine(cfg, seed=0)
    with pytest.raises(ValueError, match="quantized"):
        ContinuousBatcher(eng, slots=2, megakernel=True)


def test_continuous_batcher_megakernel_honors_int4_opt_in():
    """config.quantize_lm_int4 reaches the batcher's mega params (halved
    packed width) when the lanes allow it; narrow geometries fall back to
    int8 silently (int4_lanes_ok gate)."""
    import dataclasses

    from autostyle_tts_tpu.pipeline.continuous import ContinuousBatcher
    from autostyle_tts_tpu.pipeline.engine import Engine

    # narrow tiny geometry: int4 requested but lanes too narrow -> int8
    cfg = tiny_config()
    cfg.quantize_lm_int8 = True
    cfg.quantize_lm_int4 = True
    assert not token_lm.int4_lanes_ok(cfg.token_lm)
    bat = ContinuousBatcher(Engine(cfg, seed=0), slots=2, megakernel=True,
                            mega_interpret=True)
    N = cfg.token_lm.n_heads * (cfg.token_lm.dim // cfg.token_lm.n_heads)
    assert bat.mp["wqkv3"].shape[3] == N     # unpacked int8 width

    # lane-aligned geometry: packed width must be halved
    cfg4 = tiny_config()
    cfg4.token_lm = dataclasses.replace(
        cfg4.token_lm, dim=256, n_heads=4, n_kv_heads=4, ffn_dim=256,
    )
    cfg4.quantize_lm_int8 = True
    cfg4.quantize_lm_int4 = True
    assert token_lm.int4_lanes_ok(cfg4.token_lm)
    bat4 = ContinuousBatcher(Engine(cfg4, seed=0), slots=2, megakernel=True,
                             mega_interpret=True)
    assert bat4.mp["wqkv3"].shape[3] == 256 // 2  # packed int4 width


def test_chunk_megakernel_int4_matches_int8():
    """int4 chunk kernel parity: weights constrained so the 4-bit
    re-quantization is EXACT (same trick as
    test_generate_speech_megakernel_int4_matches_int8), then greedy chunk
    tokens must match the int8 chunk kernel bit for bit."""
    from autostyle_tts_tpu.ops.quant import QTensor

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
    _, _, _, cache, logits, t, offset = (None,) * 3 + _setup()[3:]
    B = 4
    done = jnp.zeros((B,), bool)
    steps = jnp.zeros((B,), jnp.int32)
    sampler = SamplerConfig(greedy=True)
    key = jax.random.PRNGKey(21)

    def run(mp):
        c = {k: jnp.copy(v) for k, v in cache.items()}
        _, lg, tt, dn, st, toks = token_lm.decode_chunk_mega(
            mp, cfg, c, logits, t, offset, done, steps, key,
            n_steps=4, sampler=sampler, interpret=True,
        )
        return np.asarray(toks), np.asarray(lg)

    toks8, lg8 = run(mp8)
    toks4, lg4 = run(mp4)
    np.testing.assert_array_equal(toks4, toks8)
    np.testing.assert_allclose(lg4, lg8, rtol=2e-2, atol=2e-2)


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
