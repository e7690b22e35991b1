"""Multi-chip paths on the virtual 8-device CPU mesh: data-parallel serving
(batched LM generate + CFM sample with batch sharded over the data axis) and
the tensor-parallel embedder. The driver separately runs
__graft_entry__.dryrun_multichip (full dp x tp train step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from autostyle_tts_tpu.models import cfm, token_lm
from autostyle_tts_tpu.models import transformer as core
from autostyle_tts_tpu.ops.sampling import SamplerConfig
from autostyle_tts_tpu.parallel.mesh import DATA_AXIS, make_mesh
from autostyle_tts_tpu.parallel.sharding import batch_sharding, param_shardings
from autostyle_tts_tpu.utils.config import tiny_config


def test_dp_generate_speech_on_mesh():
    """Batch-sharded token-LM generation: 8 requests over 8 devices."""
    mesh = make_mesh(data=8, model=1)
    cfg = tiny_config().token_lm
    params = token_lm.init_params(jax.random.PRNGKey(0), cfg)
    B = 8
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(16, 200, (B, 8)), jnp.int32)
    text_len = jnp.full((B,), 8, jnp.int32)
    sty = jnp.asarray(rng.integers(0, 64, (B, 4)), jnp.int32)
    sty_len = jnp.full((B,), 4, jnp.int32)
    spk = jnp.asarray(rng.standard_normal((B, cfg.spk_dim)), jnp.float32)

    with mesh:
        p_sh = jax.device_put(params, param_shardings(mesh, params))
        pre = token_lm.build_prefix(
            p_sh, cfg,
            jax.device_put(text, batch_sharding(mesh, 2)),
            jax.device_put(text_len, batch_sharding(mesh, 1)),
            jax.device_put(sty, batch_sharding(mesh, 2)),
            jax.device_put(sty_len, batch_sharding(mesh, 1)),
            jax.device_put(spk, batch_sharding(mesh, 2)),
        )
        gen = token_lm.generate_speech(
            p_sh, cfg, pre, jax.random.PRNGKey(0),
            max_new_tokens=8, sampler=SamplerConfig.label(),
        )
        toks = np.asarray(gen.tokens)
    assert toks.shape == (B, 8)
    # row results must match the unsharded run (greedy -> deterministic)
    pre2 = token_lm.build_prefix(params, cfg, text, text_len, sty, sty_len, spk)
    ref = token_lm.generate_speech(
        params, cfg, pre2, jax.random.PRNGKey(0),
        max_new_tokens=8, sampler=SamplerConfig.label(),
    )
    np.testing.assert_array_equal(toks, np.asarray(ref.tokens))


def test_dp_cfm_sample_on_mesh():
    mesh = make_mesh(data=4, model=2)
    c = tiny_config().cfm
    params = cfm.init_params(jax.random.PRNGKey(0), c)
    B, T_tok = 8, 4
    F = T_tok * c.upsample
    tokens = jnp.ones((B, T_tok), jnp.int32)
    with mesh:
        cond = cfm.upsample_tokens(params, tokens, c.upsample)
        cond = jax.device_put(cond, batch_sharding(mesh, 3))
        spk = jax.device_put(jnp.ones((B, c.spk_dim)), batch_sharding(mesh, 2))
        pm = jax.device_put(jnp.zeros((B, F, c.n_mels)), batch_sharding(mesh, 3))
        pmask = jax.device_put(jnp.zeros((B, F)), batch_sharding(mesh, 2))
        fmask = jax.device_put(jnp.ones((B, F)), batch_sharding(mesh, 2))
        mel = cfm.sample_mel(
            params, c, jax.random.PRNGKey(0), cond, spk, pm, pmask, fmask,
            use_cfg=True,
        )
        out = np.asarray(mel)
    assert out.shape == (B, F, c.n_mels) and np.isfinite(out).all()


def test_tp_embedder_embed_on_mesh():
    """Tensor-parallel embed_text over the model axis matches unsharded."""
    from autostyle_tts_tpu.models import frontend
    from autostyle_tts_tpu.utils.config import TransformerConfig

    mesh = make_mesh(data=2, model=4)
    cfg = TransformerConfig(
        vocab_size=frontend.VOCAB_SIZE, dim=64, n_layers=2, n_heads=8,
        n_kv_heads=4, ffn_dim=128, max_seq_len=64, dtype="float32",
    )
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    toks = jnp.asarray(np.random.default_rng(0).integers(16, 272, (4, 12)), jnp.int32)
    mask = jnp.ones((4, 12), jnp.int32)
    ref = core.embed_text(params, cfg, toks, mask)
    with mesh:
        p_sh = jax.device_put(params, param_shardings(mesh, params))
        got = core.embed_text(
            p_sh, cfg,
            jax.device_put(toks, batch_sharding(mesh, 2)),
            jax.device_put(mask, batch_sharding(mesh, 2)),
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_engine_mesh_dp_parity():
    """Round-2 contract (VERDICT #6): the FULL Engine path — featurize ->
    LM -> CFM -> vocoder — runs with Engine(mesh=...) and matches the
    single-device engine bit-for-bit (same seed, same programs; GSPMD only
    changes placement)."""
    from autostyle_tts_tpu.pipeline.engine import Engine

    cfg = tiny_config()
    mesh = make_mesh(data=4, model=1)
    sr = cfg.audio.prompt_sample_rate
    t = np.arange(sr) / sr
    rng = np.random.default_rng(7)
    texts = ["hello world", "the quick brown fox", "ok then", "more text here"]
    styles = ["style one", "style two", "style three", "style four"]
    sty_wavs = [
        (0.3 * np.sin(2 * np.pi * f * t)
         + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
        for f in (200, 250, 300, 350)
    ]
    tim_wavs = [
        (0.3 * np.sin(2 * np.pi * f * t)
         + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
        for f in (180, 220, 260, 320)
    ]

    # bit-tight parity gate: pin the f32 fetch (the f16 serving default
    # rounds each side independently; a 1-ulp split at a bin boundary is
    # ~1e-3, above this test's atol — and placement, not payload dtype,
    # is what this test checks)
    cfg.fetch_dtype = "float32"
    ref = Engine(cfg, seed=3).synthesize_batch(texts, styles, sty_wavs, tim_wavs)
    eng = Engine(cfg, seed=3, mesh=mesh)
    assert eng.dp == 4
    with mesh:
        got = eng.synthesize_batch(texts, styles, sty_wavs, tim_wavs)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        np.testing.assert_allclose(g, r, atol=1e-4)


def test_engine_mesh_dp_tp_parity():
    """Full Engine path on a dp2 x tp4 mesh: Megatron col/row shardings on
    every net (token LM, CFM estimator, vocoder, tokenizer, speaker encoder)
    with XLA-inserted collectives must reproduce the single-device output.
    Complements test_engine_mesh_dp_parity (model=1): this exercises the
    MODEL-axis rules end to end, not just per-component."""
    from autostyle_tts_tpu.pipeline.engine import Engine

    cfg = tiny_config()
    mesh = make_mesh(data=2, model=4)
    sr = cfg.audio.prompt_sample_rate
    t = np.arange(sr) / sr
    rng = np.random.default_rng(11)
    texts = ["hello there", "general kenobi you are"]
    styles = ["style a", "style b"]
    sty_wavs = [
        (0.3 * np.sin(2 * np.pi * f * t)
         + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
        for f in (210, 320)
    ]
    tim_wavs = [
        (0.3 * np.sin(2 * np.pi * f * t)
         + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
        for f in (190, 280)
    ]

    cfg.fetch_dtype = "float32"   # see test_engine_mesh_dp_parity
    ref = Engine(cfg, seed=5).synthesize_batch(texts, styles, sty_wavs, tim_wavs)
    eng = Engine(cfg, seed=5, mesh=mesh)
    assert eng.dp == 2
    with mesh:
        got = eng.synthesize_batch(texts, styles, sty_wavs, tim_wavs)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        np.testing.assert_allclose(g, r, atol=2e-4)


def test_engine_mesh_pads_ragged_batch():
    """Batch of 3 on a dp=4 mesh: padded internally, 3 outputs returned."""
    from autostyle_tts_tpu.pipeline.engine import Engine

    cfg = tiny_config()
    mesh = make_mesh(data=4, model=1)
    sr = cfg.audio.prompt_sample_rate
    t = np.arange(sr) / sr
    w = [(0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32)
         for f in (200, 260, 330)]
    eng = Engine(cfg, seed=1, mesh=mesh)
    with mesh:
        out = eng.synthesize_batch(
            ["a b c", "d e", "f"], ["s1", "s2", "s3"], w, w
        )
    assert len(out) == 3
    for o in out:
        assert o.size > 0 and np.isfinite(o).all()


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
