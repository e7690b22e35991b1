"""Acoustic stack unit tests: frontend, speaker encoder, speech tokenizer,
CFM decoder, vocoder, token LM (shapes, masks, jit, key invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autostyle_tts_tpu.models import (
    cfm, frontend, speaker, speech_tokenizer, token_lm, vocoder,
)
from autostyle_tts_tpu.ops.sampling import SamplerConfig
from autostyle_tts_tpu.utils.config import tiny_config


@pytest.fixture(scope="module")
def cfg():
    return tiny_config()


# ----------------------------------------------------------------------- frontend


def test_frontend_roundtrip_multilingual():
    for text, lang in [("Hello, world!", "en"), ("你好世界", "zh"), ("こんにちは", "jp")]:
        ids = frontend.encode(text)
        assert ids[0] == frontend.BOS_ID and ids[-1] == frontend.EOS_ID
        assert ids[1] == frontend.LANG_TAGS[lang]  # auto-detected tag
        assert frontend.decode(ids) == frontend.normalize(text)


def test_frontend_inline_tags():
    ids = frontend.encode("<|zh|>你好<|en|>hi")
    tags = [i for i in ids if 5 <= i <= 9]
    assert tags == [frontend.LANG_TAGS["zh"], frontend.LANG_TAGS["en"]]


def test_frontend_normalization():
    assert frontend.normalize("你好。世界！") == "你好. 世界!"
    assert frontend.normalize("a   b\t c") == "a b c"


def test_frontend_batch():
    toks, lens = frontend.encode_batch(["hi", "hello there"])
    assert toks.shape[0] == 2 and toks.dtype == np.int32
    assert lens[1] > lens[0]
    assert (toks[0, lens[0]:] == frontend.PAD_ID).all()


# ----------------------------------------------------------------------- speaker


def test_speaker_embedding_shapes_and_norm(cfg):
    p = speaker.init_params(jax.random.PRNGKey(0), cfg.speaker)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 40, 16)), jnp.float32)
    mask = jnp.ones((2, 40))
    emb = speaker.apply(p, cfg.speaker, mel, mask)
    assert emb.shape == (2, cfg.speaker.emb_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-4)


def test_speaker_mask_invariance(cfg):
    """Frames beyond the mask must not change the embedding."""
    p = speaker.init_params(jax.random.PRNGKey(0), cfg.speaker)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 40, 16)).astype(np.float32)
    mel2 = mel.copy()
    mel2[:, 30:] = 99.0
    mask = np.zeros((1, 40), np.float32)
    mask[:, :25] = 1  # masked region ends before frame 30 - conv halo (k=3,dil<=2)
    e1 = speaker.apply(p, cfg.speaker, jnp.asarray(mel), jnp.asarray(mask))
    e2 = speaker.apply(p, cfg.speaker, jnp.asarray(mel2), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-4)


# ----------------------------------------------------------------------- speech tokenizer


def test_speech_tokenizer_rate_and_range(cfg):
    p = speech_tokenizer.init_params(jax.random.PRNGKey(0), cfg.speech_tokenizer)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 40, 16)), jnp.float32)
    mask = jnp.ones((2, 40))
    res = speech_tokenizer.apply(p, cfg.speech_tokenizer, mel, mask)
    assert res.tokens.shape == (2, 10)  # 40 / (2*2)
    assert res.tokens.dtype == jnp.int32
    assert (np.asarray(res.tokens) >= 0).all()
    assert (np.asarray(res.tokens) < cfg.speech_tokenizer.codebook_size).all()


def test_quantize_exact_match(cfg):
    """A frame equal to a codebook vector quantizes to that index."""
    p = speech_tokenizer.init_params(jax.random.PRNGKey(0), cfg.speech_tokenizer)
    cb = p["codebook"]
    h = cb[jnp.asarray([[3, 17, 42]])]
    toks = speech_tokenizer.quantize(cb, h)
    assert np.asarray(toks).tolist() == [[3, 17, 42]]


# ----------------------------------------------------------------------- CFM


def test_cfm_loss_and_sample_shapes(cfg):
    c = cfg.cfm
    p = cfm.init_params(jax.random.PRNGKey(0), c)
    B, T_tok = 2, 6
    F = T_tok * c.upsample
    key = jax.random.PRNGKey(1)
    tokens = jnp.ones((B, T_tok), jnp.int32)
    cond = cfm.upsample_tokens(p, tokens, c.upsample)
    assert cond.shape == (B, F, c.dim)
    spk = jnp.ones((B, c.spk_dim)) / c.spk_dim
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((B, F, c.n_mels)), jnp.float32)
    pmask = jnp.zeros((B, F)).at[:, :4].set(1.0)
    fmask = jnp.ones((B, F))
    out = cfm.cfm_loss(p, c, key, mel, cond, spk, pmask, fmask)
    assert np.isfinite(float(out.loss))
    sampled = cfm.sample_mel(
        p, c, key, cond, spk, mel * pmask[..., None], pmask, fmask, use_cfg=True
    )
    assert sampled.shape == (B, F, c.n_mels)
    # prompt frames pass through untouched
    np.testing.assert_allclose(
        np.asarray(sampled[:, :4]), np.asarray(mel[:, :4]), atol=1e-6
    )


def test_cfm_zero_init_field_is_zero(cfg):
    """out_proj zero-init => v(x,t)=0 at init => Euler leaves noise unchanged
    outside the prompt (a known-good initial condition for flow training)."""
    c = cfg.cfm
    p = cfm.init_params(jax.random.PRNGKey(0), c)
    B, F = 1, 8
    v = cfm.vector_field(
        p, c,
        jnp.ones((B, F, c.n_mels)), jnp.asarray([0.5]),
        jnp.zeros((B, F, c.dim)), jnp.zeros((B, c.spk_dim)),
        jnp.zeros((B, F, c.n_mels)), jnp.zeros((B, F)), jnp.ones((B, F)),
    )
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-6)


# ----------------------------------------------------------------------- vocoder


def test_vocoder_upsamples_exactly(cfg):
    v = cfg.vocoder
    p = vocoder.init_params(jax.random.PRNGKey(0), v)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 12, v.n_mels)), jnp.float32)
    wav = vocoder.apply(p, v, mel)
    assert wav.shape == (2, 12 * vocoder.total_upsample(v))
    assert float(jnp.max(jnp.abs(wav))) <= 1.0


def test_vocoder_upsample_matches_hop():
    """Flagship config invariant: prod(upsample_rates) == hop_length so mel
    frames map 1:1 onto 24 kHz samples."""
    from autostyle_tts_tpu.utils.config import Config

    full = Config()
    assert vocoder.total_upsample(full.vocoder) == full.audio.hop_length


def test_vocoder_losses_zero_at_identity(cfg):
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2400)), jnp.float32)
    assert float(vocoder.multi_res_stft_loss(wav, wav)) < 1e-5
    assert float(vocoder.mel_l1_loss(wav, wav, 2400, 128, 32, 16)) < 1e-6


def test_tiny_config_upsample_matches_hop(cfg):
    """The frames->samples invariant must hold at tiny scale too (the engine
    crops waveforms by token counts x upsample x hop)."""
    assert vocoder.total_upsample(cfg.vocoder) == cfg.audio.hop_length


# ----------------------------------------------------------------------- token LM


def test_token_lm_prefix_layout(cfg):
    tl = cfg.token_lm
    p = token_lm.init_params(jax.random.PRNGKey(0), tl)
    B = 2
    text = jnp.asarray([[5, 6, 7, 0], [8, 9, 0, 0]], jnp.int32)
    text_len = jnp.asarray([3, 2], jnp.int32)
    sty = jnp.asarray([[1, 2], [3, 0]], jnp.int32)
    sty_len = jnp.asarray([2, 1], jnp.int32)
    spk = jnp.ones((B, tl.spk_dim)) / tl.spk_dim
    pre = token_lm.build_prefix(p, tl, text, text_len, sty, sty_len, spk)
    P = 1 + 4 + 1 + 2
    assert pre.embeds.shape == (B, P, tl.dim)
    assert np.asarray(pre.length).tolist() == [7, 5]
    # row 0: slots [P-7 .. P) real; slot P-7 is SPK embedding
    spk_e = np.asarray((spk @ p["spk_proj"]))[0]
    np.testing.assert_allclose(np.asarray(pre.embeds[0, P - 7]), spk_e, atol=1e-5)
    # left padding is zeros
    np.testing.assert_allclose(np.asarray(pre.embeds[1, : P - 5]), 0.0, atol=1e-7)
    # last real slot of row 0 = style token 2's embedding
    np.testing.assert_allclose(
        np.asarray(pre.embeds[0, -1]),
        np.asarray(p["speech_emb"][2]), atol=1e-5,
    )


def test_token_lm_generate_and_loss(cfg):
    tl = cfg.token_lm
    p = token_lm.init_params(jax.random.PRNGKey(0), tl)
    ccfg = token_lm.core_config(tl)
    from autostyle_tts_tpu.models import transformer as core

    B = 2
    text = jnp.asarray([[5, 6, 7], [8, 9, 0]], jnp.int32)
    text_len = jnp.asarray([3, 2], jnp.int32)
    sty = jnp.asarray([[1, 2], [3, 0]], jnp.int32)
    sty_len = jnp.asarray([2, 1], jnp.int32)
    spk = jnp.ones((B, tl.spk_dim)) / tl.spk_dim
    pre = token_lm.build_prefix(p, tl, text, text_len, sty, sty_len, spk)
    max_new = 8
    gen = token_lm.generate_speech(
        p, tl, pre, jax.random.PRNGKey(0),
        max_new_tokens=max_new, sampler=SamplerConfig.label(), min_tokens=2,
    )
    assert gen.tokens.shape == (B, max_new)
    toks = np.asarray(gen.tokens)
    # generated tokens are valid codes or EOS/PAD, never BOS
    assert (toks != tl.speech_bos).all()
    assert int(gen.lengths.min()) >= 2  # min_tokens floor

    tgt = jnp.asarray([[4, 5, 6, 0], [7, 8, 0, 0]], jnp.int32)
    tgt_len = jnp.asarray([3, 2], jnp.int32)
    loss = token_lm.lm_loss(p, tl, pre, tgt, tgt_len)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_cfm_window_position_invariance(cfg):
    """The windowed streaming solve relies on this invariant: content placed
    at different window slots but with the SAME absolute positions, masks and
    conditioning produces the SAME vector field at the content slots (gap
    slots are masked out of attention)."""
    c = cfg.cfm
    p = cfm.init_params(jax.random.PRNGKey(0), c)
    rng = np.random.default_rng(0)
    n, gap = 6, 3  # content frames, masked gap
    F = gap + n
    x_content = rng.standard_normal((1, n, c.n_mels)).astype(np.float32)
    cond_content = rng.standard_normal((1, n, c.dim)).astype(np.float32)
    spk = jnp.asarray(rng.standard_normal((1, c.spk_dim)), jnp.float32)
    abs_pos = 40 + np.arange(n)

    def field(slot0):
        x = np.zeros((1, F, c.n_mels), np.float32)
        cond = np.zeros((1, F, c.dim), np.float32)
        pos = np.zeros((1, F), np.int32)
        fmask = np.zeros((1, F), np.float32)
        x[:, slot0 : slot0 + n] = x_content
        cond[:, slot0 : slot0 + n] = cond_content
        pos[:, slot0 : slot0 + n] = abs_pos
        fmask[:, slot0 : slot0 + n] = 1.0
        v = cfm.vector_field(
            p, c, jnp.asarray(x), jnp.asarray([0.4]), jnp.asarray(cond), spk,
            jnp.zeros((1, F, c.n_mels)), jnp.zeros((1, F)), jnp.asarray(fmask),
            positions=jnp.asarray(pos),
        )
        return np.asarray(v)[0, slot0 : slot0 + n]

    v_left = field(0)      # content at slots [0, n)
    v_right = field(gap)   # same content at slots [gap, gap+n)
    np.testing.assert_allclose(v_left, v_right, atol=1e-5)


def test_speech_tokenizer_pad_invariance(cfg):
    """Tokens for the same audio must be identical regardless of how much the
    batch buffer is padded (style-DB insert vs serving buckets differ)."""
    st = cfg.speech_tokenizer
    p = speech_tokenizer.init_params(jax.random.PRNGKey(0), st)
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((1, 40, st.n_mels)).astype(np.float32)
    outs = []
    for total in (40, 64, 96):
        buf = np.full((1, total, st.n_mels), np.log(1e-5), np.float32)
        buf[:, :40] = mel
        mask = np.zeros((1, total), np.float32)
        mask[:, :40] = 1.0
        res = speech_tokenizer.apply(p, st, jnp.asarray(buf), jnp.asarray(mask))
        outs.append(np.asarray(res.tokens)[0, :10])
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_generate_speech_early_exit_semantics():
    """while_loop decode: rows that hit EOS early emit pad afterwards and
    lengths don't grow; forcing EOS as the only choice stops the loop."""
    import numpy as np

    from autostyle_tts_tpu.models import token_lm
    from autostyle_tts_tpu.ops.sampling import SamplerConfig
    from autostyle_tts_tpu.utils.config import tiny_config

    cfg = tiny_config().token_lm
    params = token_lm.init_params(jax.random.PRNGKey(0), cfg)
    # bias the speech head so EOS is argmax everywhere -> greedy stops at
    # min_tokens immediately
    head = np.asarray(params["speech_head"], np.float32)
    head = head * 0.0
    head[:, cfg.speech_eos] = 10.0
    params["speech_head"] = jnp.asarray(head)
    rng = np.random.default_rng(0)
    B = 2
    pre = token_lm.build_prefix(
        params, cfg,
        jnp.asarray(rng.integers(16, 200, (B, 8)), jnp.int32),
        jnp.full((B,), 8, jnp.int32),
        jnp.asarray(rng.integers(0, 64, (B, 4)), jnp.int32),
        jnp.full((B,), 4, jnp.int32),
        jnp.asarray(rng.standard_normal((B, cfg.spk_dim)), jnp.float32),
    )
    g = token_lm.generate_speech(
        params, cfg, pre, jax.random.PRNGKey(1), max_new_tokens=32,
        sampler=SamplerConfig(temperature=0.0), min_tokens=3,
    )
    toks = np.asarray(g.tokens)
    lens = np.asarray(g.lengths)
    assert (lens == 3).all()                       # 3 forced + EOS
    assert (toks[:, 3] == cfg.speech_eos).all()
    assert (toks[:, 4:] == cfg.speech_pad).all()   # pad after EOS


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
