"""Acoustic-stack trainability: each jitted train step overfits one batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autostyle_tts_tpu.models import cfm, token_lm, vocoder
from autostyle_tts_tpu.train import acoustic
from autostyle_tts_tpu.utils.config import tiny_config


@pytest.fixture(scope="module")
def cfg():
    return tiny_config()


def _run_steps(step, params, opt_state, batch, n=12):
    losses = []
    for i in range(n):
        params, opt_state, loss = step(params, opt_state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    return losses


def test_token_lm_overfits_one_batch(cfg):
    tl = cfg.token_lm
    params = token_lm.init_params(jax.random.PRNGKey(0), tl)
    opt = acoustic.default_optimizer(lr=3e-3)
    opt_state = opt.init(params)
    step = acoustic.make_token_lm_step(tl, opt, remat=False)
    rng = np.random.default_rng(0)
    batch = {
        "text": jnp.asarray(rng.integers(16, 200, (2, 6)), jnp.int32),
        "text_len": jnp.asarray([6, 4], jnp.int32),
        "style_tokens": jnp.asarray(rng.integers(0, 64, (2, 4)), jnp.int32),
        "style_len": jnp.asarray([4, 3], jnp.int32),
        "spk": jnp.asarray(rng.standard_normal((2, tl.spk_dim)), jnp.float32),
        "targets": jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32),
        "target_len": jnp.asarray([8, 6], jnp.int32),
    }
    losses = _run_steps(step, params, opt_state, batch)
    assert losses[-1] < losses[0] * 0.8, losses


def test_cfm_overfits_one_batch(cfg):
    c = cfg.cfm
    params = cfm.init_params(jax.random.PRNGKey(0), c)
    opt = acoustic.default_optimizer(lr=3e-3)
    opt_state = opt.init(params)
    step = acoustic.make_cfm_step(c, opt, cond_drop_prob=0.0)
    rng = np.random.default_rng(0)
    B, T_tok = 2, 6
    F = T_tok * c.upsample
    batch = {
        "tokens": jnp.asarray(rng.integers(0, 64, (B, T_tok)), jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, F, c.n_mels)), jnp.float32),
        "spk": jnp.asarray(rng.standard_normal((B, c.spk_dim)), jnp.float32),
        "prompt_mask": jnp.zeros((B, F)).at[:, :2].set(1.0),
        "frame_mask": jnp.ones((B, F)),
    }
    # fixed key -> deterministic (x0, t) draw; the step must fit that target
    losses = []
    for _ in range(25):
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(7)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses


def test_vocoder_overfits_one_batch(cfg):
    v = cfg.vocoder
    a = cfg.audio
    params = vocoder.init_params(jax.random.PRNGKey(0), v)
    opt = acoustic.default_optimizer(lr=1e-3)
    opt_state = opt.init(params)
    step = acoustic.make_vocoder_step(
        v, opt, sr=a.sample_rate, n_fft=a.n_fft, hop=a.hop_length
    )
    rng = np.random.default_rng(0)
    F = 16
    up = vocoder.total_upsample(v)
    t = np.arange(F * up) / a.sample_rate
    wav = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None, :]
    from autostyle_tts_tpu.ops.stft import log_mel_spectrogram

    mel = log_mel_spectrogram(
        jnp.asarray(wav), a.sample_rate, a.n_fft, a.hop_length, n_mels=v.n_mels
    )[:, :F]
    batch = {"mel": mel, "wav": jnp.asarray(wav)}
    losses = _run_steps(step, params, opt_state, batch, n=15)
    assert losses[-1] < losses[0], losses


def test_vq_losses_and_usage(cfg):
    st = cfg.speech_tokenizer
    rng = np.random.default_rng(0)
    codebook = jnp.asarray(rng.standard_normal((st.codebook_size, st.dim)), jnp.float32)
    pre = jnp.asarray(rng.standard_normal((2, 10, st.dim)), jnp.float32)
    mask = jnp.ones((2, 10))
    cb_loss, commit = acoustic.vq_losses(codebook, pre, mask)
    assert float(cb_loss) > 0 and float(commit) > 0
    # a codebook equal to the encodings has ~zero loss
    pre1 = codebook[jnp.asarray([[1, 2, 3]])]
    cb0, cm0 = acoustic.vq_losses(codebook, pre1, jnp.ones((1, 3)))
    assert float(cb0) < 1e-10 and float(cm0) < 1e-10
    # usage monitor
    from autostyle_tts_tpu.models.speech_tokenizer import quantize

    toks = quantize(codebook, pre)
    u = acoustic.codebook_usage(toks, st.codebook_size)
    assert 0.0 < float(u) <= 1.0


def test_vq_gradients_flow_to_encoder_and_codebook(cfg):
    st = cfg.speech_tokenizer
    rng = np.random.default_rng(1)
    codebook = jnp.asarray(rng.standard_normal((st.codebook_size, st.dim)), jnp.float32)
    pre = jnp.asarray(rng.standard_normal((1, 5, st.dim)), jnp.float32)
    mask = jnp.ones((1, 5))

    g_cb = jax.grad(lambda cb: acoustic.vq_losses(cb, pre, mask)[0])(codebook)
    g_enc = jax.grad(lambda h: acoustic.vq_losses(codebook, h, mask)[1])(pre)
    assert float(jnp.abs(g_cb).max()) > 0
    assert float(jnp.abs(g_enc).max()) > 0


def test_tokenizer_step_restarts_dead_codes(cfg):
    """VQ collapse regression (round-3): a codebook initialized FAR from the
    feature distribution collapses to ~1 live code under gradient-only
    updates; the usage-EMA dead-code restarts must re-seed codes onto the
    features so batch code usage recovers (the round-2 shipped fixture
    collapsed exactly this way — every frame mapped to one code, and the
    purity/round-trip gates were degenerate)."""
    st = cfg.speech_tokenizer
    a = cfg.audio
    opt = acoustic.default_optimizer(lr=1e-3)
    # fast-decay usage so dead codes are detected within a few steps
    step = acoustic.make_tokenizer_step(st, a, opt, 8, usage_decay=0.5)
    params = {
        "tok": __import__(
            "autostyle_tts_tpu.models.speech_tokenizer",
            fromlist=["init_params"],
        ).init_params(jax.random.PRNGKey(0), st),
        "head": acoustic.init_tokenizer_head(jax.random.PRNGKey(1), st, 8),
    }
    # push the codebook far away: everything quantizes to one nearest code
    params["tok"]["codebook"] = (
        params["tok"]["codebook"] + 50.0
    )
    opt_state = opt.init(params)
    usage = acoustic.init_usage(st)
    rng = np.random.default_rng(0)
    T = a.prompt_sample_rate  # 1 s
    batch = {
        "wav16": jnp.asarray(
            0.3 * np.sin(2 * np.pi * 220 * np.arange(2 * T).reshape(2, T)
                         / a.prompt_sample_rate)
            + 0.05 * rng.standard_normal((2, T)), jnp.float32
        ),
        "len": jnp.asarray([T, T // 2], jnp.int32),
        "phn": jnp.asarray(rng.integers(0, 8, (2, 64)), jnp.int32),
    }
    used = []
    for i in range(10):
        params, opt_state, usage, loss, ce, acc, n_used = step(
            params, opt_state, usage, batch, jax.random.PRNGKey(i)
        )
        used.append(int(n_used))
    # collapsed at first (codebook offset +50 -> one nearest code), alive
    # after restarts kick in
    assert used[0] <= 2, used
    assert used[-1] >= 4, used
    assert float(jnp.abs(params["tok"]["codebook"]).max()) < 60.0


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
