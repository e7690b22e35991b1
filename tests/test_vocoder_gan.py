"""HiFi-GAN discriminator ensemble + adversarial vocoder training step."""

import jax
import jax.numpy as jnp
import numpy as np

from autostyle_tts_tpu.models import discriminator as disc
from autostyle_tts_tpu.models import vocoder
from autostyle_tts_tpu.train import acoustic
from autostyle_tts_tpu.utils.config import tiny_config


def _wavs(n=2, t=960, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((n, t)) * 0.3, jnp.float32)


def test_discriminator_outputs():
    p = disc.init_params(jax.random.PRNGKey(0))
    outs = disc.apply(p, _wavs())
    assert len(outs) == len(disc.PERIODS) + 3  # 5 MPD + 3 MSD
    for score, feats in outs:
        assert score.ndim == 2 and score.shape[0] == 2
        assert len(feats) >= 4
        assert np.isfinite(np.asarray(score)).all()


def test_disc_loss_separates_real_fake():
    """Perfect discrimination (real->1, fake->0) gives ~0 loss; verify the
    loss decreases when training D on fixed real/fake."""
    p = disc.init_params(jax.random.PRNGKey(0))
    real = _wavs(seed=1)
    fake = _wavs(seed=2) * 0.01
    import optax

    opt = optax.adam(1e-4)
    st = opt.init(p)
    losses = []
    for _ in range(6):
        loss, grads = jax.value_and_grad(disc.discriminator_loss)(p, real, fake)
        up, st = opt.update(grads, st, p)
        p = optax.apply_updates(p, up)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_gan_steps_run_and_update():
    cfg = tiny_config()
    v, a = cfg.vocoder, cfg.audio
    g = vocoder.init_params(jax.random.PRNGKey(0), v)
    d = disc.init_params(jax.random.PRNGKey(1))
    g_opt = acoustic.default_optimizer(1e-4)
    d_opt = acoustic.default_optimizer(1e-4)
    g_st, d_st = g_opt.init(g), d_opt.init(d)
    gen_step, disc_step = acoustic.make_vocoder_gan_steps(
        v, g_opt, d_opt, sr=a.sample_rate, n_fft=a.n_fft, hop=a.hop_length
    )
    F = 8
    up = vocoder.total_upsample(v)
    rng = np.random.default_rng(0)
    batch = {
        "mel": jnp.asarray(rng.standard_normal((2, F, v.n_mels)), jnp.float32),
        "wav": jnp.asarray(rng.standard_normal((2, F * up)) * 0.3, jnp.float32),
    }
    g0 = np.asarray(jax.tree_util.tree_leaves(g)[0]).copy()
    d, d_st, d_loss = disc_step(d, d_st, g, batch, jax.random.PRNGKey(0))
    g, g_st, g_loss = gen_step(g, g_st, d, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))
    g1 = np.asarray(jax.tree_util.tree_leaves(g)[0])
    assert np.abs(g1 - g0).max() > 0  # generator actually updated
