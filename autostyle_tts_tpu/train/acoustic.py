"""Training steps for the synthesis stack (token LM, CFM decoder, vocoder,
tokenizer VQ) — jitted optax steps with dp-shardable batches.

The reference consumed a frozen pretrained CosyVoice-300M (no training code in
its repo; SURVEY §0), so its users could never adapt the engine. This module
makes every synthesis stage trainable on TPU:

- token LM: teacher-forced CE on speech continuations (models/token_lm.lm_loss)
- CFM: OT-CFM regression (models/cfm.cfm_loss) with conditioning dropout
- vocoder: multi-resolution STFT + mel L1 (models/vocoder losses; adversarial
  discriminators can be layered on later — the aux losses train a usable
  generator alone)
- speech tokenizer: VQ commitment loss + straight-through codebook update

Each `make_*_step` returns a jitted (params, opt_state, batch, key) ->
(params, opt_state, loss) function; batches shard over the data axis with
parallel.sharding.batch_sharding under a mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import cfm as cfm_lib
from ..models import token_lm as tlm_lib
from ..models import vocoder as voc_lib
from ..utils.config import CFMConfig, TokenLMConfig, VocoderConfig


def default_optimizer(lr: float = 1e-4, total_steps: int = 10000):
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.cosine_decay_schedule(lr, max(total_steps, 1))),
    )


# ----------------------------------------------------------------------- token LM


def make_token_lm_step(cfg: TokenLMConfig, optimizer, remat: bool = True):
    @partial(jax.jit, donate_argnames=("params", "opt_state"))
    def step(params, opt_state, batch, key):
        def loss_fn(p):
            pre = tlm_lib.build_prefix(
                p, cfg, batch["text"], batch["text_len"],
                batch["style_tokens"], batch["style_len"], batch["spk"],
            )
            return tlm_lib.lm_loss(
                p, cfg, pre, batch["targets"], batch["target_len"], remat=remat
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


# ----------------------------------------------------------------------- CFM


def make_cfm_step(cfg: CFMConfig, optimizer, cond_drop_prob: float = 0.2):
    @partial(jax.jit, donate_argnames=("params", "opt_state"))
    def step(params, opt_state, batch, key):
        def loss_fn(p):
            cond = cfm_lib.upsample_tokens(p, batch["tokens"], cfg.upsample)
            out = cfm_lib.cfm_loss(
                p, cfg, key, batch["mel"], cond, batch["spk"],
                batch["prompt_mask"], batch["frame_mask"],
                cond_drop_prob=cond_drop_prob,
            )
            return out.loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


# ----------------------------------------------------------------------- vocoder


def make_vocoder_step(
    cfg: VocoderConfig, optimizer, sr: int, n_fft: int, hop: int,
    stft_weight: float = 1.0, mel_weight: float = 45.0,
):
    @partial(jax.jit, donate_argnames=("params", "opt_state"))
    def step(params, opt_state, batch, key):
        def loss_fn(p):
            wav_pred = voc_lib.apply(p, cfg, batch["mel"])
            wav_true = batch["wav"][:, : wav_pred.shape[1]]
            return stft_weight * voc_lib.multi_res_stft_loss(
                wav_pred, wav_true
            ) + mel_weight * voc_lib.mel_l1_loss(
                wav_pred, wav_true, sr, n_fft, hop, cfg.n_mels
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


# ----------------------------------------------------------------------- vocoder GAN


def make_vocoder_gan_steps(
    cfg: VocoderConfig, gen_opt, disc_opt, sr: int, n_fft: int, hop: int,
    adv_weight: float = 1.0, fm_weight: float = 2.0, mel_weight: float = 45.0,
):
    """(generator_step, discriminator_step) — the full HiFi-GAN recipe:
    LSGAN adversarial + feature matching + mel L1 for G; LSGAN for D.
    Alternate D then G per batch (standard schedule)."""
    from ..models import discriminator as disc_lib

    @partial(jax.jit, donate_argnames=("d_params", "d_opt_state"))
    def disc_step(d_params, d_opt_state, g_params, batch, key):
        fake = jax.lax.stop_gradient(voc_lib.apply(g_params, cfg, batch["mel"]))
        real = batch["wav"][:, : fake.shape[1]]

        def loss_fn(dp):
            return disc_lib.discriminator_loss(dp, real, fake)

        loss, grads = jax.value_and_grad(loss_fn)(d_params)
        updates, d_opt_state = disc_opt.update(grads, d_opt_state, d_params)
        return optax.apply_updates(d_params, updates), d_opt_state, loss

    @partial(jax.jit, donate_argnames=("g_params", "g_opt_state"))
    def gen_step(g_params, g_opt_state, d_params, batch, key):
        real = batch["wav"]

        def loss_fn(gp):
            fake = voc_lib.apply(gp, cfg, batch["mel"])
            r = real[:, : fake.shape[1]]
            adv, fm = disc_lib.generator_adversarial_losses(d_params, r, fake)
            mel = voc_lib.mel_l1_loss(fake, r, sr, n_fft, hop, cfg.n_mels)
            return adv_weight * adv + fm_weight * fm + mel_weight * mel

        loss, grads = jax.value_and_grad(loss_fn)(g_params)
        updates, g_opt_state = gen_opt.update(grads, g_opt_state, g_params)
        return optax.apply_updates(g_params, updates), g_opt_state, loss

    return gen_step, disc_step


# ----------------------------------------------------------------------- tokenizer VQ


def make_tokenizer_step(
    st_cfg,
    audio_cfg,
    optimizer,
    n_phoneme_classes: int,
    aux_weight: float = 2.0,
    usage_decay: float = 0.98,
):
    """Speech-tokenizer training: VQ-VAE losses + a supervised PHONETIC
    objective — a linear head on the pre-VQ encoding predicts frame-level
    phoneme labels (25 Hz, aligned to tokens). This is what makes the codes
    phonetic rather than arbitrary acoustic clusters (round-1 gap: 'VQ losses
    exist but nothing makes tokens phonetic'). Labels come from the corpus
    (train/synthcorpus.py emits exact alignments; for found speech, a forced
    aligner's output drops into the same batch slot).

    DEAD-CODE RESTARTS (round-3 fix): with gradient-only codebook updates,
    codes that are never nearest get NO gradient — the randomly-initialized
    codebook can collapse to ONE live code (the shipped round-2 fixture did
    exactly that: every frame -> code 64; purity metrics were degenerate and
    only the PER intelligibility gate caught it). SoundStream-style remedy:
    track an EMA of per-code usage and re-seed codes whose share falls below
    1/(8V) with random valid encoder frames from the current batch. The
    restart also fixes init-scale mismatch automatically (re-seeded codes
    live AT feature locations).

    params tree: {"tok": speech_tokenizer params, "head": [D, n_classes]}.
    usage: [codebook_size] EMA of code usage share (init uniform 1/V).
    batch: {"wav16": [B, T], "len": [B], "phn": [B, T_tok], }
    step -> (params, opt_state, usage, loss, ce, acc, n_used)
    """
    from ..models import speech_tokenizer as st_lib
    from ..models.speech_tokenizer import quantize
    from ..ops import stft as stft_lib

    a = audio_cfg
    V = st_cfg.codebook_size

    @partial(jax.jit, donate_argnames=("params", "opt_state", "usage"))
    def step(params, opt_state, usage, batch, key):
        def loss_fn(p):
            mel16 = stft_lib.log_mel_spectrogram(
                batch["wav16"], a.prompt_sample_rate, a.prompt_n_fft,
                a.prompt_hop_length, a.prompt_win_length,
                n_mels=a.prompt_n_mels, fmax=a.prompt_fmax,
            )
            fmask = (
                jnp.arange(mel16.shape[1])[None, :]
                < (batch["len"][:, None] // a.prompt_hop_length) + 1
            ).astype(jnp.float32)
            res = st_lib.apply(p["tok"], st_cfg, mel16, fmask)
            cb, commit = vq_losses(
                p["tok"]["codebook"], res.pre_vq,
                res.token_mask.astype(jnp.float32),
            )
            # phoneme CE on the PRE-VQ encoder features: a clean gradient
            # that makes the encoding phoneme-separable; the codebook loss
            # then pulls codes onto that separable manifold, so TOKEN
            # phoneme-purity follows (measured in tests/test_trained_demo)
            logits = res.pre_vq.astype(jnp.float32) @ p["head"]
            # token count can exceed the 25 Hz label width by one frame
            # (mel framing rounds up) — clamp to the common span
            T = min(logits.shape[1], batch["phn"].shape[1])
            logits = logits[:, :T]
            labels = batch["phn"][:, :T]
            lm = res.token_mask[:, :T].astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.clip(labels, 0, n_phoneme_classes - 1)
            )
            ce = jnp.sum(ce * lm) / jnp.maximum(jnp.sum(lm), 1.0)
            acc = jnp.sum(
                (jnp.argmax(logits[:, :T], -1) == labels) * lm
            ) / jnp.maximum(jnp.sum(lm), 1.0)
            aux = (ce, acc, jax.lax.stop_gradient(res.pre_vq),
                   res.token_mask)
            return cb + commit + aux_weight * ce, aux

        (loss, (ce, acc, pre_vq, tmask)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        # ---- usage EMA + dead-code restarts (on the UPDATED codebook)
        tokens = quantize(params["tok"]["codebook"], pre_vq)
        hist = (
            jnp.zeros((V + 1,), jnp.float32)
            .at[jnp.where(tmask, tokens, V).reshape(-1)]
            .add(1.0)[:V]
        )
        n_used = jnp.sum((hist > 0).astype(jnp.int32))
        share = hist / jnp.maximum(hist.sum(), 1.0)
        usage = usage_decay * usage + (1.0 - usage_decay) * share
        dead = usage < (1.0 / (8.0 * V))
        flat = pre_vq.reshape(-1, pre_vq.shape[-1]).astype(
            params["tok"]["codebook"].dtype
        )
        # sample restart candidates from VALID frames only
        logp = jnp.log(tmask.reshape(-1).astype(jnp.float32) + 1e-9)
        idx = jax.random.categorical(key, logp, shape=(V,))
        params["tok"]["codebook"] = jnp.where(
            dead[:, None], flat[idx], params["tok"]["codebook"]
        )
        # grace period: restarted codes start at uniform share
        usage = jnp.where(dead, 1.0 / V, usage)
        return params, opt_state, usage, loss, ce, acc, n_used

    return step


def init_usage(st_cfg) -> jnp.ndarray:
    """Uniform initial code-usage EMA for make_tokenizer_step."""
    V = st_cfg.codebook_size
    return jnp.full((V,), 1.0 / V, jnp.float32)


def init_tokenizer_head(key, st_cfg, n_phoneme_classes: int) -> jnp.ndarray:
    return jax.random.normal(
        key, (st_cfg.dim, n_phoneme_classes)
    ) * st_cfg.dim ** -0.5


def make_phn_head_step(
    st_cfg,
    audio_cfg,
    optimizer,
    n_phoneme_classes: int,
):
    """Fit ONLY the linear phoneme head on a FROZEN (already trained)
    tokenizer — the standalone phoneme RECOGNIZER used by the intelligibility
    gate (pipeline/simeval.phoneme_error_rate): frame features -> phoneme
    logits, trained by masked CE against the corpus alignments. The joint
    tokenizer stage (make_tokenizer_step) discards its head at engine export;
    this stage re-derives one from any engine snapshot without touching the
    snapshot's weights (so the recognizer can never 'train the test').

    params: head [D, n_classes] only. batch: the tokenizer-stage batch
    ({"wav16", "len", "phn"}). Returns (head, opt_state, ce, acc)."""
    from ..models import speech_tokenizer as st_lib
    from ..ops import stft as stft_lib

    a = audio_cfg

    @partial(jax.jit, donate_argnames=("head", "opt_state"))
    def step(tok_params, head, opt_state, batch):
        mel16 = stft_lib.log_mel_spectrogram(
            batch["wav16"], a.prompt_sample_rate, a.prompt_n_fft,
            a.prompt_hop_length, a.prompt_win_length,
            n_mels=a.prompt_n_mels, fmax=a.prompt_fmax,
        )
        fmask = (
            jnp.arange(mel16.shape[1])[None, :]
            < (batch["len"][:, None] // a.prompt_hop_length) + 1
        ).astype(jnp.float32)
        res = st_lib.apply(tok_params, st_cfg, mel16, fmask)
        feats = jax.lax.stop_gradient(res.pre_vq.astype(jnp.float32))
        T = min(feats.shape[1], batch["phn"].shape[1])
        labels = batch["phn"][:, :T]
        lm = res.token_mask[:, :T].astype(jnp.float32)

        def loss_fn(h):
            logits = feats[:, :T] @ h
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.clip(labels, 0, n_phoneme_classes - 1)
            )
            ce = jnp.sum(ce * lm) / jnp.maximum(jnp.sum(lm), 1.0)
            acc = jnp.sum(
                (jnp.argmax(logits, -1) == labels) * lm
            ) / jnp.maximum(jnp.sum(lm), 1.0)
            return ce, acc

        (ce, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(head)
        updates, opt_state = optimizer.update(grads, opt_state, head)
        return optax.apply_updates(head, updates), opt_state, ce, acc

    return step


def vq_losses(
    codebook: jnp.ndarray, pre_vq: jnp.ndarray, frame_mask: jnp.ndarray,
    beta: float = 0.25,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(codebook_loss, commitment_loss) of the VQ layer. Straight-through
    gradients: codebook pulls toward encoder outputs, encoder commits to the
    chosen codes (VQ-VAE objective)."""
    from ..models.speech_tokenizer import quantize

    tokens = quantize(codebook, jax.lax.stop_gradient(pre_vq))
    chosen = codebook[tokens]                                   # [B, T, D]
    m = frame_mask[..., None].astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    cb_loss = jnp.sum(m * (chosen - jax.lax.stop_gradient(pre_vq)) ** 2) / n
    commit = jnp.sum(m * (jax.lax.stop_gradient(chosen) - pre_vq) ** 2) / n
    return cb_loss, beta * commit


def codebook_usage(tokens: jnp.ndarray, codebook_size: int) -> jnp.ndarray:
    """Fraction of codebook entries hit in this batch (collapse monitor)."""
    hits = jnp.zeros((codebook_size,), jnp.int32).at[tokens.reshape(-1)].add(1)
    return jnp.mean((hits > 0).astype(jnp.float32))
