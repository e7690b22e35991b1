"""CosyVoice TransformerLM compat: converted llm.pt -> speech tokens.

Mirrors the upstream token-LM wrapper the reference's engine loads
(tts_with_rag.py:107 loads the CosyVoice-300M dir whose llm.pt holds this
net): a conformer text encoder + affine, sos/task embeddings, a speaker
affine over the normalized 192-d x-vector, a speech-token embedding, a
causal transformer trunk, and a (speech_vocab+1)-way decoder head whose
last class is EOS. Prefix layout (upstream inference order):

    [sos_eos] [spk] [text_encoder(text) @ affine] [task] [speech_emb(prompt)]

Decode runs as ONE jitted program: prefill over the padded prefix, then a
lax.while_loop of wenet_conformer.decode_step with early exit on EOS —
the TPU equivalent of upstream's per-step python loop. Geometry is never
hardcoded: `infer_config` reads it off the converted tree, so the same code
serves the real 300M release and tiny synthetic test dirs.

Best-effort topology (zero-egress env; unvalidated against real files) —
see utils/cosyvoice_convert.RULESETS and docs/WEIGHTS.md.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ...ops.sampling import SamplerConfig, sample
from . import wenet_conformer as wc

Params = Dict


@dataclass(frozen=True)
class CosyLLMConfig:
    text_vocab: int
    speech_vocab: int                  # upstream speech_token_size; EOS id
    llm_dim: int
    spk_dim: int
    text_enc: wc.WenetEncoderConfig
    llm: wc.WenetEncoderConfig
    sos_eos: int = 0
    task_id: int = 1


def _enc_config(tree: Params, input_dim: int, activation: str) -> wc.WenetEncoderConfig:
    lw = tree["layers"]
    L, D, _ = lw["q"]["w"].shape
    F = lw["ff_w1"]["w"].shape[-1]
    H = lw["pos_bias_u"].shape[1]
    return wc.WenetEncoderConfig(
        input_dim=input_dim, dim=D, n_layers=L, n_heads=H, ffn_dim=F,
        macaron="ffm_w1" in lw, use_cnn="conv_pw1" in lw,
        cnn_kernel=lw["conv_dw"]["w"].shape[1] if "conv_pw1" in lw else 15,
        in_norm="in_norm" in tree, activation=activation,
    )


def infer_config(tree: Params, spk_dim: int = 192) -> CosyLLMConfig:
    """Read the whole LLM geometry off a converted param tree."""
    text_vocab, text_in = tree["text_embedding"].shape
    llm_dim = tree["llm_embedding"].shape[1]
    head_out = tree["llm_decoder"]["w"].shape[1]
    return CosyLLMConfig(
        text_vocab=text_vocab,
        speech_vocab=head_out - 1,     # +1 head class = EOS
        llm_dim=llm_dim,
        spk_dim=tree["spk_affine"]["w"].shape[0],
        text_enc=_enc_config(tree["text_encoder"], text_in, "silu"),
        llm=_enc_config(tree["llm"], llm_dim, "relu"),
    )


class Generated(NamedTuple):
    tokens: jnp.ndarray    # [B, max_new] int32 (pad = speech_vocab)
    lengths: jnp.ndarray   # [B]


def encode_text(params: Params, cfg: CosyLLMConfig, text_ids, text_mask):
    emb = params["text_embedding"][text_ids]
    h = wc.apply_encoder(params["text_encoder"], cfg.text_enc, emb, text_mask)
    return h @ params["text_encoder_affine"]["w"] + params["text_encoder_affine"]["b"]


def build_prefix(
    params: Params,
    cfg: CosyLLMConfig,
    text_ids: jnp.ndarray,      # [B, Wt] int32, left-aligned
    text_lens: jnp.ndarray,     # [B]
    prompt_tokens: jnp.ndarray, # [B, Wp] int32 prompt speech tokens
    prompt_lens: jnp.ndarray,   # [B]
    spk: jnp.ndarray,           # [B, spk_dim]
):
    """-> (prefix_emb [B, P, llm_dim], prefix_mask [B, P], prefix_lens [B]).
    P = 3 + Wt + Wp. Content is left-compacted per row (no pad gaps inside)
    so decode positions continue at prefix_lens."""
    B, Wt = text_ids.shape
    Wp = prompt_tokens.shape[1]
    P = 3 + Wt + Wp
    t_mask = (jnp.arange(Wt)[None, :] < text_lens[:, None]).astype(jnp.float32)
    text_h = encode_text(params, cfg, text_ids, t_mask)     # [B, Wt, D]
    spk_n = spk / jnp.maximum(
        jnp.linalg.norm(spk, axis=-1, keepdims=True), 1e-6
    )
    spk_e = spk_n @ params["spk_affine"]["w"] + params["spk_affine"]["b"]
    sos = jnp.broadcast_to(
        params["llm_embedding"][cfg.sos_eos][None, None], (B, 1, cfg.llm_dim)
    )
    task = params["llm_embedding"][cfg.task_id][None, None]
    sp_emb = params["speech_embedding"][prompt_tokens]      # [B, Wp, D]

    # slot map: [sos | spk | text(0..lt) | task | prompt(0..lp)], compacted
    lt = text_lens[:, None]
    lp = prompt_lens[:, None]
    pos = jnp.arange(P)[None, :]                            # [B, P]
    prefix_lens = 3 + text_lens + prompt_lens
    # gather sources per slot
    in_text = (pos >= 2) & (pos < 2 + lt)
    is_task = pos == 2 + lt
    in_prompt = (pos > 2 + lt) & (pos < 3 + lt + lp)
    text_idx = jnp.clip(pos - 2, 0, Wt - 1)
    prompt_idx = jnp.clip(pos - 3 - lt, 0, Wp - 1)
    D = cfg.llm_dim
    text_g = jnp.take_along_axis(text_h, text_idx[..., None], axis=1)
    prompt_g = jnp.take_along_axis(sp_emb, prompt_idx[..., None], axis=1)
    emb = jnp.where(
        (pos == 0)[..., None], sos,
        jnp.where(
            (pos == 1)[..., None], spk_e[:, None, :],
            jnp.where(
                in_text[..., None], text_g,
                jnp.where(
                    is_task[..., None], jnp.broadcast_to(task, (B, P, D)),
                    jnp.where(in_prompt[..., None], prompt_g, 0.0),
                ),
            ),
        ),
    )
    mask = (pos < prefix_lens[:, None]).astype(jnp.float32)
    return emb * mask[..., None], mask, prefix_lens


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "sampler"),
)
def generate(
    params: Params,
    cfg: CosyLLMConfig,
    text_ids: jnp.ndarray,
    text_lens: jnp.ndarray,
    prompt_tokens: jnp.ndarray,
    prompt_lens: jnp.ndarray,
    spk: jnp.ndarray,
    key: jax.Array,
    max_new_tokens: int = 128,
    sampler: SamplerConfig = SamplerConfig(top_k=25),
) -> Generated:
    """Prefix build + prefill + early-exit decode, one program. Upstream
    samples top-k 25 over (speech_vocab+1) classes and stops on the EOS
    class; emitted ids are < speech_vocab."""
    if sampler.top_k and sampler.top_k >= cfg.speech_vocab + 1:
        # tiny synthetic vocabs can undercut the upstream top-k 25 default
        import dataclasses

        sampler = dataclasses.replace(sampler, top_k=0)
    B, Wt = text_ids.shape
    P = 3 + Wt + prompt_tokens.shape[1]
    s_max = P + max_new_tokens
    emb, pmask, prefix_lens = build_prefix(
        params, cfg, text_ids, text_lens, prompt_tokens, prompt_lens, spk
    )
    h_all, cache = wc.prefill(params["llm"], cfg.llm, emb, pmask, s_max)
    # hidden at the last REAL prefix slot per row
    h_last = jnp.take_along_axis(
        h_all, (prefix_lens - 1)[:, None, None], axis=1
    )[:, 0]
    pe_dec = wc.relpos_table(jnp.arange(cfg.llm.max_rel), cfg.llm.dim)
    eos = cfg.speech_vocab
    tokens0 = jnp.full((B, max_new_tokens), eos, jnp.int32)

    def head(h):
        return h @ params["llm_decoder"]["w"] + params["llm_decoder"]["b"]

    def cond(state):
        i, _, _, _, _, done, _ = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, tokens, cache, h_last, key, done, lens = state
        key, sub = jax.random.split(key)
        logits = head(h_last)                              # [B, Vs+1]
        tok = sample(sub, logits, sampler).astype(jnp.int32)
        is_eos = tok >= eos
        newly_done = is_eos & ~done
        tok_emit = jnp.where(done | is_eos, eos, tok)
        tokens = jax.lax.dynamic_update_slice(
            tokens, tok_emit[:, None], (0, i)
        )
        lens = jnp.where(done | is_eos, lens, lens + 1)
        done = done | is_eos
        emb_t = params["speech_embedding"][jnp.clip(tok_emit, 0, eos)]
        pos = prefix_lens[0] + i          # B=1-style position (see note)
        kv_len = prefix_lens + i + 1
        h_next, cache = wc.decode_step(
            params["llm"], cfg.llm, cache, emb_t, pos, kv_len, pe_dec
        )
        return (i + 1, tokens, cache, h_next, key, done, lens)

    state = (
        jnp.int32(0), tokens0, cache, h_last, key,
        jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32),
    )
    _, tokens, _, _, _, _, lens = jax.lax.while_loop(cond, body, state)
    return Generated(tokens=tokens, lengths=lens)
