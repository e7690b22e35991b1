"""Speech-token LM: (text, style prompt, timbre) -> discrete speech tokens.

Replaces the ~300M autoregressive token LM inside the reference's synthesis
engine (SURVEY §2.3.1 "Token LM" row: text+prompt tokens -> speech tokens,
CUDA). Built on the shared transformer core (models/transformer.py): mixed
input embeddings, one prefix layout serving every inference mode the
reference exposed (zero_shot / vc / tts_with_st, SURVEY §2.3.1 API surface):

    [SPK] [text: prompt_text ++ tts_text] [BOS_s] [style speech tokens] | gen...

- SPK: timbre embedding projected to model dim (one soft token).
- text tokens: frontend byte tokens (style transcript then target text).
- style speech tokens: the prosody prompt — continuation imitates its style.
  In zero-shot mode these come from the (single) prompt wav; in the
  tts_with_st mode style tokens come from the STYLE wav while SPK/mel come
  from the TIMBRE wav (the paper's custom split, SURVEY §7 hard part 2).

Decoding runs as the core's single-program scan (prefill embeds + step loop).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import causal_mask, rope_table
from ..ops.sampling import SamplerConfig, sample, transform_logits
from ..utils.config import TokenLMConfig, TransformerConfig
from . import transformer as core

Params = Dict


def unstack_decode_params(params: Params, cfg: TokenLMConfig):
    """Per-layer weight views for the fused Pallas decode path
    (ops/pallas_decode.py). Built ONCE at engine init, outside jit, so the
    slices are real device buffers — sliced inside the decode loop they
    would re-materialize per program instead."""
    from ..ops.quant import QTensor

    lp = params["layers"]
    layers = []
    for l in range(cfg.n_layers):
        layers.append(
            {
                "attn_norm": lp["attn_norm"][l][None, :],
                "wqkv": QTensor(q=lp["wqkv"].q[l], s=lp["wqkv"].s[l]),
                "wo": QTensor(q=lp["wo"].q[l], s=lp["wo"].s[l]),
                "mlp_norm": lp["mlp_norm"][l][None, :],
                "w_gate_up": QTensor(
                    q=lp["w_gate_up"].q[l], s=lp["w_gate_up"].s[l]
                ),
                "w_down": QTensor(q=lp["w_down"].q[l], s=lp["w_down"].s[l]),
            }
        )
    return layers


def _pack4_lanes(q8, s8, force_scale=None):
    """int8 QTensor leaves -> (int8 byte-carrier lane-packed int4, f32 scales).

    Re-quantizes the int8 approximation at 4 bits with per-OUTPUT-channel
    scales, then packs channel pairs (c, c + C/2) per byte (low nibble = c,
    offset-binary v+8) so the kernel's unpack is elementwise + one lane
    concat — no Mosaic relayout (ops/pallas_decode._unpack4_lanes).
    force_scale shares one scale across a leading tile dim (w_down tiles
    accumulate BEFORE their single post-sum scale multiply)."""
    import jax.numpy as jnp

    w = q8.astype(jnp.float32) * s8
    if force_scale is None:
        absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
        s4 = jnp.maximum(absmax, 1e-8) / 7.0
    else:
        s4 = force_scale
    q4 = jnp.clip(jnp.round(w / s4), -7, 7).astype(jnp.int32)
    C = q4.shape[-1]
    lo = q4[..., : C // 2]
    hi = q4[..., C // 2 :]
    # int8 carrier, HIGH nibble stored SIGNED (two's complement), low nibble
    # offset-binary: the signed byte value is then v = 16*hi + (lo+8) with
    # remainder (lo+8) in [0,15], so the kernel unpacks with floor(v/16) and
    # v - 16*hi — pure bf16 arithmetic, no shifts/compares (Mosaic supports
    # neither on packed i8 vectors; see ops/pallas_decode._unpack4_lanes)
    packed = (hi * 16 + (lo + 8)).astype(jnp.int8)
    return packed, s4.astype(jnp.float32)


def int4_lanes_ok(cfg: TokenLMConfig, tile_f: int = 512) -> bool:
    """True when the int4-packed megakernel weight streams stay whole
    128-lane vregs (dim/2, tile_f for gate|up, head-tile/2). Narrow/test
    geometries fail Mosaic's lane-slice alignment and must serve int8."""
    tf = min(tile_f, cfg.ffn_dim)
    return cfg.dim % 256 == 0 and tf % 128 == 0


def mega_decode_params(params: Params, cfg: TokenLMConfig, tile_f: int = 512,
                       bits: int = 8):
    """TILE-MAJOR stacked weights for the one-call-per-step megakernel
    (ops/pallas_decode.mega_decode_step). Every grid step's block is a
    contiguous chunk: qkv split into q/k/v thirds [L, 3, D, N]; gate|up
    interleaved per FFN tile [L, JM, D, 2*tf]; down as row tiles
    [L, JM, tf, D]. Built once at engine init (outside jit).

    bits=4 re-quantizes every weight stream to lane-packed int4 (int8
    byte carrier, output-channel pairs per byte) — HALF the per-step HBM
    weight traffic; the kernel dispatches on packed WIDTH (half lanes).
    Embedding/norms stay bf16/f32."""
    import jax.numpy as jnp

    lp = params["layers"]
    L, D, F = cfg.n_layers, cfg.dim, cfg.ffn_dim
    tf = min(tile_f, F)
    assert F % tf == 0, (F, tf)
    JM = F // tf
    q3 = jnp.stack(jnp.split(lp["wqkv"].q, 3, axis=2), axis=1)
    s3 = jnp.stack(jnp.split(lp["wqkv"].s, 3, axis=2), axis=1)
    g = lp["w_gate_up"].q[..., :F].reshape(L, D, JM, tf)
    u = lp["w_gate_up"].q[..., F:].reshape(L, D, JM, tf)
    gs = lp["w_gate_up"].s[..., :F].reshape(L, 1, JM, tf)
    us = lp["w_gate_up"].s[..., F:].reshape(L, 1, JM, tf)
    # speech head, column-tiled and lane-padded (padded ids masked in-kernel)
    V = cfg.speech_vocab_size
    JH = max(1, -(-V // 1536))
    # int4 packs output-channel pairs per byte, so the PACKED width TV/2
    # must still be whole 128-lane vregs -> round TV to 256 when packing
    tv_align = 256 if bits == 4 else 128
    TV = -(-V // (JH * tv_align)) * tv_align
    head_q = jnp.zeros((D, JH * TV), jnp.int8).at[:, :V].set(
        params["speech_head"].q
    )
    head_s = jnp.zeros((1, JH * TV), jnp.float32).at[:, :V].set(
        params["speech_head"].s
    )
    JMH = 4 + JM   # grid steps per layer; head tiles + sample must fit
    assert JH < JMH, (JH, JMH)
    # the kernel's logit scratch is 8 sublane rows (logit_s[pl.ds(j,1)] writes
    # + the rows>=JH mask assume it); a speech vocab > 8*1536 would index past
    # it — refuse loudly here rather than corrupt VMEM in-kernel
    assert JH <= 8, (
        f"speech_vocab_size={V} needs {JH} head tiles but the megakernel's "
        "logit scratch holds 8 rows; raise the scratch in mega_decode_step"
    )
    # speech-embedding table, bf16, row count padded to a multiple of 8 for
    # the kernel's aligned row-window DMA
    V8 = -(-V // 8) * 8
    emb8 = jnp.zeros((V8, D), jnp.bfloat16).at[:V].set(
        params["speech_emb"].astype(jnp.bfloat16)
    )
    # rotate-half inverse-frequency row, tiled across heads: lane h*hd + i
    # multiplies position by inv_freq[i % (hd/2)] (same source as rope_table)
    from ..ops.attention import rope_inv_freq

    inv = rope_inv_freq(cfg.head_dim, cfg.rope_theta)
    invf = jnp.tile(jnp.concatenate([inv, inv]), cfg.n_kv_heads)[None, :]
    mp = {
        "emb8": emb8,
        "invf": invf,
        "attn_norm": lp["attn_norm"][:, None, :],
        "mlp_norm": lp["mlp_norm"][:, None, :],
        "wqkv3": q3,
        "wqs3": s3,
        "wo": lp["wo"].q,
        "wos": lp["wo"].s,
        "wgu_t": jnp.concatenate([g, u], axis=-1).transpose(0, 2, 1, 3),
        "wgus_t": jnp.concatenate([gs, us], axis=-1).transpose(0, 2, 1, 3),
        "wd_t": lp["w_down"].q.reshape(L, JM, tf, D),
        "wds": lp["w_down"].s,
        "final_norm": params["final_norm"][None, :],
        "head_t": head_q.reshape(D, JH, TV).transpose(1, 0, 2),
        "head_s": head_s.reshape(1, JH, TV).transpose(1, 0, 2),
    }
    if bits == 4:
        # COMPILED int4 needs every packed stream's last dim (qkv/wo/wd:
        # D/2; gate|up: tf; head: TV/2) to stay whole 128-lane vregs or
        # Mosaic rejects the in-kernel lane slices (verified on v5e: width
        # 64 fails "must be aligned to tiling (128)"). int4_lanes_ok()
        # gates the engine's compiled path; interpret-mode tests may build
        # unaligned tiny geometries freely.
        assert D % 2 == 0 and tf % 2 == 0 and TV % 2 == 0
        mp["wqkv3"], mp["wqs3"] = _pack4_lanes(mp["wqkv3"], mp["wqs3"])
        mp["wo"], mp["wos"] = _pack4_lanes(mp["wo"], mp["wos"])
        mp["wgu_t"], mp["wgus_t"] = _pack4_lanes(mp["wgu_t"], mp["wgus_t"])
        # w_down tiles accumulate before ONE post-sum scale: share the scale
        # across tiles (absmax over JM and tf jointly, per output channel)
        wd_w = mp["wd_t"].astype(jnp.float32) * lp["w_down"].s[:, None]
        s4 = jnp.maximum(
            jnp.max(jnp.abs(wd_w), axis=(1, 2), keepdims=True), 1e-8
        ) / 7.0
        mp["wd_t"], _ = _pack4_lanes(
            mp["wd_t"], lp["w_down"].s[:, None], force_scale=s4
        )
        mp["wds"] = s4[:, 0]
        mp["head_t"], mp["head_s"] = _pack4_lanes(mp["head_t"], mp["head_s"])
    return mp


def core_config(cfg: TokenLMConfig) -> TransformerConfig:
    """The decoder trunk reuses the shared core; vocab here is the TEXT vocab
    (speech embedding/head are separate tables below)."""
    return TransformerConfig(
        vocab_size=cfg.text_vocab_size,
        dim=cfg.dim,
        n_layers=cfg.n_layers,
        n_heads=cfg.n_heads,
        n_kv_heads=cfg.n_kv_heads,
        ffn_dim=cfg.ffn_dim,
        max_seq_len=cfg.max_seq_len,
        rope_theta=cfg.rope_theta,
        norm_eps=cfg.norm_eps,
        dtype="bfloat16",
    )


def init_params(key: jax.Array, cfg: TokenLMConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    D = cfg.dim
    p = core.init_params(k1, core_config(cfg))
    p["speech_emb"] = jax.random.normal(k2, (cfg.speech_vocab_size, D)) * D**-0.5
    p["speech_head"] = jax.random.normal(k3, (D, cfg.speech_vocab_size)) * D**-0.5
    p["spk_proj"] = jax.random.normal(k4, (cfg.spk_dim, D)) * cfg.spk_dim**-0.5
    return p


# ----------------------------------------------------------------------- prefix building


class Prefix(NamedTuple):
    embeds: jnp.ndarray     # [B, P, D] LEFT-padded prefix embeddings
    length: jnp.ndarray     # [B] real lengths


def build_prefix(
    params: Params,
    cfg: TokenLMConfig,
    text: jnp.ndarray,          # [B, T_txt] right-padded text ids
    text_len: jnp.ndarray,      # [B]
    style_tokens: jnp.ndarray,  # [B, T_sty] right-padded speech tokens
    style_len: jnp.ndarray,     # [B]
    spk: jnp.ndarray,           # [B, spk_dim]
) -> Prefix:
    """Assemble [SPK][text][BOS_s][style tokens] LEFT-padded, fully on device
    (no per-row host concat): each part is placed by index arithmetic."""
    B, T_txt = text.shape
    T_sty = style_tokens.shape[1]
    D = cfg.dim
    P = 1 + T_txt + 1 + T_sty
    total = 2 + text_len + style_len                       # [B]
    pad = P - total                                        # left-pad per row

    pos = jnp.arange(P)[None, :]                           # [1, P] slot index
    r = pos - pad[:, None]                                 # rank within real prefix
    # segment ids: 0 pad | 1 spk | 2 text | 3 bos | 4 style
    in_text = (r >= 1) & (r <= text_len[:, None])
    is_spk = r == 0
    is_bos = r == (text_len + 1)[:, None]
    in_style = (r >= (text_len + 2)[:, None]) & (r < total[:, None])

    text_idx = jnp.clip(r - 1, 0, T_txt - 1)
    style_idx = jnp.clip(r - (text_len + 2)[:, None], 0, T_sty - 1)

    text_ids = jnp.take_along_axis(text, text_idx, axis=1)  # gather ids, then
    text_e = params["tok_emb"][text_ids]                    # embed once [B,P,D]
    style_ids = jnp.take_along_axis(style_tokens, style_idx, axis=1)
    style_e = params["speech_emb"][style_ids]
    spk_e = (spk @ params["spk_proj"])[:, None, :]
    bos_e = params["speech_emb"][cfg.speech_bos][None, None, :]

    emb = jnp.zeros((B, P, D), text_e.dtype)
    emb = jnp.where(is_spk[..., None], spk_e, emb)
    emb = jnp.where(in_text[..., None], text_e, emb)
    emb = jnp.where(is_bos[..., None], bos_e, emb)
    emb = jnp.where(in_style[..., None], style_e, emb)
    return Prefix(embeds=emb, length=total)


@partial(jax.jit, static_argnames=("cfg", "pad_multiple"))
def build_prefix_padded(
    params: Params,
    cfg: TokenLMConfig,
    text: jnp.ndarray,
    text_len: jnp.ndarray,
    style_tokens: jnp.ndarray,
    style_len: jnp.ndarray,
    spk: jnp.ndarray,
    *,
    pad_multiple: int = 128,
) -> Prefix:
    """build_prefix + pad_prefix as ONE jitted program. Called eagerly the
    ~25 prefix-assembly ops each pay a per-op dispatch latency through a
    tunneled device (~45 ms of the serving p50); fused they are one
    dispatch."""
    pre = build_prefix(params, cfg, text, text_len, style_tokens, style_len, spk)
    return pad_prefix(pre, multiple=pad_multiple)


def pad_prefix(prefix: Prefix, multiple: int = 128) -> Prefix:
    """Extend the LEFT padding so P is a multiple of `multiple` (Pallas flash
    prefill block alignment). Extra pad slots are masked via the offset."""
    B, P, D = prefix.embeds.shape
    extra = (-P) % multiple
    if extra == 0:
        return prefix
    pad = jnp.zeros((B, extra, D), prefix.embeds.dtype)
    return Prefix(
        embeds=jnp.concatenate([pad, prefix.embeds], axis=1), length=prefix.length
    )


# ----------------------------------------------------------------------- generate


class SpeechGen(NamedTuple):
    tokens: jnp.ndarray     # [B, max_new] int32 (pad after EOS)
    lengths: jnp.ndarray    # [B]


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "sampler", "min_tokens",
                     "kv_int8", "fused"),
)
def generate_speech(
    params: Params,
    cfg: TokenLMConfig,
    prefix: Prefix,
    key: jax.Array,
    *,
    max_new_tokens: int,
    sampler: SamplerConfig = SamplerConfig(temperature=1.0, top_k=25),
    min_tokens: int = 2,
    kv_int8: bool = False,
    fused: bool = False,
    decode_params=None,
) -> SpeechGen:
    """Single-program prefill + scan decode over speech tokens with EOS and
    a min-length floor (EOS logit suppressed before min_tokens). The KV cache
    is allocated INSIDE the program (never crosses the host boundary);
    kv_int8 stores it quantized (half the per-step HBM cache traffic).

    fused=True (B=1, int8 weights, H==K) runs each decode step through the
    Pallas half-layer kernels (ops/pallas_decode.py) over per-layer caches —
    ~2x per-step time vs the scanned XLA path; decode_params must be the
    matching unstack_decode_params(params, cfg) pytree. The cache is bf16 in
    this mode (kv_int8 ignored — cache traffic is ~2% of a step)."""
    ccfg = core_config(cfg)
    B, P, D = prefix.embeds.shape
    # the megakernel samples in-kernel (greedy / temperature / top-k); a
    # top-p request falls back to the scanned XLA sampler
    if fused and isinstance(decode_params, dict) and (
        not sampler.greedy and sampler.top_p < 1.0
    ):
        fused = False
    # round the cache up to 8 slots: the fused path's aligned row-window DMA
    # needs it, and the tail slots are masked out either way
    S_max = -(-(P + max_new_tokens + 1) // 8) * 8
    if fused:
        kv_int8 = False
    cache = core.make_cache(ccfg, B, S_max, quantized=kv_int8)
    slot = jnp.arange(S_max, dtype=jnp.int32)
    offset = (P - prefix.length).astype(jnp.int32)

    pos = jnp.maximum(jnp.arange(P, dtype=jnp.int32)[None, :] - offset[:, None], 0)
    valid = slot[None, :] >= offset[:, None]
    pmask = causal_mask(P, S_max) & valid[:, None, None, :]
    out = core.forward(
        params, ccfg, inputs_embeds=prefix.embeds, positions=pos, mask=pmask,
        cache=cache, cache_start=jnp.int32(0), skip_logits=True,
        flash_offset=offset if core.flash_ok(P, ccfg.head_dim) else None,
    )
    head = params["speech_head"]
    next_logits = core.matmul_any(out.hidden[:, -1], head).astype(jnp.float32)

    eos, padt = cfg.speech_eos, cfg.speech_pad

    if fused:
        return _generate_fused(
            params, decode_params, cfg, ccfg, out.cache, next_logits, key,
            P=P, max_new_tokens=max_new_tokens, offset=offset,
            sampler=sampler, min_tokens=min_tokens,
        )

    def step(carry):
        cache, cur_logits, gen_len, done, key, i, toks = carry
        key, sub = jax.random.split(key)
        logits = cur_logits.at[:, padt].set(-1e30).at[:, cfg.speech_bos].set(-1e30)
        logits = jnp.where(
            (i < min_tokens) & (jnp.arange(logits.shape[-1]) == eos)[None, :],
            -1e30, logits,
        )
        tok = sample(sub, logits, sampler)
        tok = jnp.where(done, padt, tok)
        is_eos = tok == eos
        gen_len = gen_len + (~done & ~is_eos)
        done = done | is_eos
        toks = jax.lax.dynamic_update_slice(toks, tok[:, None], (0, i))
        emb = params["speech_emb"][tok][:, None, :]
        positions = (P + i - offset)[:, None]
        smask = (valid & (slot[None, :] <= P + i))[:, None, None, :]
        out = core.forward(
            params, ccfg, inputs_embeds=emb, positions=positions, mask=smask,
            cache=cache, cache_start=P + i, skip_logits=True,
        )
        nxt = core.matmul_any(out.hidden[:, 0], head).astype(jnp.float32)
        return (out.cache, nxt, gen_len, done, key, i + 1, toks)

    def cond(carry):
        # EARLY EXIT: stop the decode loop as soon as every row has emitted
        # EOS — short utterances don't pay for the max_new bucket (a scan
        # would run all steps regardless)
        *_, done, _, i, _ = carry
        return (i < max_new_tokens) & ~jnp.all(done)

    zeros = jnp.zeros((B,), jnp.int32)
    toks0 = jnp.full((B, max_new_tokens), padt, jnp.int32)
    (cache, _, gen_len, done, _, _, toks) = jax.lax.while_loop(
        cond, step,
        (out.cache, next_logits, zeros, jnp.zeros((B,), bool), key,
         jnp.int32(0), toks0),
    )
    return SpeechGen(tokens=toks, lengths=gen_len)


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "sampler", "min_tokens",
                     "kv_int8", "fused", "pad_multiple"),
)
def generate_speech_from_ids(
    params: Params,
    cfg: TokenLMConfig,
    text: jnp.ndarray,
    text_len: jnp.ndarray,
    style_tokens: jnp.ndarray,
    style_len: jnp.ndarray,
    spk: jnp.ndarray,
    key: jax.Array,
    *,
    max_new_tokens: int,
    sampler: SamplerConfig = SamplerConfig(temperature=1.0, top_k=25),
    min_tokens: int = 2,
    kv_int8: bool = False,
    fused: bool = False,
    decode_params=None,
    pad_multiple: int = 128,
) -> SpeechGen:
    """build_prefix + pad_prefix + generate_speech as ONE program: over a
    tunneled device each separate program submission costs ~10 ms of
    round-trip, so the serving path dispatches once per utterance."""
    pre = build_prefix(params, cfg, text, text_len, style_tokens, style_len, spk)
    pre = pad_prefix(pre, multiple=pad_multiple)
    return generate_speech(
        params, cfg, pre, key, max_new_tokens=max_new_tokens, sampler=sampler,
        min_tokens=min_tokens, kv_int8=kv_int8, fused=fused,
        decode_params=decode_params,
    )


# ----------------------------------------------------------- speculative decode


class SpecGen(NamedTuple):
    tokens: jnp.ndarray     # [1, max_new] int32 (pad after EOS)
    lengths: jnp.ndarray    # [1]
    n_verify: jnp.ndarray   # scalar: verify forwards run
    n_commit: jnp.ndarray   # scalar: tokens committed (= lengths unless EOS)


def _lookup_draft(ctx: jnp.ndarray, w: jnp.ndarray, gamma: int) -> jnp.ndarray:
    """Prompt-lookup drafting (no draft model): find the most recent earlier
    occurrence of the last bigram in ctx[:w] and propose the `gamma` tokens
    that followed it; fall back to repeating the last token. Drafts are
    VERIFIED by the target model, so a bad draft costs acceptance, never
    correctness."""
    W = ctx.shape[0]
    j = jnp.arange(W)
    a2 = ctx[jnp.maximum(w - 2, 0)]
    b2 = ctx[jnp.maximum(w - 1, 0)]
    prev = jnp.concatenate([ctx[:1], ctx[:-1]])          # prev[j] = ctx[j-1]
    match = (prev == a2) & (ctx == b2) & (j >= 1) & (j < w - 1) & (w >= 2)
    has = jnp.any(match)
    jm = jnp.argmax(jnp.where(match, j, -1))
    # a match near the tail (overlapping continuation — the self-similar
    # case) would read past the known region: clamp to the last KNOWN token
    # so e.g. a constant run drafts the constant, not unwritten zeros
    idx = jnp.clip(jm + 1 + jnp.arange(gamma), 0, jnp.maximum(w - 1, 0))
    rep = ctx[jnp.maximum(w - 1, 0)]
    return jnp.where(has, ctx[idx], rep)


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "gamma", "min_tokens",
                     "kv_int8", "sampler"),
)
def generate_speech_spec(
    params: Params,
    cfg: TokenLMConfig,
    prefix: Prefix,
    style_tokens: jnp.ndarray,      # [1, T_sty] (the lookup corpus seed)
    style_len: jnp.ndarray,         # [1]
    key: Optional[jax.Array] = None,   # required unless sampler.greedy
    *,
    max_new_tokens: int,
    gamma: int = 4,
    min_tokens: int = 2,
    kv_int8: bool = False,
    sampler: SamplerConfig = SamplerConfig(greedy=True),
) -> SpecGen:
    """Decode via prompt-lookup speculative verification, B=1.

    Each iteration drafts `gamma` tokens from the speech context (style
    prompt + generated so far), runs ONE (gamma+1)-position verify forward —
    roughly the cost of a single decode step at small gamma (the weight
    stream dominates; SURVEY decode analysis) — and commits the verified
    prefix plus one model-chosen token.

    GREEDY sampler (default): a draft is accepted iff it equals the model's
    own argmax; output matches generate_speech greedy exactly in every test,
    across random AND trained weights (tests/test_spec_decode.py) — drafting
    quality moves speed, never content. Honest caveat: exactness relies on
    XLA producing the same f32 logits from the (gamma+1)-position verify
    program as from the T=1 decode program — a top-2 logit tie within
    reduction-order rounding could flip one argmax (true of any speculative
    implementation whose verify kernel differs from its decode kernel);
    validated on the CPU mesh and the trained fixture, re-validate when
    enabling on TPU.

    SAMPLED: exact REJECTION sampling against the sampler's distribution p
    (Leviathan et al.; the prompt-lookup draft is a point mass, so accept
    draft d with probability p(d), and on rejection resample from p with d
    removed, renormalized) — each emitted token is marginally distributed
    exactly as the standard sampled path (tested distributionally), with
    different randomness consumption (not bitwise the same stream).

    Expected speedup = mean committed per verify; ROADMAP notes acceptance
    needs trained weights to be meaningful — measured on the trained demo
    fixture in the tests."""
    ccfg = core_config(cfg)
    B, P, D = prefix.embeds.shape
    assert B == 1, "speculative decode is the B=1 latency path"
    S_max = -(-(P + max_new_tokens + gamma + 2) // 8) * 8
    cache = core.make_cache(ccfg, B, S_max, quantized=kv_int8)
    slot = jnp.arange(S_max, dtype=jnp.int32)
    offset = (P - prefix.length).astype(jnp.int32)          # [1]

    pos = jnp.maximum(jnp.arange(P, dtype=jnp.int32)[None, :] - offset[:, None], 0)
    valid = slot[None, :] >= offset[:, None]
    pmask = causal_mask(P, S_max) & valid[:, None, None, :]
    out = core.forward(
        params, ccfg, inputs_embeds=prefix.embeds, positions=pos, mask=pmask,
        cache=cache, cache_start=jnp.int32(0), skip_logits=True,
        flash_offset=offset if core.flash_ok(P, ccfg.head_dim) else None,
    )
    head = params["speech_head"]
    eos, padt = cfg.speech_eos, cfg.speech_pad
    V = cfg.speech_vocab_size
    vj = jnp.arange(V)

    def masked(logits, n_before):
        """[Q, V] logits under the standard masking rules (padt / BOS always
        suppressed; EOS before min_tokens; n_before = committed count before
        this window's first position)."""
        q = jnp.arange(logits.shape[0])
        l = jnp.where((vj == padt) | (vj == cfg.speech_bos), -1e30, logits)
        sup = (n_before + q)[:, None] < min_tokens
        return jnp.where(sup & (vj == eos)[None, :], -1e30, l)

    if key is None:
        if not sampler.greedy:
            raise ValueError(
                "generate_speech_spec: a PRNG key is required with a "
                "non-greedy sampler (silently seeding would make every "
                "'sampled' run deterministic)"
            )
        key = jax.random.PRNGKey(0)            # unused under greedy

    first_logits = core.matmul_any(out.hidden[:, -1], head).astype(jnp.float32)
    ml0 = masked(first_logits, jnp.int32(0))
    if sampler.greedy:
        g0 = jnp.argmax(ml0, -1)[0].astype(jnp.int32)
    else:
        key, k0 = jax.random.split(key)
        g0 = sample(k0, ml0, sampler)[0]
    g0_eos = g0 == eos

    T_sty = style_tokens.shape[1]
    W_ctx = T_sty + max_new_tokens + gamma + 1
    ctx0 = jnp.zeros((W_ctx,), jnp.int32)
    ctx0 = jax.lax.dynamic_update_slice(ctx0, style_tokens[0], (0,))
    w0 = style_len[0].astype(jnp.int32)
    ctx0 = jnp.where(jnp.arange(W_ctx) == w0, g0, ctx0)
    W_tok = max_new_tokens + gamma + 1
    toks0 = jnp.full((W_tok,), padt, jnp.int32)
    toks0 = jnp.where(jnp.arange(W_tok) == 0, g0, toks0)   # eos kept, as in
    #                                                        the standard loop

    state0 = (
        out.cache, ctx0, w0 + jnp.where(g0_eos, 0, 1), toks0,
        jnp.where(g0_eos, jnp.int32(0), jnp.int32(1)),   # n_gen committed
        g0_eos,                                          # done
        g0,                                              # pending token
        jnp.int32(P),                                    # t_cache
        jnp.int32(0),                                    # n_verify
        key,
    )
    qj = jnp.arange(gamma + 1, dtype=jnp.int32)

    def step(s):
        cache, ctx, w, toks, n_gen, done, pending, t_cache, n_verify, key = s
        d = _lookup_draft(ctx, w, gamma)                    # [gamma]
        ids = jnp.concatenate([pending[None], d])           # [gamma+1]
        emb = params["speech_emb"][ids][None]               # [1, gamma+1, D]
        positions = (t_cache + qj - offset[0])[None, :]
        mask = (valid[:, None, None, :]
                & (slot[None, None, None, :] <= (t_cache + qj)[None, None, :, None]))
        o = core.forward(
            params, ccfg, inputs_embeds=emb, positions=positions, mask=mask,
            cache=cache, cache_start=t_cache, skip_logits=True,
        )
        logits = core.matmul_any(o.hidden[0], head).astype(jnp.float32)
        ml = masked(logits, n_gen)                          # [gamma+1, V]
        if sampler.greedy:
            # drafts accept while they match the model's own argmax
            g = jnp.argmax(ml, -1).astype(jnp.int32)
            acc = jnp.cumprod((d == g[:gamma]).astype(jnp.int32))
            a = jnp.sum(acc)                                # accepted drafts
            gvec = g
        else:
            # exact rejection sampling vs the sampler's categorical p: the
            # draft is a point mass, so accept d_i with prob p_i(d_i); on
            # the first rejection resample from p_a with d_a removed
            # (renormalized residual); full acceptance earns the bonus
            # token from p_gamma
            tl = transform_logits(ml, sampler)
            p = jax.nn.softmax(tl, axis=-1)
            key, ku, kb = jax.random.split(key, 3)
            u = jax.random.uniform(ku, (gamma,))
            p_d = jnp.take_along_axis(p[:gamma], d[:, None], axis=1)[:, 0]
            acc = jnp.cumprod((u < p_d).astype(jnp.int32))
            a = jnp.sum(acc)
            # residual in PROBABILITY space (p with the rejected draft
            # removed; a == gamma keeps full p — the bonus draw). If the
            # residual mass rounds to ~0 (p(d) ~ 1 yet u rejected), the
            # draft itself is the only sane emission — never resample from
            # an all-masked distribution.
            d_a = d[jnp.minimum(a, gamma - 1)]
            res = jnp.where((a < gamma) & (vj == d_a), 0.0, p[a])
            safe = jnp.sum(res) > 1e-9
            boundary = jnp.where(
                safe,
                jax.random.categorical(kb, jnp.log(res)).astype(jnp.int32),
                d_a,
            )
            dpad = jnp.concatenate([d, d[-1:]])
            gvec = jnp.where(qj < a, dpad, boundary)
        budget = jnp.int32(max_new_tokens) - n_gen
        ncommit = jnp.minimum(a + 1, budget)
        in_commit = qj < ncommit
        is_eos_j = (gvec == eos) & in_commit
        any_eos = jnp.any(is_eos_j)
        n_keep = jnp.where(any_eos, jnp.argmax(is_eos_j).astype(jnp.int32),
                           ncommit)
        # the standard loop leaves the EOS itself in the buffer at index
        # `length` (pad only after it) — keep bit-parity with that
        window = jnp.where(qj < n_keep + any_eos, gvec, padt)
        toks = jax.lax.dynamic_update_slice(toks, window, (n_gen,))
        ctx = jax.lax.dynamic_update_slice(
            ctx, jnp.where(qj < n_keep, gvec, 0), (w,))
        return (
            o.cache, ctx, w + n_keep, toks, n_gen + n_keep,
            done | any_eos, gvec[a], t_cache + a + 1, n_verify + 1, key,
        )

    def cond(s):
        _, _, _, _, n_gen, done, *_ = s
        return ~done & (n_gen < max_new_tokens)

    (_, _, _, toks, n_gen, _, _, _, n_verify, _) = jax.lax.while_loop(
        cond, step, state0
    )
    return SpecGen(
        tokens=toks[None, :max_new_tokens], lengths=n_gen[None],
        n_verify=n_verify, n_commit=n_gen,
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "gamma", "min_tokens",
                     "kv_int8", "pad_multiple", "sampler"),
)
def generate_speech_spec_from_ids(
    params: Params,
    cfg: TokenLMConfig,
    text: jnp.ndarray,
    text_len: jnp.ndarray,
    style_tokens: jnp.ndarray,
    style_len: jnp.ndarray,
    spk: jnp.ndarray,
    key: Optional[jax.Array] = None,
    *,
    max_new_tokens: int,
    gamma: int = 4,
    min_tokens: int = 2,
    kv_int8: bool = False,
    pad_multiple: int = 128,
    sampler: SamplerConfig = SamplerConfig(greedy=True),
) -> SpecGen:
    """Prefix assembly + prefill + speculative decode, ONE program
    (the from_ids convention — each extra submission costs a tunnel RTT)."""
    pre = build_prefix(params, cfg, text, text_len, style_tokens, style_len,
                       spk)
    pre = pad_prefix(pre, multiple=pad_multiple)
    return generate_speech_spec(
        params, cfg, pre, style_tokens, style_len, key,
        max_new_tokens=max_new_tokens, gamma=gamma, min_tokens=min_tokens,
        kv_int8=kv_int8, sampler=sampler,
    )


def _generate_fused(
    params: Params,
    decode_params,
    cfg: TokenLMConfig,
    ccfg: TransformerConfig,
    prefill_cache: Dict,
    next_logits: jnp.ndarray,
    key: jax.Array,
    *,
    P: int,
    max_new_tokens: int,
    offset: jnp.ndarray,
    sampler: SamplerConfig,
    min_tokens: int,
) -> SpeechGen:
    """Decode loop over the fused Pallas kernels (B=1). decode_params picks
    the flavor: a dict (mega_decode_params) runs ONE pallas_call per step —
    embedding lookup, RoPE rows, layers, final norm, speech head and
    top-k/Gumbel sampling all in-kernel, leaving only EOS bookkeeping in
    XLA; a list
    (unstack_decode_params) runs the per-layer attn_step/mlp_step pair with
    the XLA head/sampler (the parity reference)."""
    from ..ops.pallas_decode import attn_step, mega_decode_step, mlp_step

    L, hd = ccfg.n_layers, ccfg.head_dim
    eos, padt = cfg.speech_eos, cfg.speech_pad
    interp = jax.default_backend() == "cpu"
    mega = isinstance(decode_params, dict)
    # stacked [L, B, S, K, hd] prefill cache -> FLAT head-major [S, K*hd]
    # per layer (the kernels keep heads in the lane dim — Mosaic cannot
    # relayout [1, K*hd] <-> [K, hd] in-kernel)
    S_all = prefill_cache["k"].shape[2]
    cos_tab, sin_tab = rope_table(ccfg.max_seq_len, hd, ccfg.rope_theta)
    off0 = offset[0]
    dt = jnp.dtype(ccfg.dtype)

    def rope_rows(t_abs):
        pos = jnp.maximum(t_abs - off0, 0)
        cr, sr = cos_tab[pos], sin_tab[pos]
        # full-width rotate-half row, tiled across the K heads' lane groups
        cosf = jnp.tile(jnp.concatenate([cr, cr]), ccfg.n_kv_heads)[None, :]
        sinf = jnp.tile(jnp.concatenate([sr, sr]), ccfg.n_kv_heads)[None, :]
        return cosf, sinf

    def mask_logits(logits, i):
        logits = logits.at[:, padt].set(-1e30).at[:, cfg.speech_bos].set(-1e30)
        return jnp.where(
            (i < min_tokens) & (jnp.arange(logits.shape[-1]) == eos)[None, :],
            -1e30, logits,
        )

    if mega:
        k_all = prefill_cache["k"].reshape(L, S_all, -1)
        v_all = prefill_cache["v"].reshape(L, S_all, -1)
        key, sub, kseed = jax.random.split(key, 3)
        # token 0 comes from the prefill logits (XLA sampler, as before);
        # tokens 1.. are sampled inside the megakernel (Gumbel-max — same
        # distribution as the XLA categorical, different stream)
        tok0 = sample(sub, mask_logits(next_logits, 0), sampler)[0]
        seeds = jax.random.randint(
            kseed, (max_new_tokens,), 0, jnp.iinfo(jnp.int32).max, jnp.int32
        )
        toks0 = jnp.full((1, max_new_tokens), padt, jnp.int32)
        toks0 = toks0.at[0, 0].set(tok0)

        def step(carry):
            k_all, v_all, tok_prev, gen_len, i, toks = carry
            t_abs = (P + i - 1).astype(jnp.int32)   # cache slot of tok_prev
            suppress = (i < min_tokens).astype(jnp.int32)
            _, tok_out, k_all, v_all = mega_decode_step(
                tok_prev, decode_params, k_all, v_all,
                t_abs, off0, suppress, seeds[i],
                n_heads=ccfg.n_heads, head_dim=hd, eps=ccfg.norm_eps,
                vocab=cfg.speech_vocab_size, pad_id=padt,
                bos_id=cfg.speech_bos, eos_id=eos,
                greedy=sampler.greedy, temperature=sampler.temperature,
                top_k=sampler.top_k, interpret=interp,
            )
            tok_i = tok_out[0, 0]
            toks = jax.lax.dynamic_update_slice(toks, tok_i[None, None], (0, i))
            gen_len = gen_len + (tok_i != eos).astype(jnp.int32)
            return (k_all, v_all, tok_i, gen_len, i + 1, toks)

        def cond(carry):
            _, _, tok_prev, _, i, _ = carry
            return (i < max_new_tokens) & (tok_prev != eos)

        gen0 = (tok0 != eos).astype(jnp.int32)
        (_, _, _, gen_len, _, toks) = jax.lax.while_loop(
            cond, step, (k_all, v_all, tok0, gen0, jnp.int32(1), toks0)
        )
        return SpeechGen(tokens=toks, lengths=gen_len[None])

    caches = tuple(
        (
            prefill_cache["k"][l, 0].reshape(S_all, -1),
            prefill_cache["v"][l, 0].reshape(S_all, -1),
        )
        for l in range(L)
    )
    head = params["speech_head"]

    def step(carry):
        caches, cur_logits, gen_len, done, key, i, toks = carry
        key, sub = jax.random.split(key)
        tok = sample(sub, mask_logits(cur_logits, i), sampler)
        tok = jnp.where(done, padt, tok)
        is_eos = tok == eos
        gen_len = gen_len + (~done & ~is_eos)
        done = done | is_eos
        toks = jax.lax.dynamic_update_slice(toks, tok[:, None], (0, i))

        t_abs = (P + i).astype(jnp.int32)
        cosf, sinf = rope_rows(t_abs)
        h = params["speech_emb"][tok].astype(dt)              # [1, D]
        new_caches = []
        for l in range(L):
            lw = decode_params[l]
            h, kc, vc = attn_step(
                h, lw["attn_norm"], lw["wqkv"], lw["wo"], cosf, sinf,
                caches[l][0], caches[l][1], t_abs, off0,
                n_heads=ccfg.n_heads, head_dim=hd, eps=ccfg.norm_eps,
                interpret=interp,
            )
            h = mlp_step(
                h, lw["mlp_norm"], lw["w_gate_up"], lw["w_down"],
                eps=ccfg.norm_eps, interpret=interp,
            )
            new_caches.append((kc, vc))
        hf = core.rmsnorm(h, params["final_norm"], ccfg.norm_eps)
        nxt = core.matmul_any(hf.astype(dt), head).astype(jnp.float32)
        return (tuple(new_caches), nxt, gen_len, done, key, i + 1, toks)

    def cond(carry):
        *_, done, _, i, _ = carry
        return (i < max_new_tokens) & ~jnp.all(done)

    zeros = jnp.zeros((1,), jnp.int32)
    toks0 = jnp.full((1, max_new_tokens), padt, jnp.int32)
    (_, _, gen_len, done, _, _, toks) = jax.lax.while_loop(
        cond, step,
        (caches, next_logits, zeros, jnp.zeros((1,), bool), key,
         jnp.int32(0), toks0),
    )
    return SpeechGen(tokens=toks, lengths=gen_len)


# ----------------------------------------------------------------------- training


def lm_loss(
    params: Params,
    cfg: TokenLMConfig,
    prefix: Prefix,
    speech_targets: jnp.ndarray,   # [B, T_s] right-padded target speech tokens
    target_len: jnp.ndarray,       # [B]
    remat: bool = False,
) -> jnp.ndarray:
    """Teacher-forced next-token CE on the speech continuation. The prefix is
    LEFT-padded, targets are appended right after it: one forward over
    [prefix ++ targets ++ EOS]."""
    ccfg = core_config(cfg)
    B, P, D = prefix.embeds.shape
    T_s = speech_targets.shape[1]
    eos_col = jnp.full((B, 1), cfg.speech_eos, jnp.int32)
    tgt = jnp.concatenate([speech_targets, eos_col], axis=1)   # [B, T_s+1]
    # place EOS right after each row's real targets
    idx = jnp.arange(T_s + 1)[None, :]
    tgt = jnp.where(idx == target_len[:, None], cfg.speech_eos, tgt)
    tgt = jnp.where(idx > target_len[:, None], cfg.speech_pad, tgt)

    tgt_emb = params["speech_emb"][tgt]
    emb = jnp.concatenate([prefix.embeds, tgt_emb], axis=1)    # [B, P+T_s+1, D]
    T = emb.shape[1]
    offset = (P - prefix.length).astype(jnp.int32)
    pos = jnp.maximum(jnp.arange(T, dtype=jnp.int32)[None, :] - offset[:, None], 0)
    slotv = jnp.arange(T)[None, :] >= offset[:, None]
    mask = causal_mask(T, T) & slotv[:, None, None, :]
    out = core.forward(
        params, ccfg, inputs_embeds=emb, positions=pos, mask=mask,
        skip_logits=True, remat=remat,
    )
    # logits at positions P-1 .. P+T_s-1 predict tgt[0..T_s]
    h = out.hidden[:, P - 1 : P + T_s]
    logits = core.matmul_any(h, params["speech_head"]).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[:, :, None], axis=-1)[..., 0]
    w = (idx <= target_len[:, None]).astype(jnp.float32)       # include EOS step
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


# ----------------------------------------------------------------------- continuous batching


@partial(jax.jit, static_argnames=("cfg", "s_max", "kv_int8"))
def prefill_prefix(
    params: Params, cfg: TokenLMConfig, prefix: Prefix, *, s_max: int,
    kv_int8: bool = False,
):
    """Prefill one (or a batch of) prefix into a fresh [L, B, s_max, K, hd]
    cache. Returns (cache, next_logits [B, V] f32, offset [B]). The slot-
    admission half of the continuous-batching path (pipeline/continuous.py).
    kv_int8 stores the cache quantized (halves the per-step cache stream in
    decode_chunk — at B=8/S=552 the bf16 cache read ~matches the weight
    stream)."""
    ccfg = core_config(cfg)
    B, P, D = prefix.embeds.shape
    cache = core.make_cache(ccfg, B, s_max, quantized=kv_int8)
    slot = jnp.arange(s_max, dtype=jnp.int32)
    offset = (P - prefix.length).astype(jnp.int32)
    pos = jnp.maximum(jnp.arange(P, dtype=jnp.int32)[None, :] - offset[:, None], 0)
    valid = slot[None, :] >= offset[:, None]
    pmask = causal_mask(P, s_max) & valid[:, None, None, :]
    out = core.forward(
        params, ccfg, inputs_embeds=prefix.embeds, positions=pos, mask=pmask,
        cache=cache, cache_start=jnp.int32(0), skip_logits=True,
        flash_offset=offset if core.flash_ok(P, ccfg.head_dim) else None,
    )
    next_logits = core.matmul_any(
        out.hidden[:, -1], params["speech_head"]
    ).astype(jnp.float32)
    return out.cache, next_logits, offset


def _chunk_tick(cfg, sampler, min_tokens, S_eff, logits, t, done, steps, key):
    """One tick's sampling / EOS / bookkeeping — the contract SHARED
    of decode_chunk: mask pad+bos, gate EOS below min_tokens, sample,
    park finished rows on pad, retire at EOS or capacity.
    Returns (tok, done', steps', key')."""
    eos, padt = cfg.speech_eos, cfg.speech_pad
    V = logits.shape[1]
    key, sub = jax.random.split(key)
    lg = logits.at[:, padt].set(-1e30).at[:, cfg.speech_bos].set(-1e30)
    lg = jnp.where(
        (steps < min_tokens)[:, None] & (jnp.arange(V) == eos)[None, :],
        -1e30, lg,
    )
    tok = sample(sub, lg, sampler)
    tok = jnp.where(done, padt, tok)
    done = done | (tok == eos) | (t >= S_eff - 2)
    steps = steps + (tok != padt).astype(jnp.int32)
    return tok, done, steps, key


@partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "sampler", "min_tokens"),
    donate_argnames=("cache",),
)
def decode_chunk(
    params: Params,
    cfg: TokenLMConfig,
    cache: Dict,
    cur_logits: jnp.ndarray,    # [B, V] logits for each slot's NEXT token
    t: jnp.ndarray,             # [B] absolute cache slot the next token writes
    offset: jnp.ndarray,        # [B] left-pad per slot
    done: jnp.ndarray,          # [B] bool (idle/finished slots churn PAD)
    steps: jnp.ndarray,         # [B] tokens generated so far per slot
    key: jax.Array,
    *,
    n_steps: int,
    sampler: SamplerConfig = SamplerConfig(temperature=1.0, top_k=25),
    min_tokens: int = 2,
):
    """Advance EVERY slot by `n_steps` tokens in one program — the inner loop
    of iteration-level continuous batching. Each slot sits at its OWN decode
    position.

    Designed from a device profile (v5e, B=8, S=552): routing the cache
    through `core.forward`'s nested layer-scan cost 5.4 ms/step — ~54% of
    it buffer machinery (a whole-cache copy per outer scan step + per-layer
    copy-on-write updates + materialized per-layer slices), none of it
    weights (0.38 ms). So this loop is UNROLLED over layers with the main
    cache as a READ-ONLY input: static per-layer slices fuse straight into
    the attention reads, new KV rows go to small append buffers carried
    through the scan ([L, B, n_steps, K, hd]), attention merges the two
    segments with a joint softmax, and the append rows are folded into each
    row's home slots ONCE per chunk. Callers size the cache with `n_steps`
    spare slots (ContinuousBatcher.s_max) so capacity is preserved.
    Returns (cache, cur_logits, t, done, steps, tokens [B, n_steps])."""
    from ..ops.attention import NEG_INF, apply_rope, quantize_kv
    from ..ops.quant import QTensor

    ccfg = core_config(cfg)
    B, V = cur_logits.shape
    L, H, K, hd = (ccfg.n_layers, ccfg.n_heads, ccfg.n_kv_heads,
                   ccfg.head_dim)
    rep = H // K
    D = ccfg.dim
    S_tot = cache["k"].shape[2]
    S_eff = S_tot - n_steps            # last n_steps slots are spare
    head = params["speech_head"]
    lp = params["layers"]
    dt = jnp.dtype(ccfg.dtype)
    eps = ccfg.norm_eps
    cos_tab, sin_tab = rope_table(ccfg.max_seq_len, hd, ccfg.rope_theta)
    t0 = t                             # home fill level BEFORE this chunk
    quant = "k_scale" in cache         # int8 KV: values + per-row scales
    k_main = cache["k"]                # [L, B, S_tot, K, hd] — read-only
    v_main = cache["v"]
    ks_main = cache.get("k_scale")     # [L, B, S_tot, K] f32 (quant only)
    vs_main = cache.get("v_scale")
    slot = jnp.arange(S_tot, dtype=jnp.int32)
    main_valid = (
        (slot[None, :] >= offset[:, None]) & (slot[None, :] < t0[:, None])
    )                                  # [B, S_tot]; t0 < S_eff so spare=off
    app_idx = jnp.arange(n_steps, dtype=jnp.int32)

    def lw(w, l):
        return QTensor(q=w.q[l], s=w.s[l]) if isinstance(w, QTensor) else w[l]

    def attn_2seg(q, k_m, v_m, k_a, v_a, a_valid):
        """T=1 GQA attention over [main cache | this chunk's append rows],
        joint softmax, everything in the caches' NATIVE [B, S, K, hd]
        layout (no transposes/materialized f32 copies — the main segment
        streams exactly once)."""
        qf = q.astype(jnp.float32).reshape(B, 1, K, rep, hd) * hd ** -0.5
        lm = jnp.sum(qf * k_m.astype(jnp.float32)[:, :, :, None, :], -1)
        lm = jnp.where(main_valid[:, :, None, None], lm, NEG_INF)
        la = jnp.sum(qf * k_a.astype(jnp.float32)[:, :, :, None, :], -1)
        la = jnp.where(a_valid[None, :, None, None], la, NEG_INF)
        mx = jnp.maximum(jnp.max(lm, 1), jnp.max(la, 1))[:, None]
        pm = jnp.exp(lm - mx)
        pa = jnp.exp(la - mx)
        den = jnp.maximum(jnp.sum(pm, 1) + jnp.sum(pa, 1), 1e-30)
        num = (
            jnp.sum(pm[..., None] * v_m.astype(jnp.float32)[:, :, :, None, :], 1)
            + jnp.sum(pa[..., None] * v_a.astype(jnp.float32)[:, :, :, None, :], 1)
        )
        return (num / den[..., None]).reshape(B, H * hd)

    def attn_2seg_quant(q, k_m, ks_m, v_m, vs_m, k_a, ks_a, v_a, vs_a,
                        a_valid):
        """attn_2seg over an int8 cache: per-(position, head) scales are
        scalar across hd, so k's scale multiplies the finished dot and v's
        folds into the probabilities (ops/attention.sdpa_quant) — the dots
        stream int8, cache traffic halves."""
        qf = q.astype(jnp.float32).reshape(B, 1, K, rep, hd) * hd ** -0.5
        lm = jnp.sum(qf * k_m.astype(jnp.float32)[:, :, :, None, :], -1)
        lm = jnp.where(main_valid[:, :, None, None],
                       lm * ks_m[..., None], NEG_INF)
        la = jnp.sum(qf * k_a.astype(jnp.float32)[:, :, :, None, :], -1)
        la = jnp.where(a_valid[None, :, None, None],
                       la * ks_a[..., None], NEG_INF)
        mx = jnp.maximum(jnp.max(lm, 1), jnp.max(la, 1))[:, None]
        pm = jnp.exp(lm - mx)
        pa = jnp.exp(la - mx)
        den = jnp.maximum(jnp.sum(pm, 1) + jnp.sum(pa, 1), 1e-30)
        num = (
            jnp.sum((pm * vs_m[..., None])[..., None]
                    * v_m.astype(jnp.float32)[:, :, :, None, :], 1)
            + jnp.sum((pa * vs_a[..., None])[..., None]
                      * v_a.astype(jnp.float32)[:, :, :, None, :], 1)
        )
        return (num / den[..., None]).reshape(B, H * hd)

    def step(carry, i):
        app_k, app_v, app_ks, app_vs, logits, t, done, steps, key = carry
        tok, done, steps, key = _chunk_tick(
            cfg, sampler, min_tokens, S_eff, logits, t, done, steps, key
        )
        h = params["speech_emb"][tok].astype(dt)           # [B, D]
        pos = jnp.maximum(t - offset, 0)[:, None]          # [B, 1]
        a_valid = app_idx <= i                             # [n_steps]
        for l in range(L):
            x = core.rmsnorm(h, lp["attn_norm"][l], eps)
            qkv = core.matmul_any(x, lw(lp["wqkv"], l)).astype(dt)
            q, k_new, v_new = jnp.split(
                qkv, [H * hd, (H + K) * hd], axis=-1
            )
            q = apply_rope(q.reshape(B, 1, H, hd), cos_tab, sin_tab, pos)
            k_new = apply_rope(
                k_new.reshape(B, 1, K, hd), cos_tab, sin_tab, pos
            )
            v_new = v_new.reshape(B, 1, K, hd)
            if quant:
                # quantize at append time (same per-row formula as the
                # one-shot kv_int8 path) so in-chunk reads see the same
                # numerics as cache reads in the next chunk
                k8, ks1 = quantize_kv(k_new)
                v8, vs1 = quantize_kv(v_new)
                app_k = jax.lax.dynamic_update_slice(
                    app_k, k8[None], (l, 0, i, 0, 0))
                app_v = jax.lax.dynamic_update_slice(
                    app_v, v8[None], (l, 0, i, 0, 0))
                app_ks = jax.lax.dynamic_update_slice(
                    app_ks, ks1[None], (l, 0, i, 0))
                app_vs = jax.lax.dynamic_update_slice(
                    app_vs, vs1[None], (l, 0, i, 0))
                attn = attn_2seg_quant(
                    q, k_main[l], ks_main[l], v_main[l], vs_main[l],
                    app_k[l], app_ks[l], app_v[l], app_vs[l], a_valid,
                ).astype(dt)
            else:
                app_k = jax.lax.dynamic_update_slice(
                    app_k, k_new.astype(dt)[None], (l, 0, i, 0, 0)
                )
                app_v = jax.lax.dynamic_update_slice(
                    app_v, v_new.astype(dt)[None], (l, 0, i, 0, 0)
                )
                attn = attn_2seg(
                    q, k_main[l], v_main[l], app_k[l], app_v[l], a_valid
                ).astype(dt)
            h = h + core.matmul_any(attn, lw(lp["wo"], l)).astype(dt)
            x = core.rmsnorm(h, lp["mlp_norm"][l], eps)
            gu = core.matmul_any(x, lw(lp["w_gate_up"], l))
            g, u = jnp.split(gu, 2, axis=-1)
            dn = core.matmul_any(
                (jax.nn.silu(g) * u).astype(dt), lw(lp["w_down"], l)
            )
            h = h + dn.astype(dt)
        hn = core.rmsnorm(h, params["final_norm"], eps)
        nxt = core.matmul_any(hn.astype(dt), head).astype(jnp.float32)
        t = jnp.minimum(t + 1, S_eff - 1)
        return (app_k, app_v, app_ks, app_vs, nxt, t, done, steps, key), tok

    a_dt = jnp.int8 if quant else dt
    app_k0 = jnp.zeros((L, B, n_steps, K, hd), a_dt)
    app_v0 = jnp.zeros((L, B, n_steps, K, hd), a_dt)
    app_ks0 = jnp.zeros((L, B, n_steps, K), jnp.float32)
    app_vs0 = jnp.zeros((L, B, n_steps, K), jnp.float32)
    (app_k, app_v, app_ks, app_vs, cur_logits, t, done, steps, _), toks = \
        jax.lax.scan(
            step,
            (app_k0, app_v0, app_ks0, app_vs0, cur_logits, t, done, steps,
             key),
            jnp.arange(n_steps),
        )

    def fold(main, app):
        # ONE per-row scatter per chunk: append rows -> home slots at t0_b.
        # DUS clamps starts in-bounds; rows near capacity are done already.
        nz = main.ndim - 3              # trailing zero index dims after S
        one = lambda mb, ab, s0: jax.lax.dynamic_update_slice(
            mb, ab.astype(mb.dtype), (0, s0) + (0,) * nz
        )
        return jax.vmap(one, in_axes=(1, 1, 0), out_axes=1)(main, app, t0)

    cache = {"k": fold(k_main, app_k), "v": fold(v_main, app_v)}
    if quant:
        cache["k_scale"] = fold(ks_main, app_ks)
        cache["v_scale"] = fold(vs_main, app_vs)
    return cache, cur_logits, t, done, steps, toks.T

