"""Shared decoder-only transformer core (functional, layer-stacked, scanned).

One implementation backs BOTH model stacks the reference glued together
(SURVEY §7 deliberate divergence "one shared transformer core"):
- the style-embedder LLM (Llama-3.2-3B / Qwen2.5-7B geometries; reference used
  HF transformers + PEFT, milvus/RAG.py:68-111), and
- the ~300M speech-token LM inside the synthesis engine (SURVEY §2.3.1).

TPU-first choices:
- Params are LAYER-STACKED pytrees ([L, ...] leading dim) consumed by one
  ``lax.scan`` over layers: one compiled layer body regardless of depth,
  so a 28-layer 3B model compiles as fast as a 2-layer toy.
- GQA attention (n_kv_heads <= n_heads) with RoPE; bf16 compute, f32 accum
  (``preferred_element_type``), f32 logits.
- KV cache is a single stacked [L, B, S_max, K, hd] buffer, updated in-place
  under jit via dynamic_update_slice (buffer donation at the call site).
- Autoregressive decode is a ``lax.scan`` over steps — the entire generate
  loop is ONE XLA program; no host round-trips per token (the reference paid
  a Python->CUDA sync every HF generate step).
- LoRA (r, alpha from TrainConfig; reference protocol src/ft_llm.py:254-261)
  enters as an optional parallel pytree of stacked (A, B) pairs — base params
  stay frozen, so optax only ever sees the LoRA leaves during SFT.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import apply_rope, rope_table, sdpa
from ..ops.quant import Q4Tensor, QTensor, q4matmul
from ..ops.sampling import SamplerConfig, sample
from ..utils.config import TransformerConfig

Params = Dict[str, Any]


# =============================================================================== init


def _dense_init(key, fan_in: int, shape) -> jnp.ndarray:
    std = 1.0 / math.sqrt(fan_in)
    return jax.random.truncated_normal(key, -3, 3, shape, jnp.float32) * std


def init_params(key: jax.Array, cfg: TransformerConfig) -> Params:
    """Layer-stacked param pytree. Names drive the TP sharding rules
    (parallel/sharding.py): wqkv/w_gate_up column-, wo/w_down row-parallel.

    QKV and gate/up are FUSED single matmuls (wqkv [L, D, (H+2K)*hd],
    w_gate_up [L, D, 2F]) — 5 projections per layer instead of 7; at B=1
    decode the per-step cost is launch/bandwidth-bound, so fewer, larger
    matmuls win. Head-sharding stays clean because q|k|v and gate|up are
    contiguous column groups."""
    keys = jax.random.split(key, 12)
    L, D, F = cfg.n_layers, cfg.dim, cfg.ffn_dim
    H, K, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    p: Params = {
        "tok_emb": _dense_init(keys[0], D, (cfg.vocab_size, D)),
        "layers": {
            "attn_norm": jnp.ones((L, D), jnp.float32),
            "wqkv": _dense_init(keys[1], D, (L, D, (H + 2 * K) * hd)),
            "wo": _dense_init(keys[4], H * hd, (L, H * hd, D)),
            "mlp_norm": jnp.ones((L, D), jnp.float32),
            "w_gate_up": _dense_init(keys[5], D, (L, D, 2 * F)),
            "w_down": _dense_init(keys[7], F, (L, F, D)),
        },
        "final_norm": jnp.ones((D,), jnp.float32),
    }
    if not cfg.tie_embeddings:
        p["lm_head"] = _dense_init(keys[8], D, (D, cfg.vocab_size))
    return p


def init_params_quantized(
    key: jax.Array, cfg: TransformerConfig, bits: int = 8
) -> Params:
    """Init + weight-only-quantize without ever holding the f32 tree.

    `quantize_tree(init_params(key))` under ONE jit leaves the peak HBM to
    XLA's scheduling: at 3B geometry the f32 projection stacks alone are
    ~17 GB, so whether the program fits a 16 GB chip depends on whether the
    scheduler frees each stack before materializing the next (observed to
    fail intermittently: compile-time HBM OOM or runtime RESOURCE_EXHAUSTED
    on the same program across runs). This builder bounds the transient
    instead: each projection stack is drawn and quantized layer-at-a-time
    under `lax.map`, so the live f32 temp is one layer (<0.3 GB even at 7B);
    the embedding/lm_head (kept f32 / quantized respectively, exactly like
    quantize_tree's name rules) get their own small programs.

    Returns the same pytree structure/shapes/dtypes as
    `quantize_tree(init_params(key, cfg), bits=bits)` — values differ only
    in how the RNG is split per layer."""
    from ..ops.quant import Q4Tensor, QTensor, quantize, quantize4

    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    qfn = quantize if bits == 8 else quantize4
    qcls = QTensor if bits == 8 else Q4Tensor
    keys = jax.random.split(key, 12)
    L, D, F = cfg.n_layers, cfg.dim, cfg.ffn_dim
    H, K, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    def stack(k, fan_in: int, out_dim: int):
        def build(kk):
            def one(ki):
                return tuple(qfn(_dense_init(ki, fan_in, (fan_in, out_dim))))

            return jax.lax.map(one, jax.random.split(kk, L))

        return qcls(*jax.block_until_ready(jax.jit(build)(k)))

    p: Params = {
        "tok_emb": jax.block_until_ready(
            jax.jit(lambda k: _dense_init(k, D, (cfg.vocab_size, D)))(keys[0])
        ),
        "layers": {
            "attn_norm": jnp.ones((L, D), jnp.float32),
            "wqkv": stack(keys[1], D, (H + 2 * K) * hd),
            "wo": stack(keys[4], H * hd, D),
            "mlp_norm": jnp.ones((L, D), jnp.float32),
            "w_gate_up": stack(keys[5], D, 2 * F),
            "w_down": stack(keys[7], F, D),
        },
        "final_norm": jnp.ones((D,), jnp.float32),
    }
    if not cfg.tie_embeddings:
        p["lm_head"] = qcls(*jax.block_until_ready(
            jax.jit(lambda k: tuple(qfn(_dense_init(k, D, (D, cfg.vocab_size)))))(
                keys[8]
            )
        ))
    return p


def init_lora(key: jax.Array, cfg: TransformerConfig, r: int) -> Params:
    """Stacked LoRA (A, B) for every projection ('all-linear' per the
    reference protocol, src/ft_llm.py:254-261). B starts at zero so the
    adapted model initially equals the base model."""
    keys = jax.random.split(key, 7)
    L, D, F = cfg.n_layers, cfg.dim, cfg.ffn_dim
    H, K, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    def ab(k, fan_in, out):
        return (
            _dense_init(k, fan_in, (L, fan_in, r)),
            jnp.zeros((L, r, out), jnp.float32),
        )

    names_shapes = {
        "wqkv": (D, (H + 2 * K) * hd),
        "wo": (H * hd, D),
        "w_gate_up": (D, 2 * F),
        "w_down": (F, D),
    }
    lora: Params = {"layers": {}}
    for i, (name, (fi, fo)) in enumerate(names_shapes.items()):
        a, b = ab(keys[i], fi, fo)
        lora["layers"][name + "_lora_a"] = a
        lora["layers"][name + "_lora_b"] = b
    return lora


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


# =============================================================================== building blocks


def rmsnorm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    nrm = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (nrm * w).astype(x.dtype)


def matmul_any(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w -> f32, where w is a dense array, an int8 QTensor, or a packed
    int4 Q4Tensor (scales commute with the contraction, so the MXU sees a
    plain matmul either way)."""
    if isinstance(w, QTensor):
        y = jnp.matmul(x, w.q.astype(x.dtype), preferred_element_type=jnp.float32)
        return y * w.s.astype(jnp.float32)
    if isinstance(w, Q4Tensor):
        return q4matmul(x, w).astype(jnp.float32)
    return jnp.matmul(x, w.astype(x.dtype), preferred_element_type=jnp.float32)


def _proj(x, w, lora_a=None, lora_b=None, scale: float = 0.0):
    y = matmul_any(x, w)
    if lora_a is not None:
        ax = jnp.matmul(x, lora_a.astype(x.dtype), preferred_element_type=jnp.float32)
        y = y + scale * jnp.matmul(
            ax.astype(x.dtype), lora_b.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
    return y.astype(x.dtype)


# Per-layer KV cache slice inside the scan: {"k","v"} ([B, S_max, K, hd]),
# plus {"k_scale","v_scale"} ([B, S_max, K] f32) when int8-quantized.
LayerCache = Dict[str, jnp.ndarray]


def _layer(
    h: jnp.ndarray,                 # [B, T, D]
    lp: Params,                     # this layer's (unstacked) params
    lora: Optional[Params],
    lora_scale: float,
    cfg: TransformerConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    positions: jnp.ndarray,         # [B, T]
    mask: jnp.ndarray,              # [B, 1, T, S]
    cache: Optional[LayerCache],
    cache_start: Optional[jnp.ndarray],
    flash_offset: Optional[jnp.ndarray] = None,  # [B] -> use pallas flash
) -> Tuple[jnp.ndarray, Optional[LayerCache]]:
    B, T, D = h.shape
    H, K, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    def g(name):
        if lora is None:
            return (None, None)
        return (lora[name + "_lora_a"], lora[name + "_lora_b"])

    x = rmsnorm(h, lp["attn_norm"], cfg.norm_eps)
    qkv = _proj(x, lp["wqkv"], *g("wqkv"), lora_scale)
    if "bqkv" in lp:  # Qwen2-family attention bias
        qkv = qkv + lp["bqkv"].astype(qkv.dtype)
    q, k, v = jnp.split(qkv, [H * hd, (H + K) * hd], axis=-1)
    q = q.reshape(B, T, H, hd)
    k = k.reshape(B, T, K, hd)
    v = v.reshape(B, T, K, hd)
    q = apply_rope(q, cos, sin, positions)
    k = apply_rope(k, cos, sin, positions)

    new_cache = None
    quant_cache = cache is not None and "k_scale" in cache
    if quant_cache:
        # int8 KV cache: quantize the new keys/values per (position, head)
        # and store values + scales; attention dequantizes on the fly
        # (ops/attention.sdpa_quant — the dots read int8 from HBM)
        from ..ops.attention import quantize_kv, sdpa_quant

        kqn, ksn = quantize_kv(k)
        vqn, vsn = quantize_kv(v)
        upd = lambda buf, val, idx: jax.lax.dynamic_update_slice(buf, val, idx)
        new_cache = {
            "k": upd(cache["k"], kqn, (0, cache_start, 0, 0)),
            "v": upd(cache["v"], vqn, (0, cache_start, 0, 0)),
            "k_scale": upd(cache["k_scale"], ksn, (0, cache_start, 0)),
            "v_scale": upd(cache["v_scale"], vsn, (0, cache_start, 0)),
        }
    elif cache is not None:
        if getattr(cache_start, "ndim", 0) == 1:
            # per-ROW write positions (continuous batching: each slot is at
            # its own decode step). A vmapped dynamic_update_slice lowers to
            # a TPU scatter that serializes (~5.6 ms/step at B=8 measured on
            # v5e); a masked whole-cache select is a pure bandwidth rewrite
            # (~0.3 ms for the same cache) and XLA aliases it in the scan.
            assert T == 1, "per-row cache writes are decode-only (T == 1)"
            s_slot = jax.lax.broadcasted_iota(
                jnp.int32, cache["k"].shape, 1
            )                                     # [B, S, K, hd] slot ids
            at = cache_start[:, None, None, None]
            ck = jnp.where(
                s_slot == at, k.astype(cache["k"].dtype), cache["k"]
            )
            cv = jnp.where(
                s_slot == at, v.astype(cache["v"].dtype), cache["v"]
            )
        else:
            ck = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, cache_start, 0, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, cache_start, 0, 0)
            )
        new_cache = {"k": ck, "v": cv}
        k_att, v_att = ck, cv
    else:
        k_att, v_att = k, v

    if flash_offset is not None:
        # Pallas flash path (prefill): self-attention over the T new keys is
        # equivalent to attending the cache at cache_start=0 under the causal
        # + left-pad mask; the cache is still updated above for decode.
        from ..ops.pallas_attn import flash_attention

        attn = flash_attention(
            q, k, v, flash_offset,
            interpret=jax.default_backend() == "cpu",
        ).reshape(B, T, H * hd)
    elif quant_cache:
        attn = sdpa_quant(
            q, new_cache["k"], new_cache["k_scale"],
            new_cache["v"], new_cache["v_scale"], mask,
        ).reshape(B, T, H * hd)
    else:
        attn = sdpa(q, k_att, v_att, mask).reshape(B, T, H * hd)
    h = h + _proj(attn, lp["wo"], *g("wo"), lora_scale)

    x = rmsnorm(h, lp["mlp_norm"], cfg.norm_eps)
    gate_up = _proj(x, lp["w_gate_up"], *g("w_gate_up"), lora_scale)
    gate, up = jnp.split(gate_up, 2, axis=-1)
    h = h + _proj(jax.nn.silu(gate) * up, lp["w_down"], *g("w_down"), lora_scale)
    return h, new_cache


# =============================================================================== forward


class ForwardResult(NamedTuple):
    logits: Optional[jnp.ndarray]     # [B, T, V] f32 (None if skip_logits)
    hidden: jnp.ndarray               # [B, T, D] final-norm hidden states
    cache: Optional[Dict[str, jnp.ndarray]]


def make_cache(
    cfg: TransformerConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
    quantized: bool = False,
) -> Dict[str, jnp.ndarray]:
    shape = (cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim)
    if quantized:
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(shape[:-1], jnp.float32),
            "v_scale": jnp.zeros(shape[:-1], jnp.float32),
        }
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def forward(
    params: Params,
    cfg: TransformerConfig,
    tokens: Optional[jnp.ndarray] = None,    # [B, T] int32
    *,
    inputs_embeds: Optional[jnp.ndarray] = None,  # [B, T, D] (instead of tokens)
    positions: Optional[jnp.ndarray] = None,      # [B, T]
    mask: Optional[jnp.ndarray] = None,           # [B, 1, T, S] True=attend
    cache: Optional[Dict[str, jnp.ndarray]] = None,
    cache_start: Optional[jnp.ndarray] = None,    # scalar int32 write offset
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    remat: bool = False,
    skip_logits: bool = False,
    flash_offset: Optional[jnp.ndarray] = None,
) -> ForwardResult:
    """Full-sequence (prefill/training) or incremental (decode) forward.

    With `cache`: keys/values are written at [cache_start, cache_start+T) and
    attention runs against the whole cache buffer — `mask` must cover S_max.
    Without: self-attention over the T provided tokens only.
    """
    compute_dtype = jnp.dtype(cfg.dtype)
    if inputs_embeds is None:
        h = params["tok_emb"][tokens].astype(compute_dtype)
    else:
        h = inputs_embeds.astype(compute_dtype)
    B, T = h.shape[:2]
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    if mask is None:
        from ..ops.attention import causal_mask

        mask = jnp.broadcast_to(causal_mask(T, T), (B, 1, T, T))

    cos, sin = rope_table(cfg.max_seq_len, cfg.head_dim, cfg.rope_theta)

    stacked = params["layers"]
    lora_stacked = lora["layers"] if lora is not None else None

    def body(h, xs):
        lp, lo, lc = xs
        fn = _layer
        if remat:
            fn = jax.checkpoint(_layer, static_argnums=(4,))
        h, out_cache = fn(
            h, lp, lo, lora_scale, cfg, cos, sin, positions, mask,
            lc, cache_start, flash_offset,
        )
        return h, out_cache

    xs = (
        stacked,
        lora_stacked,
        cache,
    )
    # lax.scan needs every xs leaf to have the same leading dim; lora/cache may
    # be None — wrap in a custom scan over index instead when absent.
    if lora_stacked is None and cache is None:
        h, _ = jax.lax.scan(lambda c, lp: body(c, (lp, None, None)), h, stacked)
        new_cache = None
    elif cache is None:
        h, _ = jax.lax.scan(
            lambda c, xs_: body(c, (xs_[0], xs_[1], None)), h, (stacked, lora_stacked)
        )
        new_cache = None
    elif lora_stacked is None:
        h, new_cache = jax.lax.scan(
            lambda c, xs_: body(c, (xs_[0], None, xs_[1])), h, (stacked, cache)
        )
    else:
        h, new_cache = jax.lax.scan(body, h, xs)

    h = rmsnorm(h, params["final_norm"], cfg.norm_eps)
    logits = None
    if not skip_logits:
        w_out = params["lm_head"] if "lm_head" in params else params["tok_emb"].T
        logits = matmul_any(h.astype(compute_dtype), w_out)
    return ForwardResult(logits=logits, hidden=h, cache=new_cache)


# =============================================================================== embeddings


def mean_pool_hidden(hidden: jnp.ndarray, attn_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean-pool final hidden states over real tokens -> [B, D] f32.
    Reference semantics: last_hidden_state * mask, sum / count
    (milvus/RAG.py:139-140)."""
    m = attn_mask[..., None].astype(jnp.float32)
    s = jnp.sum(hidden.astype(jnp.float32) * m, axis=1)
    return s / jnp.maximum(jnp.sum(m, axis=1), 1.0)


def embed_text(
    params: Params, cfg: TransformerConfig, tokens: jnp.ndarray,
    attn_mask: jnp.ndarray, lora: Optional[Params] = None, lora_scale: float = 0.0,
    prefix_mask: bool = True,
) -> jnp.ndarray:
    """[B, T] padded tokens -> [B, D] mean-pooled embedding (no logits).

    With ``prefix_mask`` (the RIGHT-padded batches every caller builds —
    reference semantics, milvus/RAG.py:129-140) real tokens form a causal
    prefix, so plain causal attention is exact on real rows and the Pallas
    flash kernel runs the prefill without materializing [B, H, T, S] scores
    (pad-row outputs are garbage but mean_pool masks them out). Pass
    ``prefix_mask=False`` for an arbitrary attention mask."""
    B, T = tokens.shape
    from ..ops.attention import causal_mask

    if prefix_mask and flash_ok(T, cfg.head_dim):
        out = forward(
            params, cfg, tokens, lora=lora, lora_scale=lora_scale,
            skip_logits=True, flash_offset=jnp.zeros((B,), jnp.int32),
        )
    else:
        mask = causal_mask(T, T) & attn_mask[:, None, None, :].astype(bool)
        out = forward(
            params, cfg, tokens, mask=mask, lora=lora, lora_scale=lora_scale,
            skip_logits=True,
        )
    return mean_pool_hidden(out.hidden, attn_mask)


# =============================================================================== generate


def flash_ok(t: int, head_dim: int) -> bool:
    """Use the Pallas flash-attention prefill path? TPU only (interpret-free),
    block-aligned T, production-sized heads. ASTTTS_FLASH=0 disables — read at
    TRACE time, so set it before the process compiles its shape buckets (an
    already-compiled bucket keeps whichever path it was traced with)."""
    import os

    if os.environ.get("ASTTTS_FLASH", "1") == "0":
        return False
    if jax.default_backend() == "cpu":
        return False
    return t >= 128 and t % 128 == 0 and head_dim >= 64


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray       # [B, max_new] int32 (pad_id after EOS)
    lengths: jnp.ndarray      # [B] number of real tokens generated (excl. EOS)
    cache: Dict[str, jnp.ndarray]


def left_pad(seqs, pad_id: int, width: Optional[int] = None):
    """Host helper: list of 1-D int arrays -> ([B, P] left-padded int32,
    [B] lengths). Left padding keeps every row flush against the decode
    slots so prefill+decode share one cache layout."""
    import numpy as np

    lens = [len(s) for s in seqs]
    P = width or max(lens)
    out = np.full((len(seqs), P), pad_id, np.int32)
    for i, s in enumerate(seqs):
        out[i, P - len(s):] = np.asarray(s, np.int32)
    return out, np.asarray(lens, np.int32)


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "sampler", "eos_id", "pad_id"),
    donate_argnames=("cache",),
)
def generate(
    params: Params,
    cfg: TransformerConfig,
    prompt: jnp.ndarray,          # [B, P] LEFT-padded prompts (see left_pad)
    prompt_len: jnp.ndarray,      # [B] real lengths
    cache: Dict[str, jnp.ndarray],
    key: jax.Array,
    *,
    max_new_tokens: int,
    sampler: SamplerConfig,
    eos_id: int,
    pad_id: int = 0,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
) -> GenerateResult:
    """Prefill + scan-decode in ONE jitted program.

    Replaces HF model.generate (reference biography/emotion calls,
    milvus/RAG.py:176-184, :219-227) and the CosyVoice token-LM inner loop.
    Left-padded batch: row b's prompt occupies slots [P-len_b, P), decode step
    i writes slot P+i for every row, RoPE position of slot s is
    s - (P - len_b). Per-row EOS -> pad_id. Static shapes throughout;
    recompiles only per (P, max_new_tokens) bucket.
    """
    B, P = prompt.shape
    S_max = cache["k"].shape[2]
    slot = jnp.arange(S_max, dtype=jnp.int32)
    offset = (P - prompt_len).astype(jnp.int32)          # [B] left-pad amount

    # ---- prefill
    from ..ops.attention import causal_mask

    pos = jnp.maximum(jnp.arange(P, dtype=jnp.int32)[None, :] - offset[:, None], 0)
    valid = slot[None, :] >= offset[:, None]             # [B, S_max] non-pad slots
    pmask = causal_mask(P, S_max) & valid[:, None, None, :]
    out = forward(
        params, cfg, prompt, positions=pos, mask=pmask, cache=cache,
        cache_start=jnp.int32(0), lora=lora, lora_scale=lora_scale,
        flash_offset=offset if flash_ok(P, cfg.head_dim) else None,
        skip_logits=True,  # full [B, P, V] prefill logits would be ~0.5 GB/row
    )
    w_out = params["lm_head"] if "lm_head" in params else params["tok_emb"].T
    # all rows end at slot P-1 (left padding)
    next_logits = matmul_any(out.hidden[:, -1].astype(jnp.dtype(cfg.dtype)), w_out)

    def step(carry, i):
        cache, cur_logits, gen_len, done, key = carry
        key, sub = jax.random.split(key)
        tok = sample(sub, cur_logits, sampler)           # [B]
        tok = jnp.where(done, pad_id, tok)
        is_eos = tok == eos_id
        gen_len = gen_len + (~done & ~is_eos)
        done = done | is_eos
        positions = (P + i - offset)[:, None]            # true per-row position
        smask = (valid & (slot[None, :] <= P + i))[:, None, None, :]
        out = forward(
            params, cfg, tok[:, None], positions=positions, mask=smask,
            cache=cache, cache_start=P + i, lora=lora, lora_scale=lora_scale,
        )
        return (out.cache, out.logits[:, 0], gen_len, done, key), tok

    zeros = jnp.zeros((B,), jnp.int32)
    (cache, _, gen_len, done, _), toks = jax.lax.scan(
        step,
        (out.cache, next_logits, zeros, jnp.zeros((B,), bool), key),
        jnp.arange(max_new_tokens),
    )
    return GenerateResult(tokens=toks.T, lengths=gen_len, cache=cache)
