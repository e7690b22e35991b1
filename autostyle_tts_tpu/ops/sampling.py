"""On-device token samplers: greedy, temperature, top-k, top-p (nucleus).

Replaces HF generate's sampling configs used by the reference —
biography: do_sample T=0.7 top_p=0.9 (milvus/RAG.py:176-184); emotion: greedy
(RAG.py:219-227); speech-token LM sampling inside CosyVoice. All samplers are
shape-static and fuse into the lax.scan decode loop (no host round-trips).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclass(frozen=True)
class SamplerConfig:
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0          # 0 = disabled
    greedy: bool = False
    # nucleus candidate cap: sort only the top-`top_p_cap` logits instead of
    # the whole vocab (a full 128k sort costs ~1 ms/step at Llama-3 vocab).
    # EXACT whenever the nucleus fits in the cap (probabilities are still
    # normalized over the full vocab); a flatter-than-cap distribution is
    # truncated to the top-cap candidates. 0 = exact full-vocab sort.
    top_p_cap: int = 256

    @classmethod
    def biography(cls) -> "SamplerConfig":
        return cls(temperature=0.7, top_p=0.9)

    @classmethod
    def label(cls) -> "SamplerConfig":
        return cls(greedy=True)


def _apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    vals, _ = jax.lax.top_k(logits, k)
    thresh = vals[..., -1:]
    return jnp.where(logits < thresh, NEG_INF, logits)


def _top_p_full(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob (exclusive) < p; always keep top-1
    keep_sorted = (cum - probs) < p
    # threshold = smallest kept logit
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < thresh, NEG_INF, logits)


def _apply_top_p(logits: jnp.ndarray, p: float, cap: int = 0) -> jnp.ndarray:
    """Mask tokens outside the smallest set with cumulative prob >= p — EXACT.

    With ``cap`` (and vocab > cap): only the top-``cap`` logits are sorted
    (lax.top_k returns them ordered) while probabilities stay normalized by
    a logsumexp over the FULL vocab. When any row's nucleus needs more than
    ``cap`` tokens (its top-cap mass < p — fat tails, e.g. a 128k-vocab
    embedder at T=0.7/p=0.9 early in training, r4 VERDICT #9) the whole
    call falls back to the full-vocab sort via lax.cond, so the law is
    ALWAYS the exact nucleus distribution; the cap is purely a fast path
    (a full 128k sort costs ~1 ms/step; the capped path ~none)."""
    if cap and logits.shape[-1] > cap:
        vals, _ = jax.lax.top_k(logits, cap)            # sorted descending
        z = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        probs = jnp.exp(vals - z)
        cum = jnp.cumsum(probs, axis=-1)
        overflow = jnp.any(cum[..., -1] < p)            # nucleus wider than cap

        def capped(lg):
            keep_sorted = (cum - probs) < p             # always keeps top-1
            thresh = jnp.min(
                jnp.where(keep_sorted, vals, jnp.inf), axis=-1, keepdims=True
            )
            return jnp.where(lg < thresh, NEG_INF, lg)

        return jax.lax.cond(overflow, lambda lg: _top_p_full(lg, p),
                            capped, logits)
    return _top_p_full(logits, p)


def transform_logits(logits: jnp.ndarray, cfg: SamplerConfig) -> jnp.ndarray:
    """Apply the sampler's temperature/top-k/top-p transforms; the final
    token law is categorical(softmax(result)). Factored out so rejection
    sampling (speculative decode) can reuse the exact distribution."""
    logits = logits / jnp.maximum(cfg.temperature, 1e-6)
    if cfg.top_k and cfg.top_k > 0:
        logits = _apply_top_k(logits, cfg.top_k)
    if cfg.top_p < 1.0:
        logits = _apply_top_p(logits, cfg.top_p, cap=cfg.top_p_cap)
    return logits


def sample(
    key: jax.Array, logits: jnp.ndarray, cfg: SamplerConfig
) -> jnp.ndarray:
    """logits [..., V] -> token ids [...] (int32)."""
    if cfg.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(
        key, transform_logits(logits, cfg), axis=-1
    ).astype(jnp.int32)
