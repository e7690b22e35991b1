"""Conditional flow-matching mel decoder (OT-CFM, Matcha-TTS-class stage).

Replaces the Matcha-TTS flow-matching U-Net decoder the reference's engine
used via third_party/Matcha-TTS (SURVEY §2.3.1 "Flow-matching mel decoder";
PYTHONPATH hack tts_with_rag.py:18-19). TPU-first redesign: a DiT-style
*transformer* vector-field estimator (adaLN-zero time conditioning) instead of
a conv U-Net — attention/matmul blocks tile onto the MXU far better than
narrow dilated convs, and one layer-stacked lax.scan body keeps compiles
fast. The ODE sampler is a FIXED-STEP Euler loop (n_steps static) fully
inside one jit — the whole mel decode is a single XLA program, optionally
with classifier-free guidance.

Conditioning (the `inference_tts_with_st` contract, SURVEY §7 hard part 2):
- speech tokens (style prosody) -> embedding, upsampled 25 Hz -> 50 Hz frames
- speaker embedding (timbre identity) -> FiLM-added globally
- prompt mel (timbre fine detail): first `prompt_len` frames are given and
  held fixed; the flow in-paints the continuation.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.attention import sdpa
from ..utils.config import CFMConfig

Params = Dict


def _dense(key, fan_in, shape, scale=1.0):
    return jax.random.normal(key, shape) * (scale / math.sqrt(fan_in))


def init_params(key: jax.Array, cfg: CFMConfig) -> Params:
    D, M, F = cfg.dim, cfg.n_mels, cfg.ffn_dim
    L = cfg.n_layers
    keys = jax.random.split(key, 16)
    p: Params = {
        "in_proj": _dense(keys[0], 2 * M + 1, (2 * M + 1, D)),
        "tok_emb": _dense(keys[1], D, (cfg.token_vocab_size, D)),
        "spk_proj": _dense(keys[2], cfg.spk_dim, (cfg.spk_dim, D)),
        "t_proj1": _dense(keys[3], 256, (256, D)),
        "t_proj2": _dense(keys[4], D, (D, D)),
        "layers": {
            # adaLN-zero: per-layer modulation from the time embedding
            "mod": jnp.zeros((L, D, 6 * D)),
            "wq": _dense(keys[5], D, (L, D, D)),
            "wk": _dense(keys[6], D, (L, D, D)),
            "wv": _dense(keys[7], D, (L, D, D)),
            "wo": _dense(keys[8], D, (L, D, D)),
            "w_up": _dense(keys[9], D, (L, D, F)),
            "w_down": _dense(keys[10], F, (L, F, D)),
        },
        "out_norm_scale": jnp.ones((D,)),
        "out_proj": jnp.zeros((D, M)),  # zero-init: v-field starts at 0
    }
    return p


def _t_embed(t: jnp.ndarray, dim: int = 256) -> jnp.ndarray:
    """Sinusoidal embedding of flow time t in [0,1] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
    ang = t[:, None] * 1000.0 * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _ln(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _frame_pos_embed(positions: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Fixed sinusoidal embedding of absolute frame positions [B, F] -> [B, F, dim].
    Absolute (not relative) so windowed/streaming solves see consistent
    coordinates with the full-utterance solve."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
    ang = positions[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def vector_field(
    params: Params,
    cfg: CFMConfig,
    x_t: jnp.ndarray,            # [B, F, M] noisy mel at time t
    t: jnp.ndarray,              # [B] flow time
    token_cond: jnp.ndarray,     # [B, F, D] upsampled token embeddings (0 = uncond)
    spk: jnp.ndarray,            # [B, spk_dim]
    prompt_mel: jnp.ndarray,     # [B, F, M] prompt frames (0 beyond prompt_len)
    prompt_mask: jnp.ndarray,    # [B, F] 1 = prompt frame
    frame_mask: jnp.ndarray,     # [B, F] 1 = real frame
    positions: Optional[jnp.ndarray] = None,  # [B, F] absolute frame indices
) -> jnp.ndarray:
    B, Fr, M = x_t.shape
    D = cfg.dim
    dt = jnp.dtype(getattr(cfg, "dtype", "float32"))
    h = jnp.concatenate([x_t, prompt_mel, prompt_mask[..., None]], axis=-1)
    h = h @ params["in_proj"]
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(Fr)[None, :], (B, Fr))
    h = h + token_cond + (spk @ params["spk_proj"])[:, None, :]
    h = (h + _frame_pos_embed(positions, D).astype(h.dtype)).astype(dt)
    temb = jax.nn.silu(_t_embed(t) @ params["t_proj1"]) @ params["t_proj2"]  # [B, D]

    n_heads = cfg.n_heads
    hd = D // n_heads
    attn_mask = (frame_mask[:, None, None, :] > 0) & (frame_mask[:, None, :, None] > 0)

    def body(h, lp):
        # trunk matmuls in cfg.dtype (bf16 in production — ~2x mel-decode
        # throughput on v5e); LN stats, softmax and the adaLN modulation
        # stay f32, residual stream carries cfg.dtype
        w = lambda name: lp[name].astype(h.dtype)
        mod = jax.nn.silu(temb) @ lp["mod"]                     # [B, 6D] f32
        sh1, sc1, g1, sh2, sc2, g2 = [
            m.astype(h.dtype) for m in jnp.split(mod, 6, axis=-1)
        ]
        x = _ln(h) * (1 + sc1[:, None]) + sh1[:, None]
        q = (x @ w("wq")).reshape(B, Fr, n_heads, hd)
        k = (x @ w("wk")).reshape(B, Fr, n_heads, hd)
        v = (x @ w("wv")).reshape(B, Fr, n_heads, hd)
        att = sdpa(q, k, v, attn_mask).reshape(B, Fr, D)
        h = h + g1[:, None] * (att @ w("wo"))
        x = _ln(h) * (1 + sc2[:, None]) + sh2[:, None]
        h = h + g2[:, None] * (jax.nn.gelu(x @ w("w_up")) @ w("w_down"))
        return h, None

    h, _ = jax.lax.scan(body, h, params["layers"])
    h = _ln(h).astype(jnp.float32) * params["out_norm_scale"]
    return h @ params["out_proj"]                               # [B, F, M]


def upsample_tokens(
    params: Params, tokens: jnp.ndarray, upsample: int
) -> jnp.ndarray:
    """[B, T_tok] -> [B, T_tok*upsample, D] token conditioning at frame rate."""
    emb = params["tok_emb"][tokens]
    return jnp.repeat(emb, upsample, axis=1)


class CFMLoss(NamedTuple):
    loss: jnp.ndarray
    pred: jnp.ndarray


def cfm_loss(
    params: Params,
    cfg: CFMConfig,
    key: jax.Array,
    mel: jnp.ndarray,            # [B, F, M] target mel
    token_cond: jnp.ndarray,     # [B, F, D]
    spk: jnp.ndarray,
    prompt_mask: jnp.ndarray,    # [B, F] frames given as prompt
    frame_mask: jnp.ndarray,     # [B, F] real frames
    cond_drop_prob: float = 0.2,
) -> CFMLoss:
    """OT-CFM objective: x_t = (1-(1-s)t)x0 + t*x1, target u = x1 - (1-s)x0
    (optimal-transport displacement, sigma_min = s). Conditioning dropout
    trains the unconditional branch for CFG."""
    B, Fr, M = mel.shape
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, mel.shape, mel.dtype)
    t = jax.random.uniform(k2, (B,), mel.dtype)
    s = cfg.sigma_min
    x_t = (1 - (1 - s) * t)[:, None, None] * x0 + t[:, None, None] * mel
    target = mel - (1 - s) * x0
    drop = jax.random.bernoulli(k3, cond_drop_prob, (B,))
    tc = jnp.where(drop[:, None, None], 0.0, token_cond)
    prompt_mel = mel * prompt_mask[..., None]
    pred = vector_field(
        params, cfg, x_t, t, tc, spk, prompt_mel, prompt_mask, frame_mask
    )
    w = (frame_mask * (1 - prompt_mask))[..., None]  # don't score prompt frames
    loss = jnp.sum(w * (pred - target) ** 2) / jnp.maximum(jnp.sum(w) * M, 1.0)
    return CFMLoss(loss=loss, pred=pred)


@partial(jax.jit, static_argnames=("cfg", "use_cfg"))
def sample_mel(
    params: Params,
    cfg: CFMConfig,
    key: jax.Array,
    token_cond: jnp.ndarray,     # [B, F, D]
    spk: jnp.ndarray,            # [B, spk_dim]
    prompt_mel: jnp.ndarray,     # [B, F, M] (0 beyond prompt)
    prompt_mask: jnp.ndarray,    # [B, F]
    frame_mask: jnp.ndarray,     # [B, F]
    use_cfg: bool = True,
    positions: Optional[jnp.ndarray] = None,   # [B, F] absolute frame indices
) -> jnp.ndarray:
    """Fixed-step Euler ODE solve, t: 0 -> 1, n_steps static. One jit.
    Returns [B, F, M]; prompt frames are overwritten with the given mel."""
    B, Fr, _ = token_cond.shape
    M = cfg.n_mels
    x = jax.random.normal(key, (B, Fr, M), jnp.float32)
    dt = 1.0 / cfg.n_steps
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(Fr)[None, :], (B, Fr))

    if use_cfg:
        # fold the conditional + unconditional branches into ONE 2B-batched
        # estimator call per step: bigger matmuls for the MXU, half the
        # kernel launches vs two sequential evals
        tc2 = jnp.concatenate([token_cond, jnp.zeros_like(token_cond)], axis=0)
        spk2 = jnp.concatenate([spk, spk], axis=0)
        pm2 = jnp.concatenate([prompt_mel, prompt_mel], axis=0)
        pk2 = jnp.concatenate([prompt_mask, prompt_mask], axis=0)
        fm2 = jnp.concatenate([frame_mask, frame_mask], axis=0)
        pos2 = jnp.concatenate([positions, positions], axis=0)

        def step(x, i):
            t = jnp.full((2 * B,), i * dt, jnp.float32)
            v2 = vector_field(
                params, cfg, jnp.concatenate([x, x], axis=0), t,
                tc2, spk2, pm2, pk2, fm2, pos2,
            )
            v = (1 + cfg.cfg_scale) * v2[:B] - cfg.cfg_scale * v2[B:]
            return x + dt * v, None
    else:

        def step(x, i):
            t = jnp.full((B,), i * dt, jnp.float32)
            v = vector_field(
                params, cfg, x, t, token_cond, spk, prompt_mel, prompt_mask,
                frame_mask, positions,
            )
            return x + dt * v, None

    x, _ = jax.lax.scan(step, x, jnp.arange(cfg.n_steps))
    pm = prompt_mask[..., None]
    return x * (1 - pm) + prompt_mel * pm
