"""Matcha-style conv U-Net CFM estimator + MaskedDiffWithXvec flow compat.

The CosyVoice-300M flow.pt holds the mel decoder the reference's engine ran
through third_party/Matcha-TTS (SURVEY §2.3.1 "Flow-matching mel decoder";
PYTHONPATH hack tts_with_rag.py:18-19): a conformer encoder over speech
tokens, a linear-interpolation length regulator, a speaker affine, and a
conditional-flow-matching decoder whose vector-field estimator is a 1-D conv
U-Net (resnet blocks + transformer blocks, down/mid/up with skip concat).
This module is the converted tree's native home; the native TPU-first
redesign (models/cfm.py DiT estimator) remains the flagship path.

Everything is channels-last [B, T, C] so convs lower to MXU matmuls. The
U-Net stage structure (channel widths, block counts, up/down strides) is
READ OFF the converted tree, so one implementation serves the real release
geometry and tiny synthetic test dirs; only the attention head count is a
config knob (not recoverable from weight shapes).

Best-effort topology from the documented upstream architecture; unvalidated
against real release files (zero-egress env, docs/WEIGHTS.md).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...ops.conv import conv1d, conv_transpose1d
from . import wenet_conformer as wc

Params = Dict


@dataclass(frozen=True)
class MatchaFlowConfig:
    n_mels: int = 80
    n_heads: int = 4               # estimator attention heads (not inferable)
    n_steps: int = 10              # Euler steps (upstream n_timesteps)
    cfg_rate: float = 0.7          # upstream inference_cfg_rate
    token_mel_ratio: int = 2       # 25 Hz tokens -> 50 Hz mel frames
    temperature: float = 1.0


def _idx(d: Params):
    """Iterate a {"0": ..., "1": ...} int-keyed dict in index order."""
    return [d[k] for k in sorted(d, key=int)]


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _group_norm(x, scale, bias, groups, eps=1e-5):
    """torch GroupNorm over channels-last [B, T, C]: stats per (sample,
    group) over (T, C/G)."""
    B, T, C = x.shape
    xg = x.reshape(B, T, groups, C // groups).astype(jnp.float32)
    mu = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xn = ((xg - mu) * jax.lax.rsqrt(var + eps)).reshape(B, T, C)
    return (xn * scale + bias).astype(x.dtype)


def _block1d(x, p, mask):
    """Matcha Block1D: conv3 -> GroupNorm(8) -> Mish, mask-aware."""
    h = conv1d(x * mask[..., None], p["conv"])
    h = _group_norm(h, p["norm"]["scale"], p["norm"]["bias"], groups=8)
    return _mish(h)


def _resnet(x, p, mask, temb):
    h = _block1d(x, {"conv": p["b1_conv"], "norm": p["b1_norm"]}, mask)
    h = h + (_mish(temb) @ p["mlp"]["w"] + p["mlp"]["b"])[:, None, :]
    h = _block1d(h, {"conv": p["b2_conv"], "norm": p["b2_norm"]}, mask)
    return h + conv1d(x * mask[..., None], p["res_conv"])


def _ln(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, -1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * p["scale"] + p["bias"]).astype(x.dtype)


def _tf_block(x, p, mask, n_heads):
    """diffusers BasicTransformerBlock: LN -> MHA (no qkv bias) -> LN ->
    GEGLU feed-forward, both residual."""
    B, T, C = x.shape
    inner = p["q"]["w"].shape[1]
    hd = inner // n_heads
    n = _ln(x, p["norm1"])
    q = (n @ p["q"]["w"]).reshape(B, T, n_heads, hd)
    k = (n @ p["k"]["w"]).reshape(B, T, n_heads, hd)
    v = (n @ p["v"]["w"]).reshape(B, T, n_heads, hd)
    scores = jnp.einsum(
        "bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / math.sqrt(hd)
    valid = mask[:, None, None, :] > 0
    scores = jnp.where(valid, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    att = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32))
    att = att.reshape(B, T, inner).astype(x.dtype)
    x = x + att @ p["out"]["w"] + p["out"]["b"]
    n = _ln(x, p["norm3"])
    proj = n @ p["ff_proj"]["w"] + p["ff_proj"]["b"]
    a, gate = jnp.split(proj, 2, axis=-1)
    h = a * jax.nn.gelu(gate)
    return x + h @ p["ff_out"]["w"] + p["ff_out"]["b"]


def _sinu_t(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Matcha SinusoidalPosEmb: scale 1000, (half-1) exponent denominator,
    concat [sin, cos]."""
    half = dim // 2
    emb = math.log(10000.0) / max(half - 1, 1)
    freqs = jnp.exp(-emb * jnp.arange(half, dtype=jnp.float32))
    ang = 1000.0 * t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def estimator_apply(
    est: Params,
    cfg: MatchaFlowConfig,
    x: jnp.ndarray,            # [B, T, M] noisy mel
    mask: jnp.ndarray,         # [B, T]
    mu: jnp.ndarray,           # [B, T, M] encoder output (0 = uncond)
    t: jnp.ndarray,            # [B]
    spk: jnp.ndarray,          # [B, M] projected speaker vector
    cond: jnp.ndarray,         # [B, T, M] prompt-mel conditioning
) -> jnp.ndarray:
    """U-Net vector field. T must be divisible by 2**(n_down_stages-1)."""
    B, T, M = x.shape
    h = jnp.concatenate(
        [x, mu, jnp.broadcast_to(spk[:, None, :], (B, T, M)), cond], axis=-1
    )
    in_ch = h.shape[-1]
    temb = _sinu_t(t, in_ch)
    temb = jax.nn.silu(temb @ est["time_mlp"]["l1"]["w"] + est["time_mlp"]["l1"]["b"])
    temb = temb @ est["time_mlp"]["l2"]["w"] + est["time_mlp"]["l2"]["b"]

    downs = _idx(est["down"])
    ups = _idx(est["up"])
    hiddens = []
    masks = [mask]
    for i, stage in enumerate(downs):
        m = masks[-1]
        h = _resnet(h, stage["res"], m, temb)
        for tf in _idx(stage["tf"]):
            h = _tf_block(h, tf, m, cfg.n_heads)
        hiddens.append(h)
        last = i == len(downs) - 1
        # diffusers Downsample1D is torch Conv1d(k=3, stride=2, padding=1):
        # explicit (1, 1), not XLA SAME — SAME pads (0, 1) for even F and
        # shifts every window one frame against the upstream weights (same
        # class of bug the s3 tokenizer cross-validation caught)
        h = conv1d(h * m[..., None], stage["down"],
                   stride=1 if last else 2,
                   padding="SAME" if last else (1, 1))
        masks.append(m[:, ::2])
    masks = masks[:-1]
    m_mid = masks[-1]
    for stage in _idx(est["mid"]):
        h = _resnet(h, stage["res"], m_mid, temb)
        for tf in _idx(stage["tf"]):
            h = _tf_block(h, tf, m_mid, cfg.n_heads)
    for i, stage in enumerate(ups):
        m = masks.pop()
        skip = hiddens.pop()
        h = jnp.concatenate([h[:, : skip.shape[1]], skip], axis=-1)
        h = _resnet(h, stage["res"], m, temb)
        for tf in _idx(stage["tf"]):
            h = _tf_block(h, tf, m, cfg.n_heads)
        last = i == len(ups) - 1
        if last:
            h = conv1d(h * m[..., None], stage["up"])
        else:
            k = stage["up"]["w"].shape[0]
            h = conv_transpose1d(h * m[..., None], stage["up"], stride=2,
                                 kernel=k)
    m = mask
    h = _block1d(h, est["final_block"], m)
    out = conv1d(h * m[..., None], est["final_proj"])
    return out * m[..., None]


# ------------------------------------------------------------------ flow wrapper


def _length_regulator(lr: Params, h: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """InterpolateRegulator: linear-resample [B, T, C] to target_len frames,
    then the Sequential conv/GroupNorm(1)/Mish stack + final 1x1 conv.
    Items are told apart by weight rank (3D conv vs 1D norm scale)."""
    B, T, C = h.shape
    h = jax.image.resize(h, (B, target_len, C), method="linear")
    items = _idx(lr["seq"])
    i = 0
    while i < len(items):
        p = items[i]
        if "w" in p and p["w"].ndim == 3:
            nxt = items[i + 1] if i + 1 < len(items) else None
            if nxt is not None and "scale" in nxt:
                h = _mish(_group_norm(conv1d(h, p), nxt["scale"], nxt["bias"],
                                      groups=1))
                i += 2
            else:
                h = conv1d(h, p)   # final projection (no norm/act after)
                i += 1
        else:
            i += 1
    return h


def encode_tokens(
    params: Params,
    enc_cfg: wc.WenetEncoderConfig,
    tokens: jnp.ndarray,       # [B, T_tok] int32
    tok_mask: jnp.ndarray,     # [B, T_tok]
    n_frames: int,
) -> jnp.ndarray:
    """input_embedding -> conformer -> encoder_proj -> length-regulate to
    n_frames mel frames -> mu [B, n_frames, M]."""
    emb = params["input_embedding"][tokens]
    h = wc.apply_encoder(params["encoder"], enc_cfg, emb, tok_mask)
    h = h @ params["encoder_proj"]["w"] + params["encoder_proj"]["b"]
    return _length_regulator(params["length_regulator"], h, n_frames)


def solve(
    params: Params,
    cfg: MatchaFlowConfig,
    key: jax.Array,
    mu: jnp.ndarray,           # [B, F, M]
    spk: jnp.ndarray,          # [B, spk_dim] raw x-vector
    cond: jnp.ndarray,         # [B, F, M] prompt mel (0 beyond prompt)
    mask: jnp.ndarray,         # [B, F]
) -> jnp.ndarray:
    """Euler CFM solve with the upstream cosine time schedule
    t = 1 - cos(pi/2 * linspace) and classifier-free guidance that zeroes
    mu, spk and cond on the unconditional branch. Both branches run as ONE
    2B-batched estimator call per step (MXU-friendly, same trick as the
    native cfm.sample_mel)."""
    B, F, M = mu.shape
    spk_n = spk / jnp.maximum(jnp.linalg.norm(spk, axis=-1, keepdims=True), 1e-6)
    spk_p = spk_n @ params["spk_affine"]["w"] + params["spk_affine"]["b"]
    x = jax.random.normal(key, (B, F, M), jnp.float32) * cfg.temperature
    ts = 1.0 - jnp.cos(jnp.linspace(0.0, 1.0, cfg.n_steps + 1) * 0.5 * jnp.pi)

    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spk2 = jnp.concatenate([spk_p, jnp.zeros_like(spk_p)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    mask2 = jnp.concatenate([mask, mask], axis=0)

    def step(x, i):
        t0 = ts[i]
        dt = ts[i + 1] - ts[i]
        tb = jnp.full((2 * B,), t0, jnp.float32)
        v2 = estimator_apply(
            params["estimator"], cfg, jnp.concatenate([x, x], axis=0),
            mask2, mu2, tb, spk2, cond2,
        )
        v = (1 + cfg.cfg_rate) * v2[:B] - cfg.cfg_rate * v2[B:]
        return x + dt * v, None

    x, _ = jax.lax.scan(step, x, jnp.arange(cfg.n_steps))
    return x * mask[..., None]
