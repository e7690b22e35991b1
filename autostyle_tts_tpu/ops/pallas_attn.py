"""Pallas flash attention (TPU) for causal prefill with left-padded batches.

Replaces flash-attention-2 CUDA (reference: src/ft_llm.py:224) with a
TPU-native online-softmax kernel: grid (batch, head, q-block); K/V live in
VMEM per (batch, kv-head); the S dimension streams in BS-wide blocks with
running (m, l, acc) statistics so the [T, S] score matrix never
materializes. GQA folds into the k/v index_map (q head h reads kv head
h // (H//K)). Causal blocks strictly above the diagonal are skipped.

Layout: internally [B, H, T, hd] so each VMEM block's trailing dims are
(sequence, head_dim) — aligned to the (8, 128)-tile rule with hd equal to
the full minor dim. Numerics match ops.attention.sdpa (f32 accumulation) —
parity-tested in interpret mode on CPU and compile-tested on the real chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    offset_ref,                # [B] int32 scalar-prefetch: left-pad per row
    q_ref,                     # [1, 1, BT, hd]
    k_ref,                     # [1, 1, S, hd]
    v_ref,                     # [1, 1, S, hd]
    o_ref,                     # [1, 1, BT, hd]
    *,
    bs: int,
    scale: float,
):
    b = pl.program_id(0)
    tb = pl.program_id(2)
    bt = q_ref.shape[2]
    s_total = k_ref.shape[2]
    hd = q_ref.shape[3]
    start = offset_ref[b]

    q = q_ref[0, 0, :, :].astype(jnp.float32) * scale          # [BT, hd]
    q_pos = tb * bt + jax.lax.broadcasted_iota(jnp.int32, (bt, bs), 0)

    def body(sb, carry):
        acc, m, l = carry
        k = k_ref[0, 0, pl.ds(sb * bs, bs), :].astype(jnp.float32)   # [BS, hd]
        v = v_ref[0, 0, pl.ds(sb * bs, bs), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                            # [BT, BS]
        k_pos = sb * bs + jax.lax.broadcasted_iota(jnp.int32, (bt, bs), 1)
        mask = (k_pos <= q_pos) & (k_pos >= start)
        logits = jnp.where(mask, logits, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)                                   # [BT, 1]
        p = jnp.exp(logits - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    # causal: only stream blocks whose first key position <= last query position
    last_q = tb * bt + bt - 1
    n_blocks = jnp.minimum(last_q // bs + 1, s_total // bs)
    acc0 = jnp.zeros((bt, hd), jnp.float32)
    m0 = jnp.full((bt, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bt, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_blocks, body, (acc0, m0, l0))
    o_ref[0, 0, :, :] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "block_s", "interpret"))
def flash_attention(
    q: jnp.ndarray,            # [B, T, H, hd]
    k: jnp.ndarray,            # [B, S, K, hd]
    v: jnp.ndarray,
    offset: jnp.ndarray,       # [B] int32 first valid key slot (left-pad)
    block_t: int = 128,
    block_s: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal left-pad-aware flash attention; returns [B, T, H, hd] q.dtype.
    T and S must be multiples of the block sizes (pad + mask upstream)."""
    B, T, H, hd = q.shape
    S, K = k.shape[1], k.shape[2]
    assert T % block_t == 0 and S % block_s == 0, (T, S, block_t, block_s)
    rep = H // K
    scale = hd**-0.5

    qt = q.transpose(0, 2, 1, 3)      # [B, H, T, hd]
    kt = k.transpose(0, 2, 1, 3)      # [B, K, S, hd]
    vt = v.transpose(0, 2, 1, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, T // block_t),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_t, hd), lambda b, h, tb, _o: (b, h, tb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, S, hd), lambda b, h, tb, _o: (b, h // rep, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, S, hd), lambda b, h, tb, _o: (b, h // rep, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_t, hd), lambda b, h, tb, _o: (b, h, tb, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(_flash_kernel, bs=block_s, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, T, hd), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * T * S * hd * 2,
            bytes_accessed=(q.size + k.size * rep + v.size * rep) * 4,
            transcendentals=B * H * T * S,
        ),
    )(offset.astype(jnp.int32), qt, kt, vt)
    return out.transpose(0, 2, 1, 3)
