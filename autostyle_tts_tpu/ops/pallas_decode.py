"""Pallas fused decode-step kernels for the speech-token LM (B=1).

Why: the profiled 300M int8 decode step costs ~0.85 ms, of which only
~0.45 ms is weight streaming — the rest is per-op overhead of the ~200
small XLA ops a scanned transformer step emits (norms, RoPE gathers, mask
builds, cache re-stacking, reshapes). At B=1 the MXU is idle either way;
the step is HBM-latency/overhead-bound, so the fix is fusion: ONE kernel
per half-layer, everything living in VMEM/registers between the int8
GEMVs (replaces the reference's CUDA token-LM inner loop, SURVEY §2.3.1
"Token LM" row; the reference paid a full HF/CUDA dispatch per token).

Three entry points:

- ``mega_decode_step`` (the production path): the ENTIRE decode step —
  all layers, final norm, speech-head GEMV and greedy/top-k/Gumbel
  sampling — as ONE pallas_call over grid (n_layers + 1, 4 + ffn_tiles).
  Weights live in tile-major stacked arrays (every grid block one
  contiguous DMA, double-buffered across grid steps so the weight stream
  never stops between layers); each layer's KV cache is DMA'd into VMEM
  at its first grid step and only the 8-row aligned window holding the
  new token is written back. Measured ~0.40 ms/step at 300M int8
  (~590 GB/s of weight bytes) vs ~0.88 ms for the scanned XLA step.
- ``attn_step`` / ``mlp_step``: the same math as per-layer kernel pairs —
  the simpler interpret-mode parity reference (and a fallback shape).

Constraints (asserted): batch 1, n_heads == n_kv_heads (production token-LM
geometry), int8 ``QTensor`` weights, bf16 KV cache. The generic scan path
in models/transformer.py remains the fallback for everything else.
Numerics match the XLA path: f32 norms/softmax/accumulation, bf16 dots;
greedy tokens are bit-identical (random sampling uses the same top-k +
categorical distribution via Gumbel-max, different RNG stream).
Parity-tested in interpret mode on CPU (tests/test_pallas_decode.py) and
compile-tested on the real chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import QTensor

NEG_INF = -1e30


def _rmsnorm_f32(h: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    nrm = h * jax.lax.rsqrt(jnp.mean(h * h, axis=-1, keepdims=True) + eps)
    return nrm * w


def _rope_flat(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, hd: int
) -> jnp.ndarray:
    """Rotate-half RoPE on a FLAT head-major row [1, n_heads*hd] with tiled
    [1, n_heads*hd] cos/sin rows.

    Mosaic cannot relayout [1, H*hd] -> [H, hd], so heads stay in the lane
    dimension. Per-head rotate-half needs, at flat lane l = 64h + i:
    i <  hd/2 -> the other half's element x[l + hd/2]  (= roll(x, -hd/2))
    i >= hd/2 -> x[l - hd/2]                            (= roll(x, +hd/2))
    Cross-head contamination of each full-lane roll is discarded by the
    lane-position select. Sign: first half contributes -x2*s, second +x1*s."""
    fwd = pltpu.roll(x, hd // 2, axis=1)
    bwd = pltpu.roll(x, x.shape[1] - hd // 2, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    first = (lane % hd) < (hd // 2)
    rot = jnp.where(first, bwd, fwd)
    sign = jnp.where(first, -1.0, 1.0)
    return x * cos + rot * sign * sin


def _attn_kernel(
    sc_ref,       # [1, 2] SMEM: (t, off) — cache write slot, first valid slot
    h_ref,        # [1, D] bf16 residual stream
    nrm_ref,      # [1, D] f32 attn rmsnorm weight
    wqkv_ref,     # [D, (H+2K)*hd] int8
    wqs_ref,      # [1, (H+2K)*hd] f32 scales
    wo_ref,       # [H*hd, D] int8
    wos_ref,      # [1, D] f32
    cos_ref,      # [1, H*hd] f32 rope row tiled per head for this position
    sin_ref,      # [1, H*hd]
    kin_ref,      # [S, K*hd] bf16 flat head-major cache (ANY; aliased w/ kout)
    vin_ref,
    ho_ref,       # [1, D] bf16 out
    kout_ref,     # aliased caches out
    vout_ref,
    kc, vc,       # VMEM scratch [S, K*hd] bf16
    krow, vrow,   # VMEM scratch [8, K*hd] bf16 (8-row aligned write window)
    sems,         # DMA sems (4,)
    *,
    n_heads: int,
    head_dim: int,
    eps: float,
):
    H, hd = n_heads, head_dim
    K = H
    S = kc.shape[0]
    tt = sc_ref[0, 0]
    off = sc_ref[0, 1]

    # start the full-cache reads first so they overlap the QKV GEMV
    rd_k = pltpu.make_async_copy(kin_ref, kc, sems.at[0])
    rd_v = pltpu.make_async_copy(vin_ref, vc, sems.at[1])
    rd_k.start()
    rd_v.start()

    h = h_ref[:].astype(jnp.float32)                          # [1, D]
    x = _rmsnorm_f32(h, nrm_ref[:], eps).astype(jnp.bfloat16)
    qkv = (
        jnp.dot(x, wqkv_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        * wqs_ref[:]
    )                                                          # [1, (H+2K)*hd]
    q = qkv[:, : H * hd]                                       # flat [1, H*hd]
    k_new = qkv[:, H * hd : (H + K) * hd]
    v_new = qkv[:, (H + K) * hd :]
    cos = cos_ref[:]
    sin = sin_ref[:]
    q = _rope_flat(q, cos, sin, hd)
    k_new = _rope_flat(k_new, cos, sin, hd)

    # DMA slices must be 8-row aligned: build the aligned window containing
    # slot t from the (pre-update) scratch copy, patch row t, write it back.
    t8 = pl.multiple_of((tt // 8) * 8, 8)
    r_in_w = jax.lax.broadcasted_iota(jnp.int32, (8, k_new.shape[1]), 0)
    rd_k.wait()
    rd_v.wait()
    krow[:] = jnp.where(
        r_in_w == tt - t8, k_new.astype(jnp.bfloat16), kc[pl.ds(t8, 8), :]
    )
    vrow[:] = jnp.where(
        r_in_w == tt - t8, v_new.astype(jnp.bfloat16), vc[pl.ds(t8, 8), :]
    )
    wr_k = pltpu.make_async_copy(krow, kout_ref.at[pl.ds(t8, 8), :], sems.at[2])
    wr_v = pltpu.make_async_copy(vrow, vout_ref.at[pl.ds(t8, 8), :], sems.at[3])
    wr_k.start()
    wr_v.start()

    # per-head segment sums via a constant block matrix G [K*hd, K]
    # (G[j, k] = 1 iff j // hd == k): heads never leave the lane dimension,
    # so no Mosaic relayouts; the extra MXU work is free at B=1.
    g_mat = (
        jax.lax.broadcasted_iota(jnp.int32, (K * hd, K), 0) // hd
        == jax.lax.broadcasted_iota(jnp.int32, (K * hd, K), 1)
    ).astype(jnp.float32)

    scale = hd ** -0.5
    kcf = kc[:].astype(jnp.float32)                            # [S, K*hd]
    prod = kcf * q                                             # [S, K*hd]
    logits = (
        jnp.dot(prod, g_mat, preferred_element_type=jnp.float32) * scale
    )                                                          # [S, K]
    j_s = jax.lax.broadcasted_iota(jnp.int32, (S, K), 0)
    logits = jnp.where((j_s < tt) & (j_s >= off), logits, NEG_INF)
    # current token scored in-register (its cache row may still be in flight)
    cur = (
        jnp.dot(q * k_new, g_mat, preferred_element_type=jnp.float32) * scale
    )                                                          # [1, K]

    m = jnp.maximum(jnp.max(logits, axis=0, keepdims=True), cur)   # [1, K]
    p = jnp.exp(logits - m)                                         # [S, K]
    pc = jnp.exp(cur - m)                                           # [1, K]
    denom = jnp.sum(p, axis=0, keepdims=True) + pc                  # [1, K]

    vcf = vc[:].astype(jnp.float32)                            # [S, K*hd]
    p_exp = jnp.dot(
        p, g_mat.T, preferred_element_type=jnp.float32
    )                                                          # [S, K*hd]
    num = jnp.sum(p_exp * vcf, axis=0, keepdims=True)          # [1, K*hd]
    pc_exp = jnp.dot(pc, g_mat.T, preferred_element_type=jnp.float32)
    den_exp = jnp.dot(denom, g_mat.T, preferred_element_type=jnp.float32)
    attn = ((num + pc_exp * v_new) / den_exp).astype(jnp.bfloat16)
    delta = (
        jnp.dot(attn, wo_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        * wos_ref[:]
    )
    ho_ref[:] = (h + delta).astype(ho_ref.dtype)
    wr_k.wait()
    wr_v.wait()


@functools.partial(
    jax.jit, static_argnames=("n_heads", "head_dim", "eps", "interpret")
)
def attn_step(
    h: jnp.ndarray,            # [1, D] bf16
    attn_norm: jnp.ndarray,    # [1, D] f32
    wqkv: QTensor,             # int8 [D, (H+2K)*hd]
    wo: QTensor,               # int8 [H*hd, D]
    cos_row: jnp.ndarray,      # [1, H*hd] f32 (rope row tiled per head)
    sin_row: jnp.ndarray,
    k_cache: jnp.ndarray,      # [S, K*hd] bf16 flat head-major cache
    v_cache: jnp.ndarray,
    t: jnp.ndarray,            # scalar int32 — write slot / mask bound
    off: jnp.ndarray,          # scalar int32 — first valid slot (left pad)
    *,
    n_heads: int,
    head_dim: int,
    eps: float,
    interpret: bool = False,
):
    """One decode-step attention half-layer; returns (h', k_cache', v_cache').
    Caches are aliased in/out (updated in place — only the new row is
    written back)."""
    S, KH = k_cache.shape
    D = h.shape[1]
    assert S % 8 == 0, f"cache length {S} must be 8-aligned for the row DMA"
    sc = jnp.concatenate(
        [t.reshape(1, 1), off.reshape(1, 1)], axis=1
    ).astype(jnp.int32)
    kernel = functools.partial(
        _attn_kernel, n_heads=n_heads, head_dim=head_dim, eps=eps
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem(),
            any_spec, any_spec,
        ],
        out_specs=(vmem(), any_spec, any_spec),
        out_shape=(
            jax.ShapeDtypeStruct((1, D), h.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={9: 1, 10: 2},
        scratch_shapes=[
            pltpu.VMEM((S, KH), k_cache.dtype),
            pltpu.VMEM((S, KH), v_cache.dtype),
            pltpu.VMEM((8, KH), k_cache.dtype),
            pltpu.VMEM((8, KH), v_cache.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * D * wqkv.q.shape[1] + 6 * S * KH * n_heads,
            bytes_accessed=wqkv.q.size + wo.q.size + 4 * S * KH,
            transcendentals=S * n_heads,
        ),
    )(sc, h, attn_norm, wqkv.q, wqkv.s, wo.q, wo.s, cos_row, sin_row,
      k_cache, v_cache)


def _mlp_kernel(
    h_ref,        # [1, D] bf16
    nrm_ref,      # [1, D] f32
    wg_ref,       # [D, TF] int8 (gate tile)
    wgs_ref,      # [1, TF]
    wu_ref,       # [D, TF] int8 (up tile)
    wus_ref,      # [1, TF]
    wd_ref,       # [TF, D] int8 (down tile)
    wds_ref,      # [1, D]
    ho_ref,       # [1, D] bf16
    acc,          # VMEM scratch [1, D] f32
    *,
    eps: float,
):
    j = pl.program_id(0)
    h = h_ref[:].astype(jnp.float32)
    x = _rmsnorm_f32(h, nrm_ref[:], eps).astype(jnp.bfloat16)
    g = (
        jnp.dot(x, wg_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        * wgs_ref[:]
    )
    u = (
        jnp.dot(x, wu_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        * wus_ref[:]
    )
    t = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
    part = jnp.dot(t, wd_ref[:].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc[:] = part

    @pl.when(j > 0)
    def _():
        acc[:] = acc[:] + part

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        ho_ref[:] = (h + acc[:] * wds_ref[:]).astype(ho_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "tile_f", "interpret")
)
def mlp_step(
    h: jnp.ndarray,            # [1, D] bf16
    mlp_norm: jnp.ndarray,     # [1, D] f32
    w_gate_up: QTensor,        # int8 [D, 2F]
    w_down: QTensor,           # int8 [F, D]
    *,
    eps: float,
    tile_f: int = 1024,
    interpret: bool = False,
):
    """One decode-step MLP half-layer, FFN streamed in `tile_f` column tiles
    (double-buffered by the grid pipeline)."""
    D = h.shape[1]
    F = w_down.q.shape[0]
    tf = min(tile_f, F)
    assert F % tf == 0, (F, tf)
    n_tiles = F // tf
    kernel = functools.partial(_mlp_kernel, eps=eps)
    const = lambda j: (0, 0)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            # gate tile j and up tile (F/tf + j) view the same fused array
            pl.BlockSpec((D, tf), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tf), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (D, tf), lambda j: (0, F // tf + j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tf), lambda j: (0, F // tf + j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tf, D), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, D), h.dtype),
        scratch_shapes=[pltpu.VMEM((1, D), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * D * 3 * F * 2,
            bytes_accessed=w_gate_up.q.size + w_down.q.size,
            transcendentals=F,
        ),
    )(h, mlp_norm, w_gate_up.q, w_gate_up.s, w_gate_up.q, w_gate_up.s,
      w_down.q, w_down.s)


def fused_ok(params, cfg, batch: int) -> bool:
    """Fused decode applies: B=1, int8-quantized projections, no GQA/bias,
    FFN divisible by the tile. Reads ASTTTS_FUSED=0 to disable (trace-time,
    like flash_ok)."""
    import os

    if os.environ.get("ASTTTS_FUSED", "1") == "0":
        return False
    lp = params["layers"]
    return (
        batch == 1
        and cfg.n_heads == cfg.n_kv_heads
        and "bqkv" not in lp
        and isinstance(lp["wqkv"], QTensor)
        and isinstance(lp["wo"], QTensor)
        and isinstance(lp["w_gate_up"], QTensor)
        and isinstance(lp["w_down"], QTensor)
        # the megakernel tiles FFN at tile_f=512 (token_lm.mega_decode_params
        # default); a non-divisible ffn_dim must take the scanned path instead
        # of crashing in mega_decode_params' assert
        and cfg.ffn_dim % min(512, cfg.ffn_dim) == 0
    )


# ============================================================== megakernel
#
# One pallas_call per decode step: grid (n_layers + 1, 4 + n_ffn_tiles).
# For l < n_layers (transformer layers):
#   j = 0..2   : q / k / v third-GEMVs of the fused QKV projection
#   j = 2 also : RoPE q,k + aligned KV-window write DMA into the HBM cache
#   j = 3      : attention against the VMEM cache copy + out-projection
#   j = 4..    : FFN tiles (interleaved gate|up + down), accumulated
# For l == n_layers (head phase):
#   j = 0..JH-1: final-rmsnorm + speech-head GEMV tiles -> logits rows
#   j = JH     : pad/BOS/EOS masking, temperature, top-k threshold and
#                Gumbel-max sampling (pltpu PRNG) -> next token id (SMEM)
# The sampled token feeds back as an SMEM scalar: its embedding row is
# DMA'd from the table and the RoPE rows are rebuilt from the position at
# (0, 0) — the XLA loop body is ONLY EOS bookkeeping. The head GEMV,
# lax.top_k sampler and embed/rope gathers it replaces were ~40% of the
# per-step wall time outside the kernel.
#
# All weights live in TILE-MAJOR stacked arrays so every grid step's block
# is one contiguous DMA (column tiles of a row-major [D, F] array are
# strided and measured ~2x slower); the pipeline double-buffers each
# operand across grid steps, so the weight stream never stops between
# layers — the 28-call-per-step version topped out at ~350 GB/s from DMA
# ramp + per-call overhead. Each layer's KV cache is prefetched into a
# revolving 2-slot VMEM scratch one layer ahead.


def _unpack4_lanes(w, int4: bool):
    """Weight block -> bf16. int4 blocks are INT8-typed bytes with
    OUTPUT-channel pairs (c, c + C/2) packed per byte (low nibble = c), so
    unpack is two elementwise passes + a lane concat — no sublane relayout,
    and the DMA stream halves vs int8."""
    if not int4:
        return w.astype(jnp.bfloat16)
    # nibble split in PURE bf16 arithmetic — every intermediate (signed
    # byte in [-128,127], /16, floor, *16) is exact in bf16's 8-bit
    # mantissa. The high nibble is stored SIGNED and the low offset-binary
    # (token_lm._pack4_lanes), so v = 16*hi + (lo+8) and floor(v/16)
    # recovers hi with NO shifts or compares: Mosaic rejects shifts on
    # packed 4-byte-per-lane i8 vectors, i8->i32 widening costs relayouts
    # that made the kernel VPU-bound (0.40 ms vs int8's 0.35 on v5e), and
    # i1 predicate vectors hit an "Invalid relayout" compile bug.
    # (floor must run in f32: v5e has no bf16 floor ALU op)
    v = w.astype(jnp.bfloat16).astype(jnp.float32)
    hi = jnp.floor(v * (1.0 / 16.0))               # signed high nibble
    lo = v - hi * 16.0 - 8.0                       # low nibble, re-centred
    return jnp.concatenate(
        [lo.astype(jnp.bfloat16), hi.astype(jnp.bfloat16)], axis=-1
    )


def _mega_kernel(
    sc_ref,        # [1, 5] SMEM: (t, off, suppress_eos, seed, tok_in)
    emb_ref,       # [V8, D] bf16 speech-embedding table (ANY; row-DMA'd)
    anrm_ref,      # [1, 1, D] block of stacked attn norms
    wqkv3_ref,     # [1, 1, D, N] int8 — q/k/v third for this (l, j<3)
    wqs3_ref,      # [1, 1, 1, N] f32
    wo_ref,        # [1, N, D] int8
    wos_ref,       # [1, 1, D] f32
    invf_ref,      # [1, N] f32 tiled rotate-half inverse frequencies
    mnrm_ref,      # [1, 1, D]
    wgu_ref,       # [1, 1, D, 2*TF] int8 — interleaved gate|up tile
    wgus_ref,      # [1, 1, 1, 2*TF]
    wd_ref,        # [1, 1, TF, D] int8
    wds_ref,       # [1, 1, D]
    fnrm_ref,      # [1, D] final rmsnorm weight
    head_ref,      # [1, D, TV] int8 — speech-head tile (head phase)
    heads_ref,     # [1, 1, TV] f32
    kin_ref,       # [L, S, KH] ANY (aliased with kout)
    vin_ref,
    ho_ref,        # [1, D] bf16 out
    tok_ref,       # [1, 1] SMEM int32 — sampled next token
    kout_ref, vout_ref,
    h_s,           # VMEM [1, D] bf16 — residual stream across grid steps
    q_s, k_s, v_s, # VMEM [1, N] f32
    acc,           # VMEM [1, D] f32 — FFN accumulator
    logit_s,       # VMEM [8, TV] f32 — head-tile logits rows (JH used)
    cos_s, sin_s,  # VMEM [1, N] f32 — rope rows for this position
    embw,          # VMEM [8, D] bf16 — aligned embedding-row window
    kc, vc,        # VMEM [S, KH] bf16 — this layer's cache copy
    kwin, vwin,    # VMEM [8, KH] bf16 — aligned write windows
    rd_sems,       # DMA sems (3,): k / v / emb reads
    wr_sems,       # DMA sems (2,)
    *,
    n_heads: int,
    head_dim: int,
    eps: float,
    n_head_tiles: int,
    vocab: int,
    pad_id: int,
    bos_id: int,
    eos_id: int,
    greedy: bool,
    temperature: float,
    top_k: int,
    int4: bool,
):
    l = pl.program_id(0)
    j = pl.program_id(1)
    NL = pl.num_programs(0) - 1        # real transformer layers
    J = pl.num_programs(1)
    H, hd = n_heads, head_dim
    N = H * hd
    S = kc.shape[0]
    TV = logit_s.shape[1]
    JH = n_head_tiles
    tt = sc_ref[0, 0]
    off = sc_ref[0, 1]

    def rd_copies(layer):
        return (
            pltpu.make_async_copy(kin_ref.at[layer], kc, rd_sems.at[0]),
            pltpu.make_async_copy(vin_ref.at[layer], vc, rd_sems.at[1]),
        )

    @pl.when((l == 0) & (j == 0))
    def _():
        # embed the incoming token: DMA the 8-row-aligned window holding it
        tok_in = sc_ref[0, 4]
        e8 = pl.multiple_of((tok_in // 8) * 8, 8)
        cp = pltpu.make_async_copy(
            emb_ref.at[pl.ds(e8, 8), :], embw, rd_sems.at[2]
        )
        cp.start()
        # rope rows for this position, built in-kernel: one cos/sin pass
        # over [1, N] instead of per-step XLA gathers + tiles
        pos = jnp.maximum(tt - off, 0).astype(jnp.float32)
        cos_s[:] = jnp.cos(pos * invf_ref[:])
        sin_s[:] = jnp.sin(pos * invf_ref[:])
        cp.wait()
        rw = jax.lax.broadcasted_iota(jnp.int32, embw.shape, 0)
        h_s[:] = jnp.sum(
            jnp.where(rw == tok_in - e8, embw[:], 0).astype(jnp.float32),
            axis=0, keepdims=True,
        ).astype(h_s.dtype)

    # start this layer's cache read; it overlaps the q/k GEMVs and is
    # awaited at j == 2 (the DMA is ~2 us, the two GEMVs ~4 us)
    @pl.when((l < NL) & (j == 0))
    def _():
        ck, cv = rd_copies(l)
        ck.start()
        cv.start()

    # ---- qkv thirds ------------------------------------------------------
    @pl.when((l < NL) & (j < 3))
    def _():
        hf = h_s[:].astype(jnp.float32)
        x = _rmsnorm_f32(hf, anrm_ref[0], eps).astype(jnp.bfloat16)
        part = (
            jnp.dot(x, _unpack4_lanes(wqkv3_ref[0, 0], int4),
                    preferred_element_type=jnp.float32)
            * wqs3_ref[0, 0]
        )

        @pl.when(j == 0)
        def _():
            q_s[:] = part

        @pl.when(j == 1)
        def _():
            k_s[:] = part

        @pl.when(j == 2)
        def _():
            v_s[:] = part

    # ---- rope + cache-window write (needs k, v; q roped here too) -------
    @pl.when((l < NL) & (j == 2))
    def _():
        cos = cos_s[:]
        sin = sin_s[:]
        q_s[:] = _rope_flat(q_s[:], cos, sin, hd)
        k_s[:] = _rope_flat(k_s[:], cos, sin, hd)
        ck, cv = rd_copies(l)
        ck.wait()
        cv.wait()
        t8 = pl.multiple_of((tt // 8) * 8, 8)
        rw = jax.lax.broadcasted_iota(jnp.int32, (8, N), 0)
        kwin[:] = jnp.where(
            rw == tt - t8, k_s[:].astype(jnp.bfloat16), kc[pl.ds(t8, 8), :]
        )
        vwin[:] = jnp.where(
            rw == tt - t8, v_s[:].astype(jnp.bfloat16), vc[pl.ds(t8, 8), :]
        )
        pltpu.make_async_copy(
            kwin, kout_ref.at[l, pl.ds(t8, 8), :], wr_sems.at[0]
        ).start()
        pltpu.make_async_copy(
            vwin, vout_ref.at[l, pl.ds(t8, 8), :], wr_sems.at[1]
        ).start()

    # ---- attention + out-projection --------------------------------------
    @pl.when((l < NL) & (j == 3))
    def _():
        g_mat = (
            jax.lax.broadcasted_iota(jnp.int32, (N, H), 0) // hd
            == jax.lax.broadcasted_iota(jnp.int32, (N, H), 1)
        ).astype(jnp.float32)
        scale = hd ** -0.5
        q = q_s[:]
        k_new = k_s[:]
        v_new = v_s[:]
        kcf = kc[:].astype(jnp.float32)
        logits = (
            jnp.dot(kcf * q, g_mat, preferred_element_type=jnp.float32) * scale
        )
        j_s = jax.lax.broadcasted_iota(jnp.int32, (S, H), 0)
        logits = jnp.where((j_s < tt) & (j_s >= off), logits, NEG_INF)
        cur = (
            jnp.dot(q * k_new, g_mat, preferred_element_type=jnp.float32)
            * scale
        )
        m = jnp.maximum(jnp.max(logits, axis=0, keepdims=True), cur)
        p = jnp.exp(logits - m)
        pc = jnp.exp(cur - m)
        denom = jnp.sum(p, axis=0, keepdims=True) + pc
        vcf = vc[:].astype(jnp.float32)
        p_exp = jnp.dot(p, g_mat.T, preferred_element_type=jnp.float32)
        num = jnp.sum(p_exp * vcf, axis=0, keepdims=True)
        pc_exp = jnp.dot(pc, g_mat.T, preferred_element_type=jnp.float32)
        den_exp = jnp.dot(denom, g_mat.T, preferred_element_type=jnp.float32)
        attn = ((num + pc_exp * v_new) / den_exp).astype(jnp.bfloat16)
        delta = (
            jnp.dot(attn, _unpack4_lanes(wo_ref[0], int4),
                    preferred_element_type=jnp.float32)
            * wos_ref[0]
        )
        h_s[:] = (h_s[:].astype(jnp.float32) + delta).astype(h_s.dtype)
        pltpu.make_async_copy(
            kwin, kout_ref.at[l, pl.ds(0, 8), :], wr_sems.at[0]
        ).wait()
        pltpu.make_async_copy(
            vwin, vout_ref.at[l, pl.ds(0, 8), :], wr_sems.at[1]
        ).wait()

    # ---- FFN tiles --------------------------------------------------------
    @pl.when((l < NL) & (j >= 4))
    def _():
        tf = wd_ref.shape[2]
        hf = h_s[:].astype(jnp.float32)
        x = _rmsnorm_f32(hf, mnrm_ref[0], eps).astype(jnp.bfloat16)
        gu = (
            jnp.dot(x, _unpack4_lanes(wgu_ref[0, 0], int4),
                    preferred_element_type=jnp.float32)
            * wgus_ref[0, 0]
        )
        g = gu[:, :tf]
        u = gu[:, tf:]
        part = jnp.dot(
            (jax.nn.silu(g) * u).astype(jnp.bfloat16),
            _unpack4_lanes(wd_ref[0, 0], int4),
            preferred_element_type=jnp.float32,
        )

        @pl.when(j == 4)
        def _():
            acc[:] = part

        @pl.when(j > 4)
        def _():
            acc[:] = acc[:] + part

        @pl.when(j == J - 1)
        def _():
            h_s[:] = (
                h_s[:].astype(jnp.float32) + acc[:] * wds_ref[0]
            ).astype(h_s.dtype)

            @pl.when(l == NL - 1)
            def _():
                ho_ref[:] = h_s[:]

    # ---- head phase: final norm + head GEMV tiles + sampling -------------
    @pl.when((l == NL) & (j < JH))
    def _():
        hf = h_s[:].astype(jnp.float32)
        xn = _rmsnorm_f32(hf, fnrm_ref[:], eps).astype(jnp.bfloat16)
        row = (
            jnp.dot(xn, _unpack4_lanes(head_ref[0], int4),
                    preferred_element_type=jnp.float32)
            * heads_ref[0]
        )
        logit_s[pl.ds(j, 1), :] = row

    @pl.when((l == NL) & (j == JH))
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, TV), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (8, TV), 1)
        fid = rows * TV + cols                       # flat vocab id per slot
        y = logit_s[:]
        invalid = (
            (rows >= JH) | (fid >= vocab)
            | (fid == pad_id) | (fid == bos_id)
            | ((fid == eos_id) & (sc_ref[0, 2] != 0))
        )
        y = jnp.where(invalid, NEG_INF, y)
        if not greedy:
            y = y / max(temperature, 1e-6)
            if top_k and top_k > 0:
                # top-k threshold: strip the k-1 largest, the max of the rest
                # is the k-th value. Each iteration strips ALL values tied at
                # the running max, so exact ties among the top-k admit a few
                # extra candidates — a hair more permissive than lax.top_k
                # (which itself keeps ties at the threshold); measure-zero
                # for continuous logits, and ~3 us for k=25 on v5e
                cur = y
                for _ in range(top_k - 1):
                    cur = jnp.where(cur >= jnp.max(cur), NEG_INF, cur)
                y = jnp.where(y < jnp.max(cur), NEG_INF, y)
            # Gumbel-max == categorical sampling
            pltpu.prng_seed(sc_ref[0, 3])
            bits = pltpu.bitcast(pltpu.prng_random_bits((8, TV)), jnp.uint32)
            # Mosaic lacks uint32->f32; >>8 keeps 24 bits so int32 is exact
            b24 = pltpu.bitcast(bits >> 8, jnp.int32)
            u = b24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-9
            y = y - jnp.log(-jnp.log(u))
        pick = jnp.min(jnp.where(y >= jnp.max(y), fid, jnp.int32(2**30)))
        tok_ref[0, 0] = pick.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_heads", "head_dim", "eps", "vocab", "pad_id", "bos_id", "eos_id",
        "greedy", "temperature", "top_k", "interpret",
    ),
)
def mega_decode_step(
    tok_in: jnp.ndarray, # int32 scalar — previous token (embedded in-kernel)
    mp: dict,            # mega_decode_params(...) tile-major weight pytree
    k_all: jnp.ndarray,  # [L, S, K*hd] bf16 flat caches
    v_all: jnp.ndarray,
    t: jnp.ndarray,
    off: jnp.ndarray,
    suppress_eos: jnp.ndarray,   # int32 scalar: 1 -> mask EOS (min_tokens)
    seed: jnp.ndarray,           # int32 scalar PRNG seed for this step
    *,
    n_heads: int,
    head_dim: int,
    eps: float,
    vocab: int,
    pad_id: int,
    bos_id: int,
    eos_id: int,
    greedy: bool = True,
    temperature: float = 1.0,
    top_k: int = 0,
    interpret: bool = False,
):
    """Full transformer decode step — all layers PLUS final norm, speech
    head and top-k/Gumbel sampling — in ONE pallas_call. Returns
    (h_last, next_token [1,1] int32, k_all', v_all'); caches updated in
    place via aliasing. Scalars (slot/offset/eos-gate/seed/token) ride in
    SMEM; the token's embedding row is DMA'd from the table in-kernel and
    RoPE rows are built from the position — the XLA loop body is only EOS
    bookkeeping."""
    L, S, KH = k_all.shape
    D = mp["emb8"].shape[1]
    N = n_heads * head_dim
    JM = mp["wd_t"].shape[1]
    TF = mp["wd_t"].shape[2]
    JH = mp["head_t"].shape[0]
    # int4 is detected by WIDTH (packed arrays carry half the lanes): the
    # byte carrier is int8 either way (Mosaic has no uint8->bf16 cast)
    int4 = mp["wqkv3"].shape[3] * 2 == N
    # packed arrays carry half the lanes; logits/activations stay full width
    NW = mp["wqkv3"].shape[3]
    DW = mp["wo"].shape[2]
    GW = mp["wgu_t"].shape[3]
    DW2 = mp["wd_t"].shape[3]
    TVW = mp["head_t"].shape[2]
    TV = TVW * (2 if int4 else 1)
    J = 4 + JM
    assert S % 8 == 0, S
    assert J > JH, (J, JH)   # head tiles + sample step fit one grid row
    kernel = functools.partial(
        _mega_kernel, n_heads=n_heads, head_dim=head_dim, eps=eps,
        n_head_tiles=JH, vocab=vocab, pad_id=pad_id,
        bos_id=bos_id, eos_id=eos_id,
        greedy=greedy, temperature=temperature, top_k=top_k, int4=int4,
    )
    # head phase (l == L) consumes no qkv/FFN tiles, but Pallas DMAs a
    # block whenever its index map CHANGES between grid steps — so the
    # dead-phase maps below pin to the LAST block visited at l == L-1
    # (qkv third 2, FFN tile JM-1) instead of re-walking a whole layer's
    # weights every decode step (~1/L of the stream, for nothing).
    c2 = lambda l, j: (0, 0)
    lmap3 = lambda l, j: (jnp.minimum(l, L - 1), 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(L + 1, J),
        in_specs=[
            pl.BlockSpec((1, 5), c2, memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, D), lmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, D, NW),
                lambda l, j: (jnp.minimum(l, L - 1),
                              jnp.where(l == L, 2, jnp.minimum(j, 2)), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, N),
                lambda l, j: (jnp.minimum(l, L - 1),
                              jnp.where(l == L, 2, jnp.minimum(j, 2)), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, N, DW), lmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), c2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, D, GW),
                lambda l, j: (
                    jnp.minimum(l, L - 1),
                    jnp.where(l == L, JM - 1, jnp.maximum(j - 4, 0)), 0, 0
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, 2 * TF),
                lambda l, j: (
                    jnp.minimum(l, L - 1),
                    jnp.where(l == L, JM - 1, jnp.maximum(j - 4, 0)), 0, 0
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, TF, DW2),
                lambda l, j: (
                    jnp.minimum(l, L - 1),
                    jnp.where(l == L, JM - 1, jnp.maximum(j - 4, 0)), 0, 0
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, D), lmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c2, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, D, TVW),
                lambda l, j: (
                    jnp.where(l == L, jnp.minimum(j, JH - 1), 0), 0, 0
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, TV),
                lambda l, j: (
                    jnp.where(l == L, jnp.minimum(j, JH - 1), 0), 0, 0
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, D), c2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), c2, memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ),
        input_output_aliases={16: 2, 17: 3},
        scratch_shapes=[
            pltpu.VMEM((1, D), jnp.bfloat16),
            pltpu.VMEM((1, N), jnp.float32),
            pltpu.VMEM((1, N), jnp.float32),
            pltpu.VMEM((1, N), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
            pltpu.VMEM((8, TV), jnp.float32),
            pltpu.VMEM((1, N), jnp.float32),
            pltpu.VMEM((1, N), jnp.float32),
            pltpu.VMEM((8, D), jnp.bfloat16),
            pltpu.VMEM((S, KH), k_all.dtype),
            pltpu.VMEM((S, KH), v_all.dtype),
            pltpu.VMEM((8, KH), k_all.dtype),
            pltpu.VMEM((8, KH), v_all.dtype),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * L * D * (3 * N + N + 6 * TF * JM) + 2 * D * JH * TV,
            bytes_accessed=(
                mp["wqkv3"].size + mp["wo"].size + mp["wgu_t"].size
                + mp["wd_t"].size + mp["head_t"].size + 4 * L * S * KH
            ),
            transcendentals=L * (S * n_heads + TF * JM) + JH * TV,
        ),
    )(
        jnp.concatenate(
            [t.reshape(1, 1), off.reshape(1, 1), suppress_eos.reshape(1, 1),
             seed.reshape(1, 1), tok_in.reshape(1, 1)], axis=1
        ).astype(jnp.int32),
        mp["emb8"], mp["attn_norm"], mp["wqkv3"], mp["wqs3"], mp["wo"],
        mp["wos"], mp["invf"], mp["mlp_norm"], mp["wgu_t"], mp["wgus_t"],
        mp["wd_t"], mp["wds"], mp["final_norm"], mp["head_t"], mp["head_s"],
        k_all, v_all,
    )

