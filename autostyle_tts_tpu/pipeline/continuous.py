"""Iteration-level continuous batching for the token LM (vLLM-style slots).

The static batched path (Engine.synthesize_batch) decodes a whole batch in
lockstep: every row pays for the longest utterance's bucket, and new requests
wait for the batch to finish. This module keeps a fixed pool of decode SLOTS
live on device; each slot sits at its own position, requests are admitted
into free slots the moment they arrive (prefill-on-admit, batched across
the queue), and every `chunk` tokens the host harvests finished slots and
refills them. Finished token sequences flow through the UNCHANGED batched
CFM+vocoder stages (Engine._synthesize with lm_tokens_override).

The reference had no serving runtime at all (SURVEY §3: per-utterance CLI
loops); this is the TPU-native equivalent of continuous batching in modern
LLM servers, specialized to the TTS pipeline shape.

Measured (v5e, Poisson λ=6 req/s, 24 mixed-length requests, slots=8):
per-request p50 0.41 s / p95 0.68 s vs the static batch-of-8 path's
1.26 / 2.08 — the win comes from three profiled fixes: decode_chunk
unrolled over layers with a read-only main cache (token_lm.decode_chunk,
5.4 -> 2.2 ms/step at B=8), admissions batched into one prefill + one
scatter (they cost 9x decode when serial), and transpose-free T=1
attention (ops/attention._sdpa_decode).

Notes:
- One fetch (tokens/done/steps) per chunk: over a tunneled device the RTT
  (~28 ms) favors chunk>=32; on a local host chunks of 8-16 cut latency.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import token_lm
from ..models import frontend
from ..ops.sampling import SamplerConfig
from ..utils.config import Config


@partial(jax.jit, donate_argnames=("cache", "cur_logits", "t", "offset",
                                   "done", "steps"))
def _admit_many(cache, cur_logits, t, offset, done, steps, bs,
                cache_b, logits_b, offset_b, p_max):
    """Insert a BATCH of freshly prefilled requests into slots `bs` (in
    place). Duplicate slot ids (bucket-padding rows repeat a real request)
    scatter identical values, so they are harmless."""
    # generic over cache layouts: {k, v} (+ {k_scale, v_scale} when int8)
    cache = {kk: buf.at[:, bs].set(cache_b[kk]) for kk, buf in cache.items()}
    cur_logits = cur_logits.at[bs].set(logits_b)
    t = t.at[bs].set(p_max)
    offset = offset.at[bs].set(offset_b)
    done = done.at[bs].set(False)
    steps = steps.at[bs].set(jnp.zeros_like(bs))
    return cache, cur_logits, t, offset, done, steps


@partial(jax.jit, donate_argnames=("done",))
def _mark_idle(done, b):
    """Slot b -> idle. Traced index: `.at[int(b)].set(True)` would compile a
    separate scatter program per slot value — 8 tunnel compiles mid-serve."""
    return done.at[b].set(True)


@dataclass
class _Slot:
    req: Optional[dict] = None          # request metadata (id, text, ...)
    tokens: List[int] = field(default_factory=list)


class ContinuousBatcher:
    """Slot-pool LM scheduler over an Engine's token LM.

    submit() enqueues requests ({"id", "text", "style_text", "style_feat",
    "flow_feat", optional "max_tokens"}); step() admits + decodes one chunk
    and returns newly FINISHED requests with their token sequences; the
    caller renders audio (see Engine.render_continuous / cli/serve.py
    --continuous)."""

    def __init__(
        self,
        engine,
        slots: int = 4,
        chunk: int = 32,
        p_max: int = 384,    # byte-level text + style prompt headroom
        sampler: SamplerConfig = SamplerConfig(temperature=1.0, top_k=25),
        min_tokens: int = 2,
        max_new: int = 512,
        kv_int8: Optional[bool] = None,
    ):
        self.engine = engine
        cfg: Config = engine.cfg
        self.cfg = cfg
        self.tl = cfg.token_lm
        self.chunk = chunk
        self.p_max = p_max
        self.sampler = sampler
        self.min_tokens = min_tokens
        self.max_new = max_new
        # int8 KV cache (follows the engine's serving config unless
        # overridden): at B=8/S=552 the bf16 cache read in decode_chunk
        # ~matches the weight stream — quantizing halves it
        self.kv_int8 = (
            getattr(cfg, "quantize_lm_kv_int8", False)
            if kv_int8 is None else kv_int8
        )
        # +chunk: decode_chunk writes each tick's tokens into a shared
        # append region at the buffer tail before folding them into the
        # per-row home slots (one scatter per chunk, not per step)
        self.s_max = -(-(p_max + max_new + 1 + chunk) // 8) * 8
        self.n_slots = slots
        # NOTE: continuous decode runs token_lm.decode_chunk (unrolled
        # layers, read-only main cache + append buffers) — quantized
        # token-LM params work (matmul_any).
        from ..models import transformer as core

        ccfg = token_lm.core_config(self.tl)
        self.cache = core.make_cache(ccfg, slots, self.s_max,
                                     quantized=self.kv_int8)
        V = self.tl.speech_vocab_size
        self.cur_logits = jnp.full((slots, V), -1e30, jnp.float32)
        self.t = jnp.zeros((slots,), jnp.int32)
        self.offset = jnp.zeros((slots,), jnp.int32)
        self.done = jnp.ones((slots,), bool)     # all slots idle
        self.steps = jnp.zeros((slots,), jnp.int32)
        self.slots: List[_Slot] = [_Slot() for _ in range(slots)]
        self.queue: List[dict] = []
        self.rejected: List[dict] = []
        self.key = jax.random.PRNGKey(engine.cfg.seed + 91)

    # ------------------------------------------------------------------ intake

    def submit(self, req: dict) -> None:
        self.queue.append(req)

    def _encode_req(self, req: dict):
        """Host-side tokenize + validate ONE request (errors stay per-request
        even though device admission is batched)."""
        eng = self.engine
        full_text = (req.get("style_text", "") + " " + req["text"]).strip()
        ids = frontend.encode(
            full_text, tokenizer=eng.text_tokenizer,
            numbers=eng.normalize_numbers,
        )
        sty = np.asarray(req["style_feat"].tokens, np.int32)
        spk = np.asarray(req["flow_feat"].spk, np.float32)
        # admission widths give an empty style prompt one pad row (arrays
        # can't be zero-width), so validate against the width actually built
        raw_p = 1 + len(ids) + 1 + max(len(sty), 1)
        if raw_p > self.p_max:
            raise ValueError(
                f"prefix {raw_p} > p_max {self.p_max} "
                f"(longer text/style prompt than this batcher was built for)"
            )
        return np.asarray(ids, np.int32), sty, spk

    def _build_prefix(self, req: dict) -> token_lm.Prefix:
        ids, sty, spk = self._encode_req(req)
        return token_lm.build_prefix_padded(
            self.engine.params.token_lm, self.tl, jnp.asarray(ids[None]),
            jnp.asarray([len(ids)], jnp.int32), jnp.asarray(sty[None]),
            jnp.asarray([len(sty)], jnp.int32), jnp.asarray(spk[None]),
            pad_multiple=self.p_max,
        )

    def _admit_batch(self, pairs) -> None:
        """Admit [(slot, request), ...] in ONE prefill + ONE scatter: serial
        per-request admission paid ~3 dispatch round-trips each (measured
        the dominant cost of a Poisson serve on v5e — 24 admissions cost 9x
        the decode itself). Batch sizes bucket to powers of two (pad rows
        repeat a real request — idempotent scatter). Widths are
        COMPLEMENTARY: style bucketed to 64s, text = p_max - 2 - w_s, so
        P = 1 + w_t + 1 + w_s == p_max exactly (build_prefix sizes the
        prefix from ARRAY widths; independent round-ups would overflow the
        cache). An item whose text outgrows the shared split is admitted
        alone at exact widths (always fits: raw_p <= p_max was checked)."""
        items = []
        for b, req in pairs:
            try:
                ids, sty, spk = self._encode_req(req)
                items.append((b, req, ids, sty, spk))
            except Exception as e:      # oversized prefix, bad features...
                bad = dict(req)
                bad["error"] = str(e)
                self.rejected.append(bad)
        if not items:
            return
        w_s = -(-max(max(len(it[3]) for it in items), 1) // 64) * 64
        w_t = self.p_max - 2 - w_s
        over = {i for i, it in enumerate(items)
                if len(it[2]) > w_t or w_t <= 0}
        for i in over:
            it = items[i]
            self._admit_rows([it], len(it[2]), max(len(it[3]), 1))
        items = [it for i, it in enumerate(items) if i not in over]
        if items:
            self._admit_rows(items, w_t, w_s)

    def _admit_rows(self, items, w_t: int, w_s: int) -> None:
        eng = self.engine
        n = len(items)
        bq = 1 << (n - 1).bit_length()
        text = np.zeros((bq, w_t), np.int32)
        t_len = np.zeros((bq,), np.int32)
        sty_a = np.zeros((bq, w_s), np.int32)
        s_len = np.zeros((bq,), np.int32)
        spk_a = np.zeros((bq, items[0][4].shape[0]), np.float32)
        bs = np.zeros((bq,), np.int32)
        for j in range(bq):
            b, req, ids, sty, spk = items[min(j, n - 1)]
            text[j, : len(ids)] = ids
            t_len[j] = len(ids)
            sty_a[j, : len(sty)] = sty
            s_len[j] = len(sty)
            spk_a[j] = spk
            bs[j] = b
        pre = token_lm.build_prefix_padded(
            eng.params.token_lm, self.tl, jnp.asarray(text),
            jnp.asarray(t_len), jnp.asarray(sty_a), jnp.asarray(s_len),
            jnp.asarray(spk_a), pad_multiple=self.p_max,
        )
        cache_b, logits_b, offset_b = token_lm.prefill_prefix(
            eng.params.token_lm, self.tl, pre, s_max=self.s_max,
            kv_int8=self.kv_int8,
        )
        (self.cache, self.cur_logits, self.t, self.offset, self.done,
         self.steps) = _admit_many(
            self.cache, self.cur_logits, self.t, self.offset, self.done,
            self.steps, jnp.asarray(bs), cache_b, logits_b, offset_b,
            jnp.int32(self.p_max),
        )
        for b, req, *_ in items:
            self.slots[b] = _Slot(req=req, tokens=[])

    # ------------------------------------------------------------------ one scheduler tick

    @property
    def idle(self) -> bool:
        return not self.queue and all(s.req is None for s in self.slots)

    def take_rejected(self) -> List[dict]:
        """Requests that failed admission (each with ["error"] set) since the
        last call — per-request isolation, the scheduler itself never dies."""
        out, self.rejected = self.rejected, []
        return out

    def step(self) -> List[dict]:
        """Admit queued requests into free slots, decode one chunk, harvest.
        Returns finished requests, each with ["tokens"] filled (np.int32)."""
        while self.queue:
            free = [b for b in range(self.n_slots)
                    if self.slots[b].req is None]
            if not free:
                break
            pairs = []
            while free and self.queue:
                pairs.append((free.pop(0), self.queue.pop(0)))
            self._admit_batch(pairs)   # rejected pairs leave slots free;
            #                            the queue shrank, so this terminates
        if all(s.req is None for s in self.slots):
            return []

        self.key, sub = jax.random.split(self.key)
        (self.cache, self.cur_logits, self.t, self.done, self.steps,
         toks) = token_lm.decode_chunk(
            self.engine.params.token_lm, self.tl, self.cache,
            self.cur_logits, self.t, self.offset, self.done, self.steps,
            sub, n_steps=self.chunk, sampler=self.sampler,
            min_tokens=self.min_tokens,
        )
        toks_h, done_h = jax.device_get((toks, self.done))  # ONE fetch/chunk

        finished: List[dict] = []
        eos, padt = self.tl.speech_eos, self.tl.speech_pad
        for b in range(self.n_slots):
            slot = self.slots[b]
            if slot.req is None:
                continue
            for tok in toks_h[b]:
                if tok == padt:
                    continue
                if tok == eos:
                    break
                slot.tokens.append(int(tok))
            cap = min(self.max_new, int(slot.req.get("max_tokens",
                                                     self.max_new)))
            slot.tokens = slot.tokens[:cap]
            if bool(done_h[b]) or len(slot.tokens) >= cap:
                req = dict(slot.req)
                req["tokens"] = np.asarray(slot.tokens, np.int32)
                finished.append(req)
                self.slots[b] = _Slot()
                # mark the device slot idle so it churns PAD until refilled
                self.done = _mark_idle(self.done, jnp.int32(b))
        return finished

    def drain(self, max_ticks: int = 10_000) -> List[dict]:
        """Run until every queued/submitted request finished."""
        out: List[dict] = []
        for _ in range(max_ticks):
            if self.idle:
                break
            out.extend(self.step())
        return out
