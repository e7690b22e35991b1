"""Iteration-level continuous batching for the token LM (vLLM-style slots).

The static batched path (Engine.synthesize_batch) decodes a whole batch in
lockstep: every row pays for the longest utterance's bucket, and new requests
wait for the batch to finish. This module keeps a fixed pool of decode SLOTS
live on device; each slot sits at its own position in its own cache region
(per-row cache_start -> batched scatter, models/transformer.py), requests are
admitted into free slots the moment they arrive (prefill-on-admit), and every
`chunk` tokens the host harvests finished slots and refills them. Finished
token sequences flow through the UNCHANGED batched CFM+vocoder stages
(Engine._synthesize with lm_tokens_override).

The reference had no serving runtime at all (SURVEY §3: per-utterance CLI
loops); this is the TPU-native equivalent of continuous batching in modern
LLM servers, specialized to the TTS pipeline shape.

Notes:
- One fetch (tokens/done/steps) per chunk: over a tunneled device the RTT
  (~28 ms) favors chunk>=32; on a local host chunks of 8-16 cut latency.
- Slot admission is one jitted cache-row insert (donated buffers, no copy
  of the pool) + a prefill program per request.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import token_lm
from ..models import frontend
from ..ops.sampling import SamplerConfig
from ..utils.config import Config


@partial(jax.jit, donate_argnames=("cache", "cur_logits", "t", "offset",
                                   "done", "steps"))
def _admit(cache, cur_logits, t, offset, done, steps, b,
           cache_b, logits_b, offset_b, p_max):
    """Insert a freshly prefilled request into slot b (in place)."""
    cache = {
        "k": cache["k"].at[:, b].set(cache_b["k"][:, 0]),
        "v": cache["v"].at[:, b].set(cache_b["v"][:, 0]),
    }
    cur_logits = cur_logits.at[b].set(logits_b[0])
    t = t.at[b].set(p_max)
    offset = offset.at[b].set(offset_b[0])
    done = done.at[b].set(False)
    steps = steps.at[b].set(0)
    return cache, cur_logits, t, offset, done, steps


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
        self.s_max = -(-(p_max + max_new + 1) // 8) * 8
        self.n_slots = slots
        # NOTE: continuous decode runs the scanned XLA path (B>1, per-row
        # positions) — quantized token-LM params work (matmul_any), int8 KV
        # cache does not (scatter path is bf16-only).
        from ..models import transformer as core

        ccfg = token_lm.core_config(self.tl)
        self.cache = core.make_cache(ccfg, slots, self.s_max)
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

    def _build_prefix(self, req: dict) -> token_lm.Prefix:
        eng = self.engine
        full_text = (req.get("style_text", "") + " " + req["text"]).strip()
        ids = frontend.encode(
            full_text, tokenizer=eng.text_tokenizer,
            numbers=eng.normalize_numbers,
        )
        sty = np.asarray(req["style_feat"].tokens, np.int32)
        spk = np.asarray(req["flow_feat"].spk, np.float32)[None]
        # exact widths so P = p_max after pad_prefix
        raw_p = 1 + len(ids) + 1 + len(sty)
        if raw_p > self.p_max:
            raise ValueError(
                f"prefix {raw_p} > p_max {self.p_max} "
                f"(longer text/style prompt than this batcher was built for)"
            )
        text = jnp.asarray(np.asarray(ids, np.int32)[None])
        return token_lm.build_prefix_padded(
            eng.params.token_lm, self.tl, text,
            jnp.asarray([len(ids)], jnp.int32), jnp.asarray(sty[None]),
            jnp.asarray([len(sty)], jnp.int32), jnp.asarray(spk),
            pad_multiple=self.p_max,
        )

    def _admit_one(self, b: int, req: dict) -> None:
        pre = self._build_prefix(req)
        cache_b, logits_b, offset_b = token_lm.prefill_prefix(
            self.engine.params.token_lm, self.tl, pre, s_max=self.s_max
        )
        (self.cache, self.cur_logits, self.t, self.offset, self.done,
         self.steps) = _admit(
            self.cache, self.cur_logits, self.t, self.offset, self.done,
            self.steps, jnp.int32(b), cache_b, logits_b, offset_b,
            jnp.int32(self.p_max),
        )
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
        for b in range(self.n_slots):
            while self.slots[b].req is None and self.queue:
                req = self.queue.pop(0)
                try:
                    self._admit_one(b, req)
                except Exception as e:     # oversized prefix, bad features...
                    req = dict(req)
                    req["error"] = str(e)
                    self.rejected.append(req)
        if all(s.req is None for s in self.slots):
            return []

        self.key, sub = jax.random.split(self.key)
        (self.cache, self.cur_logits, self.t, self.done, self.steps,
         toks) = token_lm.decode_chunk(
            self.engine.params.token_lm, self.tl, self.cache,
            self.cur_logits, self.t, self.offset, self.done, self.steps, sub,
            n_steps=self.chunk, sampler=self.sampler,
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
                self.done = self.done.at[b].set(True)
        return finished

    def drain(self, max_ticks: int = 10_000) -> List[dict]:
        """Run until every queued/submitted request finished."""
        out: List[dict] = []
        for _ in range(max_ticks):
            if self.idle:
                break
            out.extend(self.step())
        return out
