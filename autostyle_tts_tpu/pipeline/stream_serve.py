"""Concurrent streaming TTS serving: N live sessions, shared decode.

Combines the two round-3 serving paths into the production shape neither
covers alone: `pipeline/continuous.py` gives per-request admission latency
(slot-pool LM decode, batched admissions) but emits audio only when a
request FINISHES; `Engine._synthesize_stream` gives ~chunk-latency first
audio but serves one utterance at a time. This scheduler runs the slot
pool for token decode and, every tick, renders one windowed CFM+vocoder
chunk per session that has a full chunk of undelivered tokens — so N
callers each hear audio while every other session is still decoding.

The reference has neither streaming nor a serving runtime (SURVEY §2.3.1
API surface is stream=False-only; §3's entry points are per-utterance CLI
loops) — this is a beyond-reference capability built from tested parts:
token decode is ContinuousBatcher's (greedy parity with the one-shot
path), and chunk rendering is the SAME `_stream_chunk` program as
single-session streaming (seam continuity pinned by
tests/test_streaming.py), with the mel context chained per session.

Per tick: one decode-chunk program + one small token upload and one
window render per chunk-ready session + one wav fetch each. Host traffic
stays O(audio emitted), not O(sessions x vocab).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import SamplerConfig
from . import engine as engine_mod
from .continuous import ContinuousBatcher

_SS_KEY = "_stream_session"


@dataclass
class _Session:
    req: dict
    flow_feat: object
    tokens: List[int] = field(default_factory=list)
    emitted: int = 0
    mel_ctx: Optional[jnp.ndarray] = None
    decode_done: bool = False
    done: bool = False


@dataclass
class StreamEvent:
    """One scheduler output: kind 'chunk' carries wav samples (float32,
    output rate); kind 'done' closes the session (wav is empty)."""

    session: str
    kind: str              # "chunk" | "done" | "error"
    wav: np.ndarray
    error: str = ""


class StreamingScheduler:
    """submit() -> session id; step() -> list of StreamEvent. Drive it from
    a serving loop (cli/serve.py --continuous --stream): call step()
    whenever there is work (`idle` says when there is none)."""

    def __init__(
        self,
        engine,
        slots: int = 4,
        chunk_tokens: Optional[int] = None,
        max_seconds: float = 20.0,
        sampler: SamplerConfig = SamplerConfig(temperature=1.0, top_k=25),
        p_max: int = 384,
    ):
        self.engine = engine
        cfg = engine.cfg
        tl = cfg.token_lm
        # one audio chunk per decode chunk: the batcher tick IS the stream
        # cadence (default ~0.64 s of audio, as in _synthesize_stream)
        self.chunk = chunk_tokens or max(8, (2 * tl.token_rate) // 3)
        self.max_new = int(max_seconds * tl.token_rate)
        self.bat = ContinuousBatcher(
            engine, slots=slots, chunk=self.chunk, p_max=p_max,
            sampler=sampler, max_new=self.max_new,
        )
        # static token-buffer width: one compiled render program family
        self.buf_w = -(-self.max_new // 128) * 128
        self.hop = cfg.audio.hop_length
        self.sessions: Dict[str, _Session] = {}        # live
        self.finished: Dict[str, _Session] = {}        # kept for inspection;
        #   a long-running server should drain this (take_finished)
        self._next = 0

    # ------------------------------------------------------------------ intake

    def submit(self, req: dict) -> str:
        """req: {"text", "style_text", "style_feat", "flow_feat", optional
        "max_tokens"} (the ContinuousBatcher contract). Returns session id."""
        sid = f"s{self._next}"
        self._next += 1
        breq = dict(req)
        breq[_SS_KEY] = sid
        breq.setdefault("id", sid)
        self.sessions[sid] = _Session(req=breq, flow_feat=req["flow_feat"])
        self.bat.submit(breq)
        return sid

    @property
    def idle(self) -> bool:
        return self.bat.idle and not self.sessions

    def take_finished(self) -> Dict[str, _Session]:
        """Drain completed sessions (a long-running server calls this so
        per-session state doesn't accumulate)."""
        out, self.finished = self.finished, {}
        return out

    # ------------------------------------------------------------------ tick

    def _chunk_due(self, sess: _Session) -> bool:
        avail = len(sess.tokens) - sess.emitted
        return avail > 0 and (avail >= self.chunk or sess.decode_done)

    def _render_batch(self, due: List[_Session]) -> Dict[int, np.ndarray]:
        """Render one window for EVERY chunk-ready session in ONE program +
        ONE fetch (sessions grouped by flow-prompt bucket). Per-session
        sequential renders serialized a render+RTT leg per caller and made
        4-session TTFB ~3.5x single-session (r4 VERDICT #8); the batched
        window is the same `_stream_chunk` program with per-row scalars.
        Returns {index in `due`: wav chunk}."""
        eng = self.engine
        out: Dict[int, np.ndarray] = {}
        groups: Dict[tuple, List[int]] = {}
        devs = []
        for i, sess in enumerate(due):
            dev = eng._flow_stream_dev(sess.flow_feat)
            devs.append(dev)
            groups.setdefault(dev[0], []).append(i)
        for (fp_w, up, M), idxs in groups.items():
            B = len(idxs)
            buf = np.zeros((B, self.buf_w), np.int32)
            gl = np.zeros((B,), np.int32)
            em = np.zeros((B,), np.int32)
            for r, i in enumerate(idxs):
                sess = due[i]
                n_tok = len(sess.tokens)
                buf[r, :n_tok] = sess.tokens
                gl[r] = n_tok
                em[r] = sess.emitted
                if sess.mel_ctx is None:
                    sess.mel_ctx = jnp.zeros(
                        (1, self.chunk * up, M), jnp.float32)
            d_prompt = jnp.concatenate([devs[i][1] for i in idxs], axis=0)
            d_pmel = jnp.concatenate([devs[i][2] for i in idxs], axis=0)
            d_np = jnp.stack([devs[i][3] for i in idxs])
            d_nmel = jnp.stack([devs[i][4] for i in idxs])
            spk = jnp.concatenate([devs[i][5] for i in idxs], axis=0)
            mel_ctx = jnp.concatenate(
                [due[i].mel_ctx for i in idxs], axis=0)
            eng.key, sub = jax.random.split(eng.key)
            packed, mel_out = eng._stream_chunk(
                jnp.asarray(buf), jnp.asarray(gl), jnp.asarray(em),
                d_prompt, d_np, d_pmel, d_nmel, spk, mel_ctx, sub,
                chunk=self.chunk, fp_w=fp_w,
            )
            wav_np, vals = engine_mod._unpack_vals(jax.device_get(packed), 2)
            for r, i in enumerate(idxs):
                n_c = int(vals[r, 0])
                if n_c <= 0:
                    continue
                sess = due[i]
                sess.mel_ctx = mel_out[r : r + 1]
                sess.emitted += n_c
                out[i] = wav_np[r, : n_c * up * self.hop].astype(np.float32)
        return out

    def step(self) -> List[StreamEvent]:
        """Advance decode by one chunk, then emit due audio chunks. Safe to
        call with no active work (returns [])."""
        events: List[StreamEvent] = []
        if not self.bat.idle:
            finished = self.bat.step()
            for bad in self.bat.take_rejected():
                sid = bad.get(_SS_KEY)
                if sid and sid in self.sessions:
                    self.sessions[sid].done = True
                    self.sessions[sid].decode_done = True
                    events.append(StreamEvent(
                        sid, "error", np.zeros(0, np.float32),
                        error=bad.get("error", ""),
                    ))
            # live slots: copy token progress into sessions
            for slot in self.bat.slots:
                if slot.req is not None and _SS_KEY in slot.req:
                    sess = self.sessions.get(slot.req[_SS_KEY])
                    if sess is not None:
                        sess.tokens = list(slot.tokens)
            for req in finished:
                sess = self.sessions.get(req.get(_SS_KEY, ""))
                if sess is not None:
                    sess.tokens = [int(t) for t in req["tokens"]]
                    sess.decode_done = True
        # render at most one chunk per session per tick (stream cadence) —
        # ALL due sessions in one batched program + one fetch
        order = list(self.sessions)
        due_ids = [sid for sid in order
                   if not self.sessions[sid].done
                   and self._chunk_due(self.sessions[sid])]
        rendered = self._render_batch([self.sessions[sid] for sid in due_ids])
        wavs = {due_ids[i]: w for i, w in rendered.items()}
        for sid in order:
            sess = self.sessions[sid]
            if not sess.done:
                wav = wavs.get(sid)
                if wav is not None:
                    events.append(StreamEvent(sid, "chunk", wav))
                if sess.decode_done and sess.emitted >= len(sess.tokens):
                    sess.done = True
                    events.append(
                        StreamEvent(sid, "done", np.zeros(0, np.float32))
                    )
            if sess.done:
                sess.mel_ctx = None            # free the device buffer
                self.finished[sid] = self.sessions.pop(sid)
        return events

    def run(self, max_ticks: int = 10_000) -> Dict[str, List[StreamEvent]]:
        """Drive to completion; returns events grouped per session (order
        preserved). For tests and batch use — a server calls step()."""
        out: Dict[str, List[StreamEvent]] = {}
        for _ in range(max_ticks):
            if self.idle:
                break
            for ev in self.step():
                out.setdefault(ev.session, []).append(ev)
        return out
