"""Batch serving loop: JSONL requests in -> 24 kHz wavs + JSONL responses out.

The production-serving runtime the reference never had (its serving story was
one-off CLI scripts, SURVEY §3). Requests stream from a file or stdin, are
dynamically batched (flush at --batch requests or --max_wait_ms, whichever
first), and run through the batched synthesis path (one device program per
stage per batch). Responses are emitted as JSON lines.

Request line:
  {"id": "r1", "text": "...", "style_text": "...",
   "style_wav": "/p/s.wav" | "style_index": 3,      # DB row (needs --style_db)
   "timbre_wav": "/p/t.wav" | "timbre_id": "w1"}     # registered via --timbre_map

Response line:
  {"id": "r1", "wav": "<result_dir>/r1.wav", "samples": N,
   "audio_s": ..., "latency_ms": ...}
  or {"id": "r1", "error": "..."} — per-request failures never kill the loop.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np
from pathlib import Path
from typing import Dict, List, Optional, TextIO

from ..utils.native_audio import load_wav_fast
from .common import add_common_args, build_engine, save_wav_22050_or_24k
from .tts_with_rag import parse_timbre_map


def _read_batch(stream: TextIO, batch: int, max_wait_ms: float) -> List[dict]:
    """Collect up to `batch` request lines; flush on EOF or max_wait."""
    import select

    out: List[dict] = []
    deadline = None
    while len(out) < batch:
        if deadline is not None:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            if stream is sys.stdin:
                r, _, _ = select.select([stream], [], [], remaining)
                if not r:
                    break
        line = stream.readline()
        if not line:
            break  # EOF
        line = line.strip()
        if not line:
            continue
        try:
            out.append(json.loads(line))
        except json.JSONDecodeError as e:
            print(json.dumps({"error": f"bad request line: {e}"}), flush=True)
            continue
        if deadline is None:
            deadline = time.perf_counter() + max_wait_ms / 1000.0
    return out


def _bounded_reader(stream, limit: int, submit):
    """Shared request-line reader for the continuous/streaming loops.

    Returns try_read(block) -> False on EOF. Non-blocking when decode work
    is in flight (stdin polled via select), and bounded to `limit` lines
    per tick so a FILE input doesn't featurize every request (each a device
    round-trip) before the first scheduler step runs. Bad lines report as
    {"error": ...} without stopping the loop."""
    import select

    def try_read(block: bool) -> bool:
        taken = 0
        while taken < limit:
            if stream is sys.stdin and not block:
                r, _, _ = select.select([stream], [], [], 0)
                if not r:
                    return True
            line = stream.readline()
            if not line:
                return False
            block = False
            line = line.strip()
            if not line:
                continue
            taken += 1
            try:
                submit(json.loads(line))
            except Exception as e:
                print(json.dumps({"error": str(e)}), flush=True)
        return True

    return try_read


def _serve_streaming(args, engine, stream, result_dir, prompt_of, out_sr):
    """--continuous --stream loop: every request is a live streaming session
    (pipeline/stream_serve.StreamingScheduler). Emits one JSONL line per
    audio chunk ({"id", "chunk", "wav", "ttfb_ms" on the first}) and a
    summary line with the stitched full wav when a session completes."""
    import numpy as np

    from ..pipeline.stream_serve import StreamingScheduler

    sch = StreamingScheduler(
        engine, slots=args.slots, max_seconds=args.max_seconds,
        p_max=args.p_max,
    )
    meta: dict = {}

    def featurize_req(req):
        req["_t0"] = time.perf_counter()
        for key, kind in (("style_feat", "style"), ("flow_feat", "timbre")):
            v = prompt_of(req, kind)
            req[key] = (
                v if hasattr(v, "tokens")
                else engine.prompt_features([np.asarray(v).reshape(-1)])[0]
            )
        return req

    def _submit(raw: dict) -> None:
        req = featurize_req(raw)
        sid = sch.submit(req)
        meta[sid] = {
            "req": req, "chunks": [], "n": 0,
            "rid": str(req.get("id", sid)),
        }

    try_read = _bounded_reader(stream, args.slots, _submit)

    served = 0
    eof = False
    try:
        while True:
            if not eof:
                eof = not try_read(block=sch.idle)
            if eof and sch.idle:
                break
            for ev in sch.step():
                m = meta[ev.session]
                t0 = m["req"].get("_t0", time.perf_counter())
                if ev.kind == "chunk":
                    cp = result_dir / f"{m['rid']}.chunk{m['n']:03d}.wav"
                    save_wav_22050_or_24k(cp, ev.wav, engine)
                    line = {
                        "id": m["rid"], "chunk": m["n"], "wav": str(cp),
                        "samples": int(ev.wav.size),
                    }
                    if m["n"] == 0:
                        line["ttfb_ms"] = round(
                            (time.perf_counter() - t0) * 1000, 1
                        )
                    print(json.dumps(line), flush=True)
                    m["chunks"].append(ev.wav)
                    m["n"] += 1
                elif ev.kind == "error":
                    print(json.dumps(
                        {"id": m["rid"], "error": ev.error}
                    ), flush=True)
                else:  # done
                    wav = (
                        np.concatenate(m["chunks"])
                        if m["chunks"] else np.zeros(0, np.float32)
                    )
                    out = result_dir / f"{m['rid']}.wav"
                    save_wav_22050_or_24k(out, wav, engine)
                    served += 1
                    print(json.dumps({
                        "id": m["rid"], "wav": str(out),
                        "samples": int(wav.size), "chunks": m["n"],
                        "audio_s": round(wav.size / out_sr, 3),
                        "latency_ms": round(
                            (time.perf_counter() - t0) * 1000, 1
                        ),
                    }), flush=True)
    finally:
        if stream is not sys.stdin:
            stream.close()
    print(json.dumps({"served": served, "done": True}), flush=True)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--requests", type=str, default="-",
                   help="request JSONL path, or '-' for stdin")
    p.add_argument("--result_dir", type=str, required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=100.0)
    p.add_argument("--style_db", type=str, default=None,
                   help="StyleStore snapshot (enables style_index requests)")
    p.add_argument("--timbre_map", type=str, default=None,
                   help="'id=path,...' or JSON — registered timbre_id values")
    p.add_argument("--max_seconds", type=float, default=20.0)
    p.add_argument("--continuous", action="store_true",
                   help="iteration-level continuous batching: requests join "
                        "a live slot pool mid-decode instead of waiting for "
                        "the current batch (pipeline/continuous.py)")
    p.add_argument("--slots", type=int, default=4,
                   help="--continuous: concurrent decode slots")
    p.add_argument("--chunk", type=int, default=32,
                   help="--continuous: decode steps between scheduler ticks")
    p.add_argument("--p_max", type=int, default=384,
                   help="--continuous: prefix budget (text + style tokens); "
                        "longer requests are rejected per-request")
    p.add_argument("--stream", action="store_true",
                   help="with --continuous: emit audio CHUNKS as each "
                        "session decodes (pipeline/stream_serve.py) — every "
                        "request hears first audio while others still "
                        "decode; chunk files land next to the final wav")
    args = p.parse_args(argv)

    engine = build_engine(args)
    sr = engine.cfg.audio.prompt_sample_rate
    out_sr = engine.cfg.audio.sample_rate
    result_dir = Path(args.result_dir)
    result_dir.mkdir(parents=True, exist_ok=True)

    store = None
    if args.style_db:
        from ..retrieval import StyleStore

        store = StyleStore.load(args.style_db)
    timbres: Dict[str, object] = {}
    if args.timbre_map:
        timbres = {
            k: load_wav_fast(v, sr) for k, v in parse_timbre_map(args.timbre_map).items()
        }
    wav_cache: Dict[str, object] = {}

    def prompt_of(req: dict, kind: str):
        """kind in {style, timbre}: resolve wav/id/index to wav or features."""
        if kind == "style" and "style_index" in req:
            if store is None:
                raise ValueError("style_index requires --style_db")
            return engine.prompt_features_from_store(store, [int(req["style_index"])])[0]
        if kind == "timbre" and "timbre_id" in req:
            return timbres[str(req["timbre_id"])]
        path = req[f"{kind}_wav"]
        if path not in wav_cache:
            wav_cache[path] = load_wav_fast(path, sr)
        return wav_cache[path]

    def emit(req, wav, t0):
        nonlocal served
        rid = str(req.get("id", served))
        out = result_dir / f"{rid}.wav"
        save_wav_22050_or_24k(out, wav, engine)
        served += 1
        print(json.dumps({
            "id": rid, "wav": str(out), "samples": int(wav.size),
            "audio_s": round(wav.size / out_sr, 3),
            "latency_ms": round((time.perf_counter() - t0) * 1000, 1),
        }), flush=True)

    stream = sys.stdin if args.requests == "-" else open(args.requests, encoding="utf-8")
    served = 0
    if args.continuous and args.stream:
        _serve_streaming(args, engine, stream, result_dir, prompt_of, out_sr)
        return
    if args.continuous:
        from ..pipeline.continuous import ContinuousBatcher

        tl = engine.cfg.token_lm
        batcher = ContinuousBatcher(
            engine, slots=args.slots, chunk=args.chunk, p_max=args.p_max,
            max_new=int(args.max_seconds * tl.token_rate),
        )

        def featurize_req(req):
            req["_t0"] = time.perf_counter()
            for key, kind in (("style_feat", "style"), ("flow_feat", "timbre")):
                v = prompt_of(req, kind)
                req[key] = (
                    v if hasattr(v, "tokens")
                    else engine.prompt_features([np.asarray(v).reshape(-1)])[0]
                )
            return req

        try_read = _bounded_reader(
            stream, args.slots, lambda raw: batcher.submit(featurize_req(raw))
        )

        eof = False
        try:
            while True:
                if not eof:
                    # block for input only when nothing is in flight
                    eof = not try_read(block=batcher.idle)
                if eof and batcher.idle:
                    break
                finished = batcher.step()
                wavs = engine.synthesize_from_tokens(
                    finished, max_seconds=args.max_seconds
                )
                for req, wav in zip(finished, wavs):
                    emit(req, wav, req.get("_t0", time.perf_counter()))
                for req in batcher.take_rejected():
                    print(json.dumps(
                        {"id": req.get("id"), "error": req["error"]}
                    ), flush=True)
        finally:
            if stream is not sys.stdin:
                stream.close()
        print(json.dumps({"served": served, "done": True}), flush=True)
        return

    try:
        while True:
            requests = _read_batch(stream, args.batch, args.max_wait_ms)
            if not requests:
                break
            t0 = time.perf_counter()
            texts, stexts, styles, timbs, good = [], [], [], [], []
            for req in requests:
                try:
                    styles.append(prompt_of(req, "style"))
                    timbs.append(prompt_of(req, "timbre"))
                    texts.append(req["text"])
                    stexts.append(req.get("style_text", ""))
                    good.append(req)
                except Exception as e:
                    print(json.dumps(
                        {"id": req.get("id"), "error": str(e)}
                    ), flush=True)
            if not good:
                continue
            try:
                wavs = engine.synthesize_batch(
                    texts, stexts, styles, timbs, max_seconds=args.max_seconds
                )
            except Exception as e:
                for req in good:
                    print(json.dumps({"id": req.get("id"), "error": str(e)}),
                          flush=True)
                continue
            for req, wav in zip(good, wavs):
                emit(req, wav, t0)
    finally:
        if stream is not sys.stdin:
            stream.close()
    print(json.dumps({"served": served, "done": True}), flush=True)


if __name__ == "__main__":
    from .common import run_cli

    run_cli(main)
