"""End-to-end benchmark: p50 latency of one tts_with_style_timbre utterance.

Reference baseline (BASELINE.md): "<5s inference time" per utterance on a
single GPU (README.md:24); rebuild target <1s p50 per 24 kHz utterance on one
v5e chip (BASELINE.json). This bench runs the FULL flagship pipeline at
production geometry on whatever device JAX selects (the driver uses the TPU).

Headline metric = the production serving path: style + timbre prompts come
precomputed from the style DB (the framework featurizes prompts ONCE at
insert time and serves from on-device artifacts — SURVEY §7 hard part 5;
tts_with_rag --style_db). Texts are a mixed-length sample of the reference's
own 64-utterance retrieval run (output_emb/search_results.json), not one
fixed sentence.

Honest accounting (round-3): the measured host-fetch RTT floor is reported
and SUBTRACTED from each synced per-stage span (every span pays one tunnel
round-trip the pipelined e2e path pays only once), so
`stage_p50_ms_device` sums to ≈ the cold-path p50 minus one RTT; the
LM stage is split into prefill vs decode via two bucket timings.

Extras also carry: streaming TTFB (must beat the non-streaming p50 —
round-2 VERDICT #2), retrieval QPS both through-transport and device-side,
per-request Poisson-arrival latency for continuous vs static batching
(VERDICT #6), and the 3B-geometry int8 embedder's production hot-loop
timings (VERDICT #4: bio 250 tok, emotion 10 tok, embed fwd —
milvus/search_json.py:382-449).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = reference_5s / our_p50 (higher is better, >1 beats baseline).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

_T0 = time.time()

# Global wall budget: a section that would START after this many seconds is
# skipped (with a note in its slot) so the final stdout JSON line always
# prints even when the tunneled device drags every dispatch. The expected
# full run is ~28-30 min but tunnel speed swings ~1.5x day to day and the
# round-5 tail sections (f1_3b / 7B / ZH) are the round's key evidence, so
# the default only triggers under pathological slowness, not a slow tunnel.
_BUDGET_S = float(os.environ.get("ASTTTS_BENCH_BUDGET_S", "3300"))


def _mark(section: str) -> None:
    """Section progress to stderr (the driver reads only the stdout JSON)."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {section}", file=sys.stderr,
          flush=True)

BASELINE_S = 5.0  # reference README.md:24 "<5s inference time"

# mixed-length texts: the reference's production retrieval output
_SEARCH_RESULTS = Path("/root/reference/output_emb/search_results.json")
_FALLBACK_TEXTS = [
    "Okay.",
    "So what happens now?",
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "I totally called it, and honestly nobody believed me at the time.",
    "He did. In Niagara Falls.",
    "We were on the beach and he gets down on one knee and says marry me.",
    "Right.",
    "That is the most ridiculous thing I have ever heard in my life, truly.",
]


def load_texts(n: int = 8):
    texts = []
    if _SEARCH_RESULTS.exists():
        for line in _SEARCH_RESULTS.read_text().splitlines():
            line = line.strip()
            if line:
                try:
                    texts.append(json.loads(line)["zh_text"])
                except Exception:
                    pass
    if not texts:
        texts = list(_FALLBACK_TEXTS)
    # length-diverse sample: sort by length, take evenly spaced rows
    texts = sorted(set(texts), key=len)
    idx = np.linspace(0, len(texts) - 1, n).astype(int)
    return [texts[i] for i in idx]


def _p50(f, n=7):
    f()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure_rtt_floor() -> float:
    """p50 of a scalar host fetch — the tunnel round-trip every synced span
    pays once (memory: block_until_ready does not sync through the tunnel;
    only a real np.asarray transfer does)."""
    import jax.numpy as jnp

    one = jnp.float32(1.0) + 1
    return _p50(lambda: np.asarray(one + 0), 15)


def bench_lm_split(engine, cfg, texts, style_text, sty_feat, tim_feat,
                   rtt_s: float):
    """Split lm_generate into prefill vs decode by timing two gen buckets:
    decode_per_step = (t(128) - t(8)) / 120; prefill+assembly = t(8) - rtt -
    8*step (round-2 VERDICT #5: the biggest stage was unexplained)."""
    import jax
    import jax.numpy as jnp

    from autostyle_tts_tpu.models import frontend, token_lm
    from autostyle_tts_tpu.pipeline.engine import (
        TEXT_BUCKETS, TOKEN_BUCKETS, _bucket,
    )

    tl = cfg.token_lm
    tok = engine.text_tokenizer
    full = (style_text + " " + texts[-1]).strip()
    text_ids, text_lens = frontend.encode_batch(
        [full], None,
        width=_bucket(len(frontend.encode(full, tokenizer=tok)), TEXT_BUCKETS),
        tokenizer=tok,
    )
    sty_w = _bucket(len(sty_feat.tokens), TOKEN_BUCKETS)
    sty = np.zeros((1, sty_w), np.int32)
    sty[0, : len(sty_feat.tokens)] = sty_feat.tokens
    d = [jnp.asarray(x) for x in (
        text_ids, text_lens, sty, np.asarray([len(sty_feat.tokens)], np.int32),
        tim_feat.spk[None],
    )]
    key = jax.random.PRNGKey(3)
    kv8 = getattr(cfg, "quantize_lm_kv_int8", False)
    p_raw = 1 + text_ids.shape[1] + 1 + sty_w
    p_pad = -(-p_raw // 128) * 128
    times = {}
    for mn in (8, 128):
        dp = engine._fused_decode_params((1, p_pad, tl.dim), mn)

        def lm():
            g = token_lm.generate_speech_from_ids(
                engine.params.token_lm, tl, d[0], d[1], d[2], d[3], d[4],
                key, max_new_tokens=mn, kv_int8=kv8,
                fused=dp is not None, decode_params=dp,
            )
            np.asarray(g.lengths)

        times[mn] = _p50(lm)
    step_s = max((times[128] - times[8]) / 120.0, 0.0)
    prefill_s = max(times[8] - rtt_s - 8 * step_s, 0.0)
    # roofline gate (r4 VERDICT #3): a B=1 decode step must stream the LM
    # weights from HBM at least once — a step below that is a measurement
    # artifact, not a result
    from autostyle_tts_tpu.ops.quant import tree_bytes

    min_step_s = tree_bytes(engine.params.token_lm) / (HBM_BW_GBS * 1e9)
    if step_s < 0.85 * min_step_s:
        raise RuntimeError(
            f"lm decode step {step_s * 1e3:.3f} ms below the weight-stream "
            f"roofline {min_step_s * 1e3:.3f} ms — scan-difference legs "
            f"perturbed (t8={times[8]:.4f}s t128={times[128]:.4f}s)")
    out = {
        "lm_prefill_ms": round(prefill_s * 1e3, 2),
        "lm_decode_ms_per_step": round(step_s * 1e3, 3),
        "lm_total_128_ms": round(times[128] * 1e3, 1),
    }
    # int4 megakernel variant (lane-packed nibbles; weight stream halves)
    if (engine._fused_decode_params((1, p_pad, tl.dim), 128) is not None
            and token_lm.int4_lanes_ok(tl)):
        mp4 = token_lm.mega_decode_params(engine.params.token_lm, tl, bits=4)
        t4 = {}
        for mn in (8, 128):
            def lm4():
                g = token_lm.generate_speech_from_ids(
                    engine.params.token_lm, tl, d[0], d[1], d[2], d[3], d[4],
                    key, max_new_tokens=mn, kv_int8=kv8,
                    fused=True, decode_params=mp4,
                )
                np.asarray(g.lengths)

            t4[mn] = _p50(lm4)
        out["lm_int4_decode_ms_per_step"] = round(
            max((t4[128] - t4[8]) / 120.0, 0.0) * 1e3, 3
        )
        out["lm_int4_total_128_ms"] = round(t4[128] * 1e3, 1)
    return out


def bench_spec_decode(engine, cfg, texts, style_text, sty_feat, rtt_s: float,
                      gamma: int = 4):
    """Prompt-lookup speculative decode (round-3 machinery): cost of one
    (gamma+1)-token verify forward vs the standard decode step, plus the
    commits/verify this engine's weights actually accept. With random
    weights acceptance ~1 so spec loses; the trained demo fixture measures
    4.9 commits/verify at gamma=4 (tests/test_spec_decode.py) — the
    breakeven acceptance below says when it wins."""
    import jax.numpy as jnp

    from autostyle_tts_tpu.models import frontend, token_lm
    from autostyle_tts_tpu.pipeline.engine import TEXT_BUCKETS, _bucket

    tl = cfg.token_lm
    tok = engine.text_tokenizer
    full = (style_text + " " + texts[-1]).strip()
    text_ids, text_lens = frontend.encode_batch(
        [full], None,
        width=_bucket(len(frontend.encode(full, tokenizer=tok)), TEXT_BUCKETS),
        tokenizer=tok,
    )
    sty = np.zeros((1, 64), np.int32)
    n_s = min(len(sty_feat.tokens), 64)
    sty[0, :n_s] = sty_feat.tokens[:n_s]
    d = [jnp.asarray(x) for x in (
        text_ids, text_lens, sty, np.asarray([n_s], np.int32),
        sty_feat.spk[None],
    )]

    def spec():
        g = token_lm.generate_speech_spec_from_ids(
            engine.params.token_lm, tl, *d,
            max_new_tokens=128, gamma=gamma, min_tokens=128,
        )
        return np.asarray(jnp.stack([g.n_verify, g.n_commit]))

    nv, nc = spec()
    t = _p50(spec, 5)
    verify_ms = max((t - rtt_s) / max(int(nv), 1) * 1e3, 0.0)
    return {
        "gamma": gamma,
        "spec_128tok_s": round(t, 4),
        "commit_per_verify": round(int(nc) / max(int(nv), 1), 2),
        "verify_ms_per_iter": round(verify_ms, 3),
        "note": "random weights accept ~1; trained fixture measured 4.9 "
                "commits/verify (gamma=4) — win = accept > verify_ms / "
                "decode_step_ms",
    }


HBM_BW_GBS = 819.0   # v5e peak HBM bandwidth (one chip)


def bench_retrieval(rng, rtt_s: float, dim: int = 6144, n: int = 1000,
                    M1: int = 32, M2: int = 288, n_large: int = 10000,
                    ML1: int = 8, ML2: int = 40):
    """Transport QPS (what a remote client sees) AND device-side QPS
    (round-2 VERDICT #8: the transport number measured tunnel RTT, swinging
    470-810; the device number isolates the kernel). Also measures a
    10x-scale DB (the reference claims "1000+ curated speech samples",
    README.md:17 — the 10k leg shows the exact-cosine design's headroom:
    a 10k x 6144 f32 DB is 245 MB of HBM, streamed once per query batch).

    Roofline gate (r4 VERDICT #3: one captured 10k figure exceeded the HBM
    roofline ~20x — a perturbed dispatch flipped the two-point scan
    subtraction): the slope is now the median of 3 independent pairs and a
    result above what streaming the DB once per batch permits RAISES
    instead of landing in the round artifact."""
    import jax
    import jax.numpy as jnp

    from autostyle_tts_tpu.ops.topk import cosine_topk
    from autostyle_tts_tpu.retrieval import StyleStore

    store = StyleStore(dim=dim, capacity=max(1024, n))
    store.insert(
        rng.standard_normal((n, dim)).astype(np.float32),
        [{"file_id": str(i), "text": ""} for i in range(n)],
    )
    queries = rng.standard_normal((64, dim)).astype(np.float32)
    store.search_arrays(queries, k=5)  # warm
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        store.search_arrays(queries, k=5)
    transport_qps = reps * len(queries) / (time.perf_counter() - t0)

    # device-side: two scan lengths inside one program each; the time
    # DIFFERENCE is pure kernel time (RTT and dispatch cancel), so the
    # number no longer swings with tunnel weather (round-2 weak #7)
    def device_qps(db, valid, m1, m2):
        @jax.jit
        def many(qs):
            def body(acc, q):
                _, i = cosine_topk(q, db, valid, 5)
                return acc + jnp.sum(i), None

            acc, _ = jax.lax.scan(body, jnp.int32(0), qs)
            return acc

        qs1 = jnp.asarray(
            rng.standard_normal((m1, 64, dim)).astype(np.float32))
        qs2 = jnp.asarray(
            rng.standard_normal((m2, 64, dim)).astype(np.float32))
        slopes = []
        for _ in range(3):   # 3 independent pairs; median kills one
            t1 = _p50(lambda: np.asarray(many(qs1)), 5)  # perturbed dispatch
            t2 = _p50(lambda: np.asarray(many(qs2)), 5)
            slopes.append((t2 - t1) / (m2 - m1))
        per_batch = max(float(np.median(slopes)), 1e-9)
        qps = 64 / per_batch
        # HBM roofline: the db rows in HBM must stream once per 64-query
        # batch (db is padded to `capacity` rows; the kernel scans all)
        cap_rows = db.shape[0]
        max_qps = 64 * (HBM_BW_GBS * 1e9) / (cap_rows * dim * 4)
        if qps > 1.15 * max_qps:
            raise RuntimeError(
                f"retrieval device QPS {qps:.0f} exceeds the HBM roofline "
                f"{max_qps:.0f} ({cap_rows}x{dim} f32 streams once per "
                f"batch); raw slopes us/batch = "
                f"{[round(s * 1e6, 1) for s in slopes]}")
        return round(qps, 1)

    out = {
        "retrieval_qps_1k_styles_top5": round(transport_qps, 1),
        "retrieval_qps_device": device_qps(store.db, store.valid, M1, M2),
        "retrieval_batch": 64,
    }
    big = StyleStore(dim=dim, capacity=max(1024, n_large))
    step = max(n_large // 4, 1)
    for lo in range(0, n_large, step):         # chunked insert: host RAM
        m = min(step, n_large - lo)
        big.insert(
            rng.standard_normal((m, dim)).astype(np.float32),
            [{"file_id": str(lo + i), "text": ""} for i in range(m)],
        )
    out[f"retrieval_qps_device_{n_large // 1000}k"] = device_qps(
        big.db, big.valid, ML1, ML2)
    return out


def bench_continuous_poisson(engine, texts, style_text, style_feats,
                             timbre_feat, lam_rps: float = 6.0, n_req: int = 24,
                             seed: int = 5):
    """Per-request latency under Poisson arrivals (round-2 VERDICT #6: the
    slot scheduler's win condition — not waiting for the longest bucket —
    was asserted, never measured). Continuous: requests admitted mid-decode,
    audio rendered per harvest. Static: batches of 8 rendered when full.
    Returns p50/p95 per strategy at the same arrival trace."""
    from autostyle_tts_tpu.pipeline.continuous import ContinuousBatcher

    rng = np.random.default_rng(seed)
    arrivals = np.cumsum(rng.exponential(1.0 / lam_rps, n_req))
    # mixed utterance lengths (random-init LMs never emit EOS, so model the
    # production length distribution explicitly): short requests are the
    # ones continuous batching exists for — they leave their slot early
    # instead of riding the longest request's bucket
    lengths = [32, 64, 96, 128]

    def make_req(i):
        return {
            "id": i, "text": texts[i % len(texts)],
            "style_text": style_text,
            "style_feat": style_feats[i % len(style_feats)],
            "flow_feat": timbre_feat,
            "max_tokens": lengths[i % 4],
        }

    # --- continuous (scanned decode_chunk, and opt-in chunk megakernel)
    def run_continuous(**bat_kw):
        # warm every program involved: admission batches bucket to powers
        # of two, so drain at sizes 1/2/4/8 (decode/render programs warm on
        # the first pass; the rest hit the jit cache)
        bat = ContinuousBatcher(engine, slots=8, chunk=32, max_new=128,
                                **bat_kw)
        for nb in (1, 2, 4, 8):
            for j in range(nb):
                bat.submit(make_req(j))
            done = bat.drain()
        engine.synthesize_from_tokens(done[:1], max_seconds=5.0)
        for n_tok in (32, 64, 96, 128):  # warm B=1 override render buckets
            engine.synthesize_from_tokens([{
                "tokens": np.zeros(n_tok, np.int32), "flow_feat": timbre_feat,
            }], max_seconds=5.0)

        bat = ContinuousBatcher(engine, slots=8, chunk=32, max_new=128,
                                **bat_kw)
        lat = {}
        t0 = time.perf_counter()
        submitted = 0
        while len(lat) < n_req:
            now = time.perf_counter() - t0
            while submitted < n_req and arrivals[submitted] <= now:
                bat.submit(make_req(submitted))
                submitted += 1
            if bat.idle and submitted < n_req:
                time.sleep(max(arrivals[submitted] - now, 0.0))
                continue
            finished = bat.step()
            for req in finished:
                # per-request render: one compiled B=1 program, and a
                # request's latency doesn't absorb its harvest-mates'
                engine.synthesize_from_tokens([req], max_seconds=5.0)
                lat[req["id"]] = time.perf_counter() - t0 - arrivals[req["id"]]
        return lat

    lat_c = run_continuous()
    lat_m, mega_err = None, None
    try:
        # the megakernel serves the bf16 KV pool — kv_int8=False mirrors the
        # only production caller (cli/serve.py); round 3 omitted it and the
        # opt-in leg never ran (BENCH_r03 continuous_mega_error)
        lat_m = run_continuous(megakernel=True, kv_int8=False)
    except Exception as e:            # unproven Mosaic lowering on-chip:
        mega_err = f"{type(e).__name__}: {e}"[:300]   # report, don't crash

    # --- static batches of 8 on the same trace
    lat_s = {}
    t0 = time.perf_counter()
    pending = []
    submitted = 0
    while len(lat_s) < n_req:
        now = time.perf_counter() - t0
        while submitted < n_req and arrivals[submitted] <= now:
            pending.append(submitted)
            submitted += 1
        if len(pending) >= 8 or (submitted == n_req and pending):
            batch = pending[:8]
            pending = pending[8:]
            engine.synthesize_batch(
                [texts[i % len(texts)] for i in batch],
                [style_text] * len(batch),
                [style_feats[i % len(style_feats)] for i in batch],
                [timbre_feat] * len(batch),
                max_seconds=5.0,
            )
            t_now = time.perf_counter() - t0
            for i in batch:
                lat_s[i] = t_now - arrivals[i]
        elif submitted < n_req:
            time.sleep(max(arrivals[submitted] - now, 0.0))

    c = np.array(list(lat_c.values()))
    s = np.array(list(lat_s.values()))
    out = {
        "lambda_rps": lam_rps,
        "n_requests": n_req,
        "continuous_p50_s": round(float(np.percentile(c, 50)), 3),
        "continuous_p95_s": round(float(np.percentile(c, 95)), 3),
        "static8_p50_s": round(float(np.percentile(s, 50)), 3),
        "static8_p95_s": round(float(np.percentile(s, 95)), 3),
    }
    if lat_m is not None:
        m = np.array(list(lat_m.values()))
        out["continuous_mega_p50_s"] = round(float(np.percentile(m, 50)), 3)
        out["continuous_mega_p95_s"] = round(float(np.percentile(m, 95)), 3)
    elif mega_err:
        out["continuous_mega_error"] = mega_err
    return out


def bench_chunk(engine, B: int = 8, chunk: int = 32, s_max: int = 552,
                t0_fill: int = 128, n_chunks: int = 8):
    """Continuous-serving decode step: scanned token_lm.decode_chunk (bf16
    and int8 KV pools) at slot-pool geometry. Random state/weights — pure
    step-time measurement; greedy/sampled parity is covered by
    tests/test_continuous.py. Median over the warm chain + weight-stream
    roofline gate (r4 VERDICT #3/#4: the fused chunk megakernel this
    section used to carry lost 7-28x to this XLA path on-chip and its
    numbers swung 4x run-to-run — it was deleted; XLA at ~1.9 ms/step sits
    near the weight+cache stream floor)."""
    import jax
    import jax.numpy as jnp

    from autostyle_tts_tpu.models import token_lm
    from autostyle_tts_tpu.models import transformer as core
    from autostyle_tts_tpu.ops.quant import tree_bytes
    from autostyle_tts_tpu.ops.sampling import SamplerConfig

    cfg = engine.cfg.token_lm
    ccfg = token_lm.core_config(cfg)
    V = cfg.speech_vocab_size
    sampler = SamplerConfig(temperature=1.0, top_k=25)
    key = jax.random.PRNGKey(0)

    def fresh_state(quantized):
        ks = jax.random.split(key, 3)
        cache = core.make_cache(ccfg, B, s_max, quantized=quantized)
        if quantized:
            cache = dict(cache)
            cache["k"] = jax.random.randint(
                ks[0], cache["k"].shape, -127, 128, jnp.int8)
            cache["v"] = jax.random.randint(
                ks[1], cache["v"].shape, -127, 128, jnp.int8)
            cache["k_scale"] = jnp.full(cache["k_scale"].shape, 0.01)
            cache["v_scale"] = jnp.full(cache["v_scale"].shape, 0.01)
        else:
            cache["k"] = (jax.random.normal(ks[0], cache["k"].shape)
                          * 0.3).astype(jnp.bfloat16)
            cache["v"] = (jax.random.normal(ks[1], cache["v"].shape)
                          * 0.3).astype(jnp.bfloat16)
        logits = jax.random.normal(ks[2], (B, V))
        t = jnp.full((B,), t0_fill, jnp.int32)
        off = jnp.full((B,), 16, jnp.int32)
        done = jnp.zeros((B,), bool)
        steps = jnp.full((B,), 4, jnp.int32)
        return cache, logits, t, off, done, steps

    def time_chain(step_fn, quantized=False):
        cache, logits, t, off, done, steps = fresh_state(quantized)
        k = jax.random.PRNGKey(7)
        times = []
        for i in range(n_chunks):
            k, sub = jax.random.split(k)
            t0 = time.perf_counter()
            cache, logits, t, done, steps, toks = step_fn(
                cache, logits, t, off, done, steps, sub
            )
            np.asarray(toks)                    # sync through the tunnel
            times.append(time.perf_counter() - t0)
        return float(np.median(times[1:]) / chunk * 1e3)   # ms/step, warm

    def xla_step(cache, logits, t, off, done, steps, sub):
        return token_lm.decode_chunk(
            engine.params.token_lm, cfg, cache, logits, t, off, done, steps,
            sub, n_steps=chunk, sampler=sampler,
        )

    out = {
        "geometry": f"B={B} S={s_max} chunk={chunk}",
        "xla_bf16kv_ms_per_step": round(time_chain(xla_step, False), 3),
        "xla_int8kv_ms_per_step": round(time_chain(xla_step, True), 3),
    }
    # roofline gate: one batched step must stream the LM weights once
    min_ms = tree_bytes(engine.params.token_lm) / (HBM_BW_GBS * 1e9) * 1e3
    for k2 in ("xla_bf16kv_ms_per_step", "xla_int8kv_ms_per_step"):
        if out[k2] < 0.85 * min_ms:
            raise RuntimeError(
                f"{k2}={out[k2]} ms below the weight-stream roofline "
                f"{min_ms:.3f} ms — measurement artifact")
    return out


def bench_cfm_steps(engine, frames: int = 256, B: int = 1):
    """Mel-decode cost vs sampler schedule: the production 10-step CFG
    sampler against the distilled serving points (4-step and 2-step plain —
    train/cfm_distill.py folds the CFG into the student's conditional
    field). Random weights; timing only — quality gates live in
    tests/test_trained_demo.py.

    DEVICE-timed via scan-difference (round-3 VERDICT weak #3: host timing
    put all three schedules at the ~26 ms tunnel floor and 2-step read
    SLOWER than 4-step): each schedule runs R1 and R2 back-to-back solves
    inside one program; (t_R2 - t_R1)/(R2 - R1) cancels RTT and dispatch."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from autostyle_tts_tpu.models import cfm as cfm_lib

    cfg = engine.cfg.cfm
    p = engine.params.cfm
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    tokens = jax.random.randint(ks[0], (B, frames // cfg.upsample), 0,
                                cfg.token_vocab_size)
    cond = cfm_lib.upsample_tokens(p, tokens, cfg.upsample)
    spk = jax.random.normal(ks[1], (B, cfg.spk_dim)) * 0.3
    pmask = (jnp.arange(frames)[None, :] < frames // 4).astype(jnp.float32)
    pmask = jnp.broadcast_to(pmask, (B, frames))
    pmel = jax.random.normal(ks[2], (B, frames, cfg.n_mels)) * pmask[..., None]
    fmask = jnp.ones((B, frames), jnp.float32)

    # enough repetitions that the CHEAPEST schedule's delta clears tunnel
    # noise: at R=(2,10) the 2-step plain leg's 8-solve delta was ~3 ms
    # against a +-15% jitter on a ~27 ms span and clamped to 0.0 (r4 run)
    R1, R2 = 5, 45

    def run(n_steps, use_cfg):
        c = dataclasses.replace(cfg, n_steps=n_steps, use_cfg=use_cfg)

        @jax.jit
        def many(keys):
            def body(acc, k):
                mel = cfm_lib.sample_mel(
                    p, c, k, cond, spk, pmel, pmask, fmask, use_cfg=use_cfg,
                )
                return acc + jnp.sum(mel.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), keys)
            return acc

        k1 = jax.random.split(jax.random.PRNGKey(7), R1)
        k2 = jax.random.split(jax.random.PRNGKey(7), R2)
        t1 = _p50(lambda: np.asarray(many(k1)), 5)
        t2 = _p50(lambda: np.asarray(many(k2)), 5)
        return round(max(t2 - t1, 0.0) / (R2 - R1) * 1e3, 2)

    return {
        "frames": frames,
        "timing": "device (scan-difference)",
        "ms_10step_cfg": run(10, True),
        "ms_4step_plain": run(4, False),
        "ms_2step_plain": run(2, False),
    }


def bench_stream_concurrent(engine, texts, style_text, style_feats,
                            timbre_feat, n_sessions: int = 4):
    """Concurrent streaming serving (round-3 capability): N sessions share
    the slot-pool decode, each emits windowed chunks. Reports per-session
    TTFB under concurrency and the wall time to drain all sessions."""
    from autostyle_tts_tpu.pipeline.stream_serve import StreamingScheduler

    def run():
        sch = StreamingScheduler(engine, slots=n_sessions, max_seconds=5.0)
        t0 = time.perf_counter()
        sids = []
        for i in range(n_sessions):
            sids.append(sch.submit({
                "id": i, "text": texts[i % len(texts)],
                "style_text": style_text,
                "style_feat": style_feats[i % len(style_feats)],
                "flow_feat": timbre_feat, "max_tokens": 128,
            }))
        first = {}
        audio = 0
        ticks = 0
        while not sch.idle and ticks < 10_000:
            for ev in sch.step():
                if ev.kind == "chunk":
                    if ev.session not in first:
                        first[ev.session] = time.perf_counter() - t0
                    audio += len(ev.wav)
            ticks += 1
        return first, time.perf_counter() - t0, audio

    run()    # warm every program (admission buckets, render windows)
    first, wall, audio = run()
    ttfbs = sorted(first.values())
    sr = engine.cfg.audio.sample_rate
    return {
        "n_sessions": n_sessions,
        "ttfb_first_session_s": round(ttfbs[0], 3),
        "ttfb_last_session_s": round(ttfbs[-1], 3),
        "wall_s": round(wall, 3),
        "audio_s_total": round(audio / sr, 2),
        "realtime_factor_aggregate": round(audio / sr / wall, 2),
    }


def bench_embedder_3b(rtt_s: float, synth_one=None, cfg=None, n_styles=1000):
    """Production-scale embedder (round-2 VERDICT #4): 3B geometry, int8
    weight-only, random weights — HBM fit + the SURVEY §3.2 hot loop's
    latencies (bio 250 tok sampled, emotion 10 tok greedy, 512-token embed
    forward; milvus/RAG.py:176-184, :219-227, :129-147).

    `synth_one(i)`: optional engine closure; when given, also measures the
    FULL RAG TURN in one process — emotion label + 2x embed + 6144-d cosine
    retrieval over 1k styles + DB-served synthesis (SURVEY §3's north star:
    the reference splits this across two processes/GPUs with a JSONL file
    between them; here the 3B embedder and the synthesis engine co-reside
    in HBM and the turn is sequential device work).

    `cfg`/`n_styles` default to production geometry; the CPU bench smoke
    test (tests/test_bench_smoke.py) passes a tiny TransformerConfig."""
    import jax
    import jax.numpy as jnp

    from autostyle_tts_tpu.models import transformer as core
    from autostyle_tts_tpu.ops.quant import tree_bytes
    from autostyle_tts_tpu.ops.sampling import SamplerConfig
    from autostyle_tts_tpu.utils.config import llama32_3b_config

    cfg = cfg or llama32_3b_config()

    # layer-at-a-time init+quantize: the whole-tree jit leaves ~17 GB of f32
    # stacks to XLA's scheduling and OOM'd the chip intermittently (r4)
    params = core.init_params_quantized(jax.random.PRNGKey(0), cfg, bits=8)
    hbm_gb = tree_bytes(params) / 2**30
    P = 128
    rng = np.random.default_rng(0)
    hi = min(30000, cfg.vocab_size - 1)
    prompt = jnp.asarray(rng.integers(1, hi, (1, P)).astype(np.int32))
    plen = jnp.asarray([100], jnp.int32)
    key = jax.random.PRNGKey(1)

    def gen(max_new, sampler, b=1):
        cache = core.make_cache(cfg, b, P + max_new)
        out = core.generate(
            params, cfg, jnp.tile(prompt, (b, 1)),
            jnp.tile(plen, (b,)), cache, key,
            max_new_tokens=max_new, sampler=sampler, eos_id=-1,
        )
        np.asarray(out.lengths)

    bio_s = _p50(lambda: gen(250, SamplerConfig.biography()), 3)
    emo_s = _p50(lambda: gen(10, SamplerConfig.label()), 5)
    # DB builds batch biographies across speakers (reference batch ladder,
    # llm_bio_extract.py:400): B=8 amortizes the decode weight stream
    bio8_s = _p50(lambda: gen(250, SamplerConfig.biography(), b=8), 3)

    T = 512
    toks = jnp.asarray(rng.integers(1, hi, (8, T)).astype(np.int32))
    amask = jnp.ones((8, T), jnp.float32)

    # jitted like the production path (pipeline/rag.py StyleEmbedder._embed_fn)
    emb_fn = jax.jit(lambda p, t, m: core.embed_text(p, cfg, t, m))

    def embed():
        # fetch one [D] row: syncs the whole [B, D] batch without billing
        # the span for the full-payload transfer
        np.asarray(emb_fn(params, toks, amask)[0])

    emb_s = _p50(embed, 5)

    rag_turn_s = None
    if synth_one is not None:
        from autostyle_tts_tpu.retrieval import StyleStore

        D = 2 * cfg.dim        # emotion ‖ biography (RAG.py:458 -> 6144)
        store = StyleStore(dim=D, capacity=max(1024, n_styles))
        store.insert(
            rng.standard_normal((n_styles, D)).astype(np.float32),
            [{"file_id": str(i), "text": ""} for i in range(n_styles)],
        )

        def turn() -> None:
            # per-turn emotion label (bio text is per-speaker, cached by the
            # production path — but BOTH texts are embedded every turn,
            # RAG.py create_combined_embedding :238-266). embed_text rows
            # are [D]; round 3 indexed [:, 0] (one scalar per row) and the
            # 0-d concat crashed the whole section (BENCH_r03 embedder_3b).
            gen(10, SamplerConfig.label())
            e = np.asarray(emb_fn(params, toks[:1], amask[:1])[0])
            b = np.asarray(emb_fn(params, toks[1:2], amask[1:2])[0])
            q = np.concatenate([e, b])
            hits = store.search_arrays(q[None], k=1)
            synth_one(int(hits[1][0, 0]) % 4)

        turn()  # warm (synth buckets are already compiled by the headline)
        rag_turn_s = _p50(turn, 5)

    out = {
        "hbm_weights_gb": round(hbm_gb, 4),
        "bio_250tok_s": round(bio_s, 3),
        "bio_250tok_batch8_s": round(bio8_s, 3),
        "bio_per_s_batch8": round(8 / bio8_s, 2),
        "emotion_10tok_s": round(emo_s, 3),
        "embed_512tok_batch8_s": round(max(emb_s - rtt_s, 0.0), 4),
        "embed_qps": round(8 / emb_s, 1),
        "decode_ms_per_step": round((bio_s - emo_s) / 240 * 1e3, 2),
    }
    if rag_turn_s is not None:
        # full RAG turn (label + 2x embed + retrieve@1k + synthesize),
        # 3B embedder co-resident with the engine — the reference's
        # two-process file-handoff pipeline did label+embed+search on one
        # GPU and synthesis on another at ~5 s+/turn (README.md:24 counts
        # synthesis alone as <5 s)
        out["rag_turn_e2e_s"] = round(rag_turn_s, 3)

    # int4 weight-only variant (the reference trained its LLM 4-bit nf4,
    # src/ft_llm.py:209-211): halves the decode weight stream again
    del params

    params = core.init_params_quantized(jax.random.PRNGKey(0), cfg, bits=4)
    out["int4_hbm_weights_gb"] = round(tree_bytes(params) / 2**30, 4)
    bio4 = _p50(lambda: gen(250, SamplerConfig.biography()), 3)
    emo4 = _p50(lambda: gen(10, SamplerConfig.label()), 3)
    out["int4_bio_250tok_s"] = round(bio4, 3)
    out["int4_decode_ms_per_step"] = round((bio4 - emo4) / 240 * 1e3, 2)
    return out


def bench_embedder_7b(cfg=None, rtt_s: float = 0.0):
    """Qwen2.5-7B (the reference's ZH embedder, scripts/train_llm_cn.sh:23)
    on ONE v5e, int8 AND int4 weight-only (r4 VERDICT #5: the int8 7B tree
    ~8.6 GB fits the 15.75 GB chip alongside the serving engine — measure
    the full embed/bio/emotion surface, not just an int4 fit + decode
    step). int4 (the reference trained 4-bit nf4, src/ft_llm_cn.py) halves
    the decode weight stream and is the tight-co-residency plan."""
    import gc

    import jax
    import jax.numpy as jnp

    from autostyle_tts_tpu.models import transformer as core
    from autostyle_tts_tpu.ops.quant import tree_bytes
    from autostyle_tts_tpu.ops.sampling import SamplerConfig
    from autostyle_tts_tpu.utils.config import qwen25_7b_config

    cfg = cfg or qwen25_7b_config()
    P = 128
    rng = np.random.default_rng(3)
    hi = min(30000, cfg.vocab_size - 1)
    prompt = jnp.asarray(rng.integers(1, hi, (1, P)).astype(np.int32))
    plen = jnp.asarray([100], jnp.int32)
    key = jax.random.PRNGKey(1)
    out = {}

    def legs(params, tag):
        def gen(max_new, sampler, b=1):
            cache = core.make_cache(cfg, b, P + max_new)
            res = core.generate(
                params, cfg, jnp.tile(prompt, (b, 1)),
                jnp.tile(plen, (b,)), cache, key,
                max_new_tokens=max_new, sampler=sampler, eos_id=-1,
            )
            np.asarray(res.lengths)

        # 6 decimals: at the CPU-smoke tiny geometry the int8/int4 trees
        # differ only past the 4th decimal of a GB — 4 collapsed them equal
        out[f"{tag}_hbm_weights_gb"] = round(tree_bytes(params) / 2**30, 6)
        emo_s = _p50(lambda: gen(10, SamplerConfig.label()), 3)
        bio_s = _p50(lambda: gen(250, SamplerConfig.biography()), 3)
        out[f"{tag}_emotion_10tok_s"] = round(emo_s, 3)
        out[f"{tag}_bio_250tok_s"] = round(bio_s, 3)
        out[f"{tag}_decode_ms_per_step"] = round(
            (bio_s - emo_s) / 240 * 1e3, 2)
        if tag == "int8":
            # DB-build batch biography + the embed forward (RAG.py:129-147)
            bio8_s = _p50(
                lambda: gen(250, SamplerConfig.biography(), b=8), 3)
            out["int8_bio_250tok_batch8_s"] = round(bio8_s, 3)
            out["int8_bio_per_s_batch8"] = round(8 / bio8_s, 2)
            T = 512
            toks = jnp.asarray(rng.integers(1, hi, (8, T)).astype(np.int32))
            amask = jnp.ones((8, T), jnp.float32)
            emb_fn = jax.jit(lambda p, t, m: core.embed_text(p, cfg, t, m))
            emb_s = _p50(lambda: np.asarray(emb_fn(params, toks, amask)[0]), 5)
            out["int8_embed_512tok_batch8_s"] = round(
                max(emb_s - rtt_s, 0.0), 4)
            out["int8_embed_qps"] = round(8 / emb_s, 1)

    params = core.init_params_quantized(jax.random.PRNGKey(7), cfg, bits=8)
    try:
        legs(params, "int8")
    finally:
        del params
        gc.collect()
    params = core.init_params_quantized(jax.random.PRNGKey(7), cfg, bits=4)
    try:
        legs(params, "int4")
    finally:
        del params
        gc.collect()
    # r4-compatible aliases (BENCH_r04 embedder_7b keys)
    out["int4_hbm_weights_gb"] = out.get("int4_hbm_weights_gb")
    out["emotion_10tok_s"] = out.get("int4_emotion_10tok_s")
    out["decode_ms_per_step"] = out.get("int4_decode_ms_per_step")
    return out


def bench_zh_e2e(rtt_s: float = 0.0, emb_cfg=None, eng_cfg=None,
                 n_styles: int = 1000, emb_bits: int = 4):
    """ZH end-to-end RAG turn on-chip (r4 VERDICT #5): ZH emotion labels
    (reformat_data_ft_llm_cn.py:59-67 inventory), the learned multilingual
    BPE (vocab/bpe_multi_2k.json) on BOTH the embedder truncation and the
    synthesis text frontend, a Qwen2.5-7B-geometry int4 embedder
    (the reference's ZH model at its own 4-bit stance, src/ft_llm_cn.py),
    7168-d cosine retrieval (2 x 3584, the Qwen-dim analog of RAG.py:458),
    and ZH text synthesis through a BPE-frontend engine. One process, one
    chip — the reference ran this as two GPU processes with a JSONL file
    between them (milvus/search_json.py -> tts_with_rag.py)."""
    import dataclasses
    import gc

    import jax

    from autostyle_tts_tpu.models import bpe as bpe_lib
    from autostyle_tts_tpu.models import transformer as core
    from autostyle_tts_tpu.pipeline.engine import Engine
    from autostyle_tts_tpu.pipeline.rag import EmbedderService, labels_for_language
    from autostyle_tts_tpu.retrieval import StyleStore
    from autostyle_tts_tpu.utils.config import Config, qwen25_7b_config

    repo = Path(__file__).parent
    tok = bpe_lib.BPETokenizer.load(str(repo / "vocab" / "bpe_multi_2k.json"))

    # ZH synthesis engine: production geometry, BPE text frontend
    if eng_cfg is None:
        eng_cfg = Config()
        eng_cfg.quantize_lm_int8 = True
        eng_cfg.quantize_lm_kv_int8 = True
        eng_cfg.cfm = dataclasses.replace(eng_cfg.cfm, n_steps=2, use_cfg=False)
    eng_cfg.frontend.tokenizer = "bpe"
    eng_cfg.frontend.bpe_path = str(repo / "vocab" / "bpe_multi_2k.json")
    if eng_cfg.token_lm.text_vocab_size < bpe_lib.VOCAB_SIZE:
        eng_cfg.token_lm = dataclasses.replace(
            eng_cfg.token_lm, text_vocab_size=bpe_lib.VOCAB_SIZE
        )
    engine = Engine(eng_cfg, seed=0)

    emb_cfg = emb_cfg or qwen25_7b_config()
    emb_params = core.init_params_quantized(
        jax.random.PRNGKey(7), emb_cfg, bits=emb_bits
    )
    emb = EmbedderService(
        emb_cfg, emb_params, labels=labels_for_language("zh"), tokenizer=tok,
    )

    D = 2 * emb_cfg.dim
    rng = np.random.default_rng(5)
    store = StyleStore(dim=D, capacity=max(1024, n_styles))
    step = max(n_styles // 4, 1)
    for lo in range(0, n_styles, step):
        m = min(step, n_styles - lo)
        store.insert(
            rng.standard_normal((m, D)).astype(np.float32),
            [{"file_id": str(lo + i), "text": ""} for i in range(m)],
        )

    zh_texts = [
        "\u4eca\u5929\u5929\u6c14\u771f\u4e0d\u9519\uff0c\u6211\u4eec\u53bb\u516c\u56ed\u6563\u6b65\u5427\u3002",
        "\u8fd9\u4e2a\u6d88\u606f\u592a\u4ee4\u4eba\u9707\u60ca\u4e86\uff0c\u6211\u7b80\u76f4\u4e0d\u6562\u76f8\u4fe1\u3002",
        "\u522b\u62c5\u5fc3\uff0c\u4e00\u5207\u90fd\u4f1a\u597d\u8d77\u6765\u7684\u3002",
    ]
    bio_zh = "\u8bf4\u8bdd\u4eba\u662f\u4e00\u4f4d\u70ed\u60c5\u5f00\u6717\u7684\u5973\u58eb\uff0c\u559c\u6b22\u6237\u5916\u6d3b\u52a8\u3002"
    sr = eng_cfg.audio.prompt_sample_rate
    t = np.arange(3 * sr) / sr
    sty_wav = (0.4 * np.sin(2 * np.pi * 200 * t)
               + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
    tim_wav = (0.4 * np.sin(2 * np.pi * 160 * t)
               + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
    feats = engine.prompt_features([sty_wav, tim_wav])

    def turn(i: int):
        text = zh_texts[i % len(zh_texts)]
        emo = emb.emotion_label(text)
        q = emb.combined_embedding(emo, bio_zh)
        hits = store.search_arrays(np.asarray(q, np.float32)[None], k=1)
        _ = int(hits[1][0, 0])
        wav = engine._synthesize(
            [text], ["\u98ce\u683c\u63d0\u793a\u6587\u672c"],
            [feats[0]], [feats[1]], max_seconds=5.0,
        )[0]
        return wav

    wav = turn(0)                        # warm/compile every stage
    audio_s = wav.shape[0] / eng_cfg.audio.sample_rate
    turn_s = _p50(lambda: turn(1), 5)
    ratio = len(zh_texts[0]) / max(
        len(tok.encode_segment(zh_texts[0])), 1)
    out = {
        "zh_turn_e2e_s": round(turn_s, 3),
        "zh_audio_s": round(audio_s, 2),
        "query_dim": D,
        "n_styles": n_styles,
        "embedder": f"qwen25_7b int{emb_bits}",
        "bpe_zh_chars_per_token": round(ratio, 2),
        "labels": "zh7",
    }
    del emb_params, engine, emb
    gc.collect()
    return out


_IEMOCAP_DIR = Path("/root/reference/data")


def _iemocap_samples(split: str, window: int = 5, max_n: int = 0):
    """Reformat the bundled REAL IEMOCAP split (reference C23 artifacts,
    data/iemocap.*.json: 108/12/31 conversations) into chat samples via the
    C16 reformatter. Falls back to synthetic samples when the reference
    data dir is absent (CPU smoke boxes)."""
    import json as _json

    from autostyle_tts_tpu.train import reformat

    src = _IEMOCAP_DIR / f"iemocap.{split}.json"
    if src.exists():
        convs = _json.loads(src.read_text())
        samples = []
        for conv_id, conv in convs.items():
            samples.extend(
                reformat.conversation_to_messages(conv_id, conv, window=window)
            )
        if max_n and max_n < len(samples):
            # sample ACROSS conversations: a head slice covers only the
            # first few dialogs and skews the label distribution badly
            idx = np.random.default_rng(0).permutation(len(samples))[:max_n]
            samples = [samples[i] for i in sorted(idx)]
        return samples
    labels = reformat.label_set("en")
    return [
        {"messages": [
            {"role": "system", "content": "classify the emotion"},
            {"role": "user", "content": f"utterance number {i} sounds {labels[i % 6]}"},
            {"role": "assistant", "content": labels[i % 6]},
        ]}
        for i in range(max_n or 64)
    ]


def _oom_summary(e: Exception) -> str:
    """Compress an XLA HBM-OOM into its one informative line (e.g.
    'Ran out of memory in memory space hbm. Used 42.14G of 15.75G hbm.');
    non-OOM exceptions fall back to type+message, truncated."""
    import re

    msg = str(e)
    m = re.search(r"Ran out of memory[^.]*\.(?: Used .*? hbm\.)?", msg)
    return (m.group(0) if m else f"{type(e).__name__}: {msg}")[:220]


def bench_sft(rtt_s: float, cfg=None, seq_len: int = 1024,
              batch_size: int = 4, train_n: int = 0, ft_cfg=None,
              ft_steps: int = 1920, ft_train_n: int = 768,
              ft_eval_n: int = 64, ft_seq_len: int = 1024,
              ft_lr: float = 5e-4, ft_window: int = 0):
    """On-chip training benchmark (round-3 VERDICT #2: training is one of
    the reference's two pillars — src/ft_llm.py:208-315 — and the rebuild
    had never measured it on the chip). Two parts:

    1. 3B-embedder LoRA-SFT step time at the reference geometry (bs 4 x
       seq 1024, LoRA r=32 all-linear, NEFTune 5, int8 frozen base like the
       reference's quantized base + f32 LoRA) on REAL packed IEMOCAP rows:
       ms/step with remat on and off, tokens/s, packing utilization +
       step-count reduction vs unpacked, HBM for weights+optimizer.
    2. a short REAL fine-tune at a small geometry on the bundled IEMOCAP
       train split, reporting generation-based weighted-F1 before/after
       (the reference's training success metric, ft_llm.py:143-148).

    cfg/ft_cfg default to production/small geometry; the CPU smoke test
    passes tiny configs and ft_steps≈2."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from autostyle_tts_tpu.models import frontend
    from autostyle_tts_tpu.models import transformer as core
    from autostyle_tts_tpu.ops.quant import tree_bytes
    from autostyle_tts_tpu.train import lora_sft, reformat
    from autostyle_tts_tpu.utils.config import (
        TrainConfig, TransformerConfig, llama32_3b_config,
    )

    out = {}
    labels = reformat.label_set("en")
    train_samples = _iemocap_samples("train", max_n=train_n)
    out["train_samples"] = len(train_samples)

    # ---- part 1: 3B LoRA step time at reference geometry ----------------
    cfg = cfg or dataclasses.replace(llama32_3b_config(), max_seq_len=seq_len)
    tcfg = TrainConfig(batch_size=batch_size, grad_accum=1,
                       max_seq_len=seq_len)

    # layer-at-a-time init+quantize (both full-bench r4 runs died HERE with
    # the whole-tree jit: one compile-time HBM OOM, one RESOURCE_EXHAUSTED —
    # its ~17 GB f32 peak is scheduling-dependent; the bounded builder's is
    # one layer)
    params = core.init_params_quantized(jax.random.PRNGKey(0), cfg, bits=8)
    lora = core.init_lora(jax.random.PRNGKey(1), cfg, tcfg.lora.r)
    optimizer = lora_sft.make_optimizer(tcfg, 1000)
    batches = list(lora_sft.make_packed_batches(
        train_samples, seq_len, batch_size, pad_to_batch=True,
    ))
    n_unpacked = len(list(lora_sft.make_batches(
        train_samples, seq_len, batch_size,
    )))
    real_tok = int(sum((b.segment_ids > 0).sum() for b in batches))
    out["packed_micro_batches"] = len(batches)
    out["unpacked_micro_batches"] = n_unpacked
    out["packing_step_reduction"] = round(n_unpacked / max(len(batches), 1), 2)
    out["packing_utilization"] = round(
        real_tok / max(len(batches) * batch_size * seq_len, 1), 3
    )
    # packing policy on THIS corpus (VERDICT r4 #7): train() auto-disables
    # the block-diagonal path when even the FFD optimum compresses <1.1x
    out["packing_auto_disabled"] = out["packing_step_reduction"] < 1.1
    out["weights_hbm_gb"] = round(tree_bytes(params) / 2**30, 4)

    def time_leg(leg_cfg, remat, leg_params, leg_lora, leg_batches):
        t2 = dataclasses.replace(tcfg, remat=remat)
        step_fn = lora_sft.make_train_step(leg_cfg, t2, optimizer, packed=True)
        opt_state = optimizer.init(leg_lora)
        lo = jax.tree_util.tree_map(jnp.copy, leg_lora)
        times = []
        loss = None
        for i, b in enumerate(leg_batches[:4]):
            t0 = time.perf_counter()
            lo, opt_state, loss = step_fn(
                lo, opt_state, leg_params,
                jnp.asarray(b.tokens), jnp.asarray(b.loss_mask),
                jnp.asarray(b.segment_ids), jax.random.PRNGKey(i),
            )
            np.asarray(loss)     # sync through the tunnel
            times.append(time.perf_counter() - t0)
        step_s = float(np.median(times[1:])) if len(times) > 1 else times[0]
        return step_s, loss, opt_state

    oom = False
    for remat in (True, False):
        key = "remat" if remat else "noremat"
        try:
            step_s, loss, opt_state = time_leg(cfg, remat, params, lora,
                                               batches)
        except Exception as e:
            # remat=False at the 3B reference geometry (bs4 x seq1024) does
            # NOT fit one 16 GB v5e: XLA's compile-time figure (measured:
            # "Used 42.14G of 15.75G hbm" — all 28 scanned layers' attention
            # scores + dequantized weight temps held live for backward) IS
            # the remat result. Record it; the on/off speed cost is
            # quantified at a reduced depth that fits, below.
            out[f"{key}_oom"] = _oom_summary(e)
            oom = True
            continue
        out[f"step_ms_{key}"] = round(step_s * 1e3, 1)
        out[f"tokens_per_s_{key}"] = round(batch_size * seq_len / step_s, 0)
        if remat:
            out["loss_finite"] = bool(np.isfinite(float(loss)))
            state_gb = (tree_bytes(lora) + tree_bytes(opt_state)) / 2**30
            out["lora_plus_opt_hbm_gb"] = round(state_gb, 2)

    if oom:
        # apples-to-apples remat pair: same width/heads/quantized base/LoRA/
        # packed batches, only n_layers cut until the noremat leg fits
        # (measured: depth 7 of 28 still OOMs — the all-layer f32 score +
        # dequantized-weight temps shrink only linearly with depth)
        # layer SWEEP (r4 VERDICT weak #7): the 28-layer extrapolation of
        # remat overhead was asserted from one depth-3 pair; measure the
        # pair at 3/6/9 layers so the curve is pinned, recording OOMs where
        # the noremat leg stops fitting (depth 7 of 28 already OOM'd in r4).
        sweep = []
        pair = {}
        for fb_layers in (3, 6, 9):
            fb_cfg = dataclasses.replace(cfg, n_layers=fb_layers)
            fb_params = core.init_params_quantized(
                jax.random.PRNGKey(0), fb_cfg, bits=8
            )
            fb_lora = core.init_lora(jax.random.PRNGKey(1), fb_cfg,
                                     tcfg.lora.r)
            row = {"n_layers": fb_layers}
            try:
                # noremat first: it is the leg that may not fit
                s_off, _, _ = time_leg(fb_cfg, False, fb_params, fb_lora,
                                       batches)
                s_on, _, _ = time_leg(fb_cfg, True, fb_params, fb_lora,
                                      batches)
                row.update(
                    step_ms_remat=round(s_on * 1e3, 1),
                    step_ms_noremat=round(s_off * 1e3, 1),
                    remat_overhead_pct=round((s_on / s_off - 1) * 100, 1),
                )
                if not pair:
                    pair = dict(row)
            except Exception as e:      # pragma: no cover - device-geometry
                row["noremat_oom"] = _oom_summary(e)
            sweep.append(row)
            del fb_params, fb_lora
            gc.collect()
        out["remat_depth_sweep"] = sweep
        out["remat_pair_reduced_depth"] = pair or {
            "error": "no depth fit", "tried": sweep
        }
    del params, lora

    # ---- part 2: REAL mini fine-tune, weighted-F1 before/after ----------
    # geometry/LR swept on-chip (round 4): dim256 L4 @ lr 5e-4 x 1920 steps
    # reaches weighted-F1 0.22-0.25 from 0.0 in 30-60 s of train wall
    # (seq 1024 packs the ~290-token rows 2.2x; seq 512 fits one row each);
    # smaller dims plateau near 0.03-0.12, higher LRs destabilize generation
    ft_cfg = ft_cfg or TransformerConfig(
        vocab_size=frontend.VOCAB_SIZE, dim=256, n_layers=4, n_heads=8,
        n_kv_heads=8, ffn_dim=768, max_seq_len=ft_seq_len, dtype="float32",
    )
    ft_tcfg = TrainConfig(
        batch_size=8, grad_accum=1, max_seq_len=ft_seq_len,
        learning_rate=ft_lr, remat=False,
    )
    # window=0 (utterance-only ERC): the byte-level toy geometry can learn
    # this in minutes on-chip; the full ±5-utterance protocol is the 3B
    # path above (timed) and the CLI driver's job, not this demonstrator
    ft_params = core.init_params(jax.random.PRNGKey(0), ft_cfg)
    ft_train = _iemocap_samples("train", window=ft_window, max_n=ft_train_n)
    ft_eval = _iemocap_samples("valid", window=ft_window, max_n=ft_eval_n)
    lscale = ft_tcfg.lora.alpha / ft_tcfg.lora.r

    def f1(lora):
        score, _ = lora_sft.evaluate_generation(
            ft_params, ft_cfg, ft_eval, labels,
            lora=lora, lora_scale=lscale if lora is not None else 0.0,
            max_prompt=ft_seq_len, max_new=10,
        )
        return round(score, 4)

    out["mini_ft"] = {"steps": ft_steps, "geometry":
                      f"dim{ft_cfg.dim} L{ft_cfg.n_layers} seq{ft_seq_len}"}
    # short utterance-only prompts are where packing's step cut shows
    # (2.2x at seq 1024; the ±5-window rows above nearly fill a slot each)
    n_packed_ft = len(list(lora_sft.make_packed_batches(
        ft_train, ft_seq_len, ft_tcfg.batch_size, pad_to_batch=True,
    )))
    n_unpacked_ft = len(list(lora_sft.make_batches(
        ft_train, ft_seq_len, ft_tcfg.batch_size,
    )))
    out["mini_ft"]["packing_step_reduction"] = round(
        n_unpacked_ft / max(n_packed_ft, 1), 2
    )
    out["mini_ft"]["f1_before"] = f1(None)
    ft_opt = lora_sft.make_optimizer(ft_tcfg, ft_steps)
    ft_step = lora_sft.make_train_step(ft_cfg, ft_tcfg, ft_opt, packed=True)
    ft_lora = core.init_lora(jax.random.PRNGKey(1), ft_cfg, ft_tcfg.lora.r)
    ft_ostate = ft_opt.init(ft_lora)
    t0 = time.perf_counter()
    step = 0
    epoch = 0
    last_loss = None
    while step < ft_steps:
        for b in lora_sft.make_packed_batches(
            ft_train, ft_seq_len, ft_tcfg.batch_size,
            seed=epoch, pad_to_batch=True,
        ):
            ft_lora, ft_ostate, last_loss = ft_step(
                ft_lora, ft_ostate, ft_params,
                jnp.asarray(b.tokens), jnp.asarray(b.loss_mask),
                jnp.asarray(b.segment_ids), jax.random.PRNGKey(step),
            )
            step += 1
            if step >= ft_steps:
                break
        epoch += 1
    np.asarray(last_loss)
    out["mini_ft"]["train_wall_s"] = round(time.perf_counter() - t0, 1)
    out["mini_ft"]["final_loss"] = round(float(last_loss), 3)
    out["mini_ft"]["f1_after"] = f1(ft_lora)
    del ft_params, ft_lora, ft_ostate

    # ---- part 3: the REAL 3B adapter artifact (r4 VERDICT #2) ------------
    # scripts/run_ft3b.py trained one full-protocol LoRA-SFT leg at the
    # real Llama-3.2-3B geometry on-chip and checked in the adapter;
    # RE-evaluate weighted-F1 before/after on the real valid split every
    # round so the artifact's claim stays a measurement, not a record.
    art = Path(__file__).parent / "artifacts" / "ft3b"
    if (art / "meta.json").exists():
        meta = json.loads((art / "meta.json").read_text())
        cfg3 = dataclasses.replace(llama32_3b_config(), max_seq_len=seq_len)
        t3 = TrainConfig()
        base3 = core.init_params_quantized(
            jax.random.PRNGKey(int(meta["seed"])), cfg3, bits=8
        )
        from autostyle_tts_tpu.utils.checkpoint import load_pytree

        lora3 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32),
            load_pytree(
                art / "adapter_f16.npz",
                core.init_lora(jax.random.PRNGKey(0), cfg3, t3.lora.r),
            ),
        )
        # Seeded 160-sample subset: the full 647-row split costs ~25 min
        # through the tunnel (2 evals x ~81 batches x ~9 s); the subset
        # keeps the claim a fresh measurement at ~6 min. meta.json carries
        # the full-split numbers from the training run itself.
        ev = _iemocap_samples("valid")
        rng = np.random.default_rng(0)
        ev = [ev[i] for i in rng.permutation(len(ev))[:160]]
        fb, _ = lora_sft.evaluate_generation(base3, cfg3, ev, labels)
        fa, _ = lora_sft.evaluate_generation(
            base3, cfg3, ev, labels,
            lora=lora3, lora_scale=t3.lora.alpha / t3.lora.r,
        )
        out["f1_3b"] = {
            "eval_subset_n": len(ev),
            "f1_before": round(float(fb), 4),
            "f1_after": round(float(fa), 4),
            "f1_before_full_split": meta.get("f1_before"),
            "f1_after_full_split": meta.get("f1_after"),
            "trained_steps": meta.get("steps"),
            "train_wall_s": meta.get("train_wall_s"),
            "geometry": meta.get("geometry"),
            "note": "adapter artifacts/ft3b trained on-chip by "
                    "scripts/run_ft3b.py; base = seeded random int8 "
                    "(no pretrained 3B in this env); F1 re-measured on a "
                    "seeded 160-row subset of the real valid split this "
                    "run; *_full_split = the training run's own numbers",
        }
        if (art / "retrieval_delta.json").exists():
            # scripts/retrieval_delta_3b.py — adapter's effect through the
            # production C12 ablation (measured on-chip, folded verbatim)
            out["f1_3b"]["retrieval_delta"] = json.loads(
                (art / "retrieval_delta.json").read_text())
        del base3, lora3
    return out


def _device_watchdog(timeout_s: int = 1500, attempt_s: int = 150) -> None:
    """The tunneled device can WEDGE (every op hangs indefinitely; wedges
    CLEAR after some minutes, but an op dispatched during one never
    completes — the training drivers learned that only a FRESH process
    recovers, scripts/train_synth_prod2.sh wait_device). So probe in
    bounded SUBPROCESS attempts, retrying until the patience window runs
    out: a wedge that clears mid-window costs a few attempts, not the
    round's artifact. The parent has not touched the backend yet (jax
    backend init is lazy), so a wedged attempt leaves it clean. A healthy
    chip passes attempt 1 (~100 s worst observed first-compile); observed
    wedges have cleared on the tens-of-minutes scale, hence the 25-min
    default patience."""
    import subprocess

    t0 = time.time()
    attempt = 0
    last = ""
    while time.time() - t0 < timeout_s:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp, numpy as np;"
                 "x = jnp.ones((128, 128));"
                 "np.asarray((x @ x).sum()); print('ok')"],
                capture_output=True, text=True, timeout=attempt_s,
            )
            if r.returncode == 0 and "ok" in r.stdout:
                return
            # a FAST failure is not a wedge: surface the real exception
            # loudly instead of masking it behind a fabricated metric
            last = (r.stderr or r.stdout)[-300:]
            print(f"[bench] device probe failed (attempt {attempt}): {last}",
                  file=sys.stderr, flush=True)
            os._exit(1)
        except subprocess.TimeoutExpired:
            last = f"probe attempt {attempt} hung >{attempt_s}s"
            print(f"[bench] {last} — wedged tunnel, retrying",
                  file=sys.stderr, flush=True)
            time.sleep(30)
    print(json.dumps({
        "metric": "tts_with_st_e2e_p50_latency",
        "value": -1.0,
        "unit": "s/utt",
        "vs_baseline": 0.0,
        "extra": {"error": f"device unresponsive for {timeout_s}s across "
                           f"{attempt} fresh-process probes (wedged tunnel); "
                           f"last: {last}"},
    }))
    sys.stdout.flush()
    os._exit(0)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _mark("device_watchdog")
    _device_watchdog()

    from autostyle_tts_tpu.pipeline import Engine
    from autostyle_tts_tpu.utils.config import Config

    import dataclasses

    cfg = Config()
    # production serving config: int8 weight-only token LM (the reference
    # itself served its LLM 8-bit, milvus/RAG.py:89-92) + int8 KV cache.
    cfg.quantize_lm_int8 = os.environ.get("ASTTTS_BENCH_INT8", "1") != "0"
    cfg.quantize_lm_kv_int8 = os.environ.get("ASTTTS_BENCH_KV8", "1") != "0"
    # headline mel decode = the DISTILLED serving point (round-3 VERDICT #5):
    # 2-step plain Euler, CFG folded into the student by progressive
    # distillation (train/cfm_distill.py). Quality gates for this schedule
    # are tests/test_trained_demo.py::test_distilled_cfm_few_step_tracks_
    # teacher; timing here is weight-independent. ASTTTS_BENCH_CFM_STEPS=10
    # restores the teacher schedule (10-step + CFG).
    cfm_steps = int(os.environ.get("ASTTTS_BENCH_CFM_STEPS", "2"))
    cfg.cfm = dataclasses.replace(
        cfg.cfm, n_steps=cfm_steps, use_cfg=cfm_steps > 4
    )
    # serve the TRAINED production-geometry artifact when present (r4
    # VERDICT #1: the trained evidence and the benchmarked geometry must
    # coincide) — scripts/train_synth_prod.sh builds it, eval_prod_quality
    # writes quality.json next to it; both fold into this round's artifact
    prod_art = Path(__file__).parent / "artifacts" / "prod_engine"
    trained_params = None
    trained_quality = None
    if (prod_art / "engine_trained.npz").exists() and not os.environ.get(
            "ASTTTS_BENCH_RANDOM_WEIGHTS"):
        import jax.numpy as jnp

        from autostyle_tts_tpu.pipeline.engine import EngineParams
        from autostyle_tts_tpu.utils.checkpoint import load_pytree

        import jax as _jax

        init = EngineParams.init(_jax.random.PRNGKey(0), cfg)
        tree = load_pytree(prod_art / "engine_trained.npz", init.tree())
        trained_params = EngineParams.from_tree(
            _jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), tree)
        )
        if (prod_art / "quality.json").exists():
            trained_quality = json.loads(
                (prod_art / "quality.json").read_text())
    engine = Engine(cfg, params=trained_params, seed=0)

    _mark("rtt_s")
    rtt_s = measure_rtt_floor()

    sr = cfg.audio.prompt_sample_rate
    rng = np.random.default_rng(0)

    def prompt_wav(seconds: float, f: float) -> np.ndarray:
        t = np.arange(int(sr * seconds)) / sr
        return (
            0.4 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(len(t))
        ).astype(np.float32)

    styles = [prompt_wav(3.0, 180.0 + 30 * i) for i in range(4)]
    timbre = prompt_wav(3.0, 150.0)
    texts = load_texts(8)
    style_text = "A short style transcript for the prompt."

    # ---- DB-served path (headline): featurize prompts ONCE (insert time),
    # serve every request from precomputed features
    _mark("style_feats")
    style_feats = engine.prompt_features(styles)
    timbre_feat = engine.prompt_features([timbre])[0]

    def run_db(i: int) -> np.ndarray:
        wavs = engine._synthesize(
            [texts[i % len(texts)]], [style_text],
            [style_feats[i % len(style_feats)]], [timbre_feat],
            max_seconds=5.0,
        )
        return wavs[0][None, :]

    # warmup / compile across the text-length buckets
    audio_s_sum = 0.0
    for i in range(len(texts)):
        wav = run_db(i)
        audio_s_sum += wav.shape[1] / cfg.audio.sample_rate
    audio_s = audio_s_sum / len(texts)

    _mark("times")
    times = []
    for i in range(24):     # enough reps that tunnel jitter doesn't move p50
        t0 = time.perf_counter()
        run_db(i)
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    best = float(np.min(times))
    rtf = p50 / max(audio_s, 1e-9)

    # ---- cold path: per-request featurization (the reference's per-query
    # load_wav behaviour, tts_with_rag.py:180)
    def run_cold(i: int) -> np.ndarray:
        feats = engine.prompt_features([styles[i % 4], timbre])
        return engine._synthesize(
            [texts[i % len(texts)]], [style_text], [feats[0]], [feats[1]],
            max_seconds=5.0,
        )[0]

    _mark("run_cold")
    run_cold(0)
    cold = []
    for i in range(7):
        t0 = time.perf_counter()
        run_cold(i)
        cold.append(time.perf_counter() - t0)
    cold_p50 = float(np.median(cold))

    # ---- per-stage breakdown: profile mode forces a device sync per span;
    # each sync pays one RTT the pipelined path doesn't, so the DEVICE
    # number subtracts the measured floor (round-2 VERDICT #5 — the old
    # docstring claimed the raw sums matched e2e; they can't through a
    # tunnel)
    _mark("prof")
    prof = Engine(cfg, seed=0, profile=True)
    pf = prof.prompt_features(styles[:1] + [timbre])
    for i in range(3):  # warm every bucket first
        prof.prompt_features(styles[:1] + [timbre])
        prof._synthesize([texts[i]], [style_text], [style_feats[0]],
                         [timbre_feat], max_seconds=5.0)
    prof.watch.spans.clear()
    prof.prompt_features(styles[:1] + [timbre])
    for i in range(8):
        prof._synthesize([texts[i % len(texts)]], [style_text], [pf[0]],
                         [pf[1]], max_seconds=5.0)
    stage_synced = {
        k: round(v["p50_s"] * 1e3, 1) for k, v in prof.watch.stats().items()
    }
    stage_device = {
        k: round(max(v - rtt_s * 1e3, 0.0), 1) for k, v in stage_synced.items()
    }
    synth_stages = ("lm_generate", "cfm_sample", "vocoder", "fetch")
    device_sum = sum(stage_device.get(k, 0.0) for k in synth_stages)
    del prof, pf     # a full second Engine: free its HBM for the rest
    gc.collect()
    _mark("lm_split")
    try:
        lm_split = bench_lm_split(engine, cfg, texts, style_text,
                                  style_feats[0], timbre_feat, rtt_s)
    except Exception as e:              # pragma: no cover - defensive
        lm_split = {"error": f"{type(e).__name__}: {e}"[:300]}
    _mark("spec_decode")
    try:
        lm_spec = bench_spec_decode(engine, cfg, texts, style_text,
                                    style_feats[0], rtt_s)
    except Exception as e:              # pragma: no cover - defensive
        lm_spec = {"error": f"{type(e).__name__}: {e}"[:300]}

    # ---- batched serving throughput (8 distinct utterances, one program)
    texts8 = texts[:8]
    stexts8 = [style_text] * 8
    styles8 = [style_feats[i % len(style_feats)] for i in range(8)]
    timbres8 = [timbre_feat] * 8

    def run8():
        return engine.synthesize_batch(texts8, stexts8, styles8, timbres8,
                                       max_seconds=5.0)

    _mark("wavs8")
    wavs8 = run8()  # warmup/compile
    batch_audio_s = sum(len(w) for w in wavs8) / cfg.audio.sample_rate
    t8 = []
    for _ in range(3):
        t0 = time.perf_counter()
        wavs8 = run8()
        t8.append(time.perf_counter() - t0)
    t8_med = float(np.median(t8))
    batch_rtf = t8_med / max(batch_audio_s, 1e-9)
    batch_utt_per_s = 8 / t8_med

    def _section(name, fn):
        """Extras must not kill the headline: a failed section reports its
        error string instead of crashing the whole bench, and a section that
        would start past the wall budget is skipped so the final JSON line
        is guaranteed to print."""
        _mark(name)
        elapsed = time.time() - _T0
        if elapsed > _BUDGET_S:
            return {"skipped": f"wall budget: section would start at "
                               f"{elapsed:.0f}s > {_BUDGET_S:.0f}s "
                               f"(ASTTTS_BENCH_BUDGET_S)"}
        try:
            return fn()
        except Exception as e:          # pragma: no cover - defensive
            return {"error": f"{type(e).__name__}: {e}"[:300]}

    # ---- continuous vs static under Poisson arrivals (per-request latency)
    poisson = _section("poisson", lambda: bench_continuous_poisson(
        engine, texts, style_text, style_feats, timbre_feat
    ))

    # ---- streaming time-to-first-audio (fused first program, round-3)
    def first_chunk() -> float:
        t0 = time.perf_counter()
        it = engine.inference_tts_with_st(
            texts[2], style_text, style_feats[0], timbre_feat, stream=True
        )
        np.asarray(next(it)["tts_speech"])
        dt = time.perf_counter() - t0
        for _ in it:   # drain: the async full-LM must not queue into the
            pass       # NEXT measurement (abandoned iterators leave it live)
        return dt

    def _ttfb():
        first_chunk()  # warm
        return float(np.median([first_chunk() for _ in range(7)]))

    ttfb = _section("first_chunk", _ttfb)
    if isinstance(ttfb, dict):
        ttfb = -1.0    # section failed; -1 keeps the JSON strictly valid
    stream_conc = _section("stream_concurrent", lambda: bench_stream_concurrent(
        engine, texts, style_text, style_feats, timbre_feat
    ))
    chunk = _section("lm_chunk", lambda: bench_chunk(engine))
    cfm_steps = _section("cfm_steps", lambda: bench_cfm_steps(engine))
    retrieval = _section("retrieval", lambda: bench_retrieval(rng, rtt_s))
    if "error" in retrieval:
        retrieval = {"retrieval_error": retrieval["error"]}
    embedder = _section("embedder", lambda: bench_embedder_3b(
        rtt_s, synth_one=run_db
    ))
    # everything engine-dependent has run: drop the serving engine (and the
    # closures holding it) before the 4-5 GB embedder_7b / sft builds — the
    # co-residency story is embedder_3b's (measured above with the engine
    # live); training benchmarks a dedicated chip, like the reference's
    # dedicated train GPU (scripts/train_llm.sh)
    device_name = str(jax.devices()[0])
    del engine, run_db, run_cold, run8, first_chunk, _ttfb
    gc.collect()
    embedder7 = _section("embedder_7b",
                         lambda: bench_embedder_7b(rtt_s=rtt_s))
    zh_e2e = _section("zh_e2e", lambda: bench_zh_e2e(rtt_s))
    sft = _section("sft", lambda: bench_sft(rtt_s))

    print(
        json.dumps(
            {
                "metric": "tts_with_st_e2e_p50_latency",
                "value": round(p50, 4),
                "unit": "s/utt",
                "vs_baseline": round(BASELINE_S / p50, 3),
                "extra": {
                    "serving_path": "style-DB precomputed prompts, mixed-length texts",
                    "trained_engine": trained_params is not None,
                    "trained_quality": trained_quality,
                    "audio_seconds": round(audio_s, 3),
                    "rtf": round(rtf, 4),
                    "best_latency_s": round(best, 4),
                    "cold_path_p50_s": round(cold_p50, 4),
                    "rtt_floor_ms": round(rtt_s * 1e3, 1),
                    "streaming_ttfb_p50_s": round(ttfb, 4),
                    "streaming_ttfb_vs_e2e": round(ttfb / p50, 3),
                    "batch8_utt_per_s": round(batch_utt_per_s, 2),
                    "batch8_rtf": round(batch_rtf, 4),
                    "continuous_poisson": poisson,
                    "stream_concurrent": stream_conc,
                    "int8_lm": cfg.quantize_lm_int8,
                    "int8_kv": cfg.quantize_lm_kv_int8,
                    "cfm_headline": {"n_steps": cfg.cfm.n_steps,
                                     "use_cfg": cfg.cfm.use_cfg},
                    "p50_minus_device_sum_ms": round(
                        p50 * 1e3 - device_sum, 1
                    ),
                    "device": device_name,
                    "stage_p50_ms_synced": stage_synced,
                    "stage_p50_ms_device": stage_device,
                    "stage_device_sum_ms": round(device_sum, 1),
                    "lm_split": lm_split,
                    "lm_spec": lm_spec,
                    "lm_chunk": chunk,
                    "cfm_steps": cfm_steps,
                    **retrieval,
                    "embedder_3b": embedder,
                    "embedder_7b": embedder7,
                    "zh_e2e": zh_e2e,
                    "sft": sft,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
