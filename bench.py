"""End-to-end benchmark: p50 latency of one tts_with_style_timbre utterance.

Reference baseline (BASELINE.md): "<5s inference time" per utterance on a
single GPU (README.md:24); rebuild target <1s p50 per 24 kHz utterance on one
v5e chip (BASELINE.json). This bench runs the FULL flagship pipeline at
production geometry — prompt featurization (mel+tokenizer+speaker enc),
300M-class token-LM scan decode, 10-step CFM mel solve with CFG, HiFi-GAN
vocoder — on whatever device JAX selects (the driver runs it on the TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = reference_5s / our_p50 (higher is better, >1 beats baseline).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_S = 5.0  # reference README.md:24 "<5s inference time"


def main() -> None:
    import jax

    # persistent compile cache: first-ever run pays XLA compile (minutes via
    # the axon tunnel), later runs start hot
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from autostyle_tts_tpu.pipeline import Engine
    from autostyle_tts_tpu.utils.config import Config

    cfg = Config()
    # production serving config: int8 weight-only token LM (the reference
    # itself served its LLM 8-bit, milvus/RAG.py:89-92). ASTTTS_BENCH_INT8=0
    # benches the bf16 path instead.
    import os

    cfg.quantize_lm_int8 = os.environ.get("ASTTTS_BENCH_INT8", "1") != "0"
    engine = Engine(cfg, seed=0)

    sr = cfg.audio.prompt_sample_rate
    rng = np.random.default_rng(0)

    def prompt_wav(seconds: float, f: float) -> np.ndarray:
        t = np.arange(int(sr * seconds)) / sr
        return (
            0.4 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(len(t))
        ).astype(np.float32)

    style = prompt_wav(3.0, 200.0)
    timbre = prompt_wav(3.0, 150.0)
    text = "The quick brown fox jumps over the lazy dog near the river bank."
    style_text = "A short style transcript for the prompt."

    def run() -> np.ndarray:
        feats = engine.prompt_features([style, timbre])
        wavs = engine._synthesize(
            [text], [style_text], [feats[0]], [feats[1]], max_seconds=5.0
        )
        return wavs[0][None, :]

    # warmup / compile
    wav = run()
    audio_s = wav.shape[1] / cfg.audio.sample_rate

    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        wav = run()
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    best = float(np.min(times))
    rtf = p50 / max(audio_s, 1e-9)

    # secondary: batched serving throughput (8 utterances per device program)
    texts8 = [text] * 8
    stexts8 = [style_text] * 8
    styles8 = [style] * 8
    timbres8 = [timbre] * 8

    def run8():
        return engine.synthesize_batch(texts8, stexts8, styles8, timbres8,
                                       max_seconds=5.0)
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

    # secondary: retrieval QPS at 1k styles x 6144 dims (BASELINE.md target)
    from autostyle_tts_tpu.retrieval import StyleStore

    store = StyleStore(dim=6144, capacity=1024)
    store.insert(
        rng.standard_normal((1000, 6144)).astype(np.float32),
        [{"file_id": str(i), "text": ""} for i in range(1000)],
    )
    queries = rng.standard_normal((64, 6144)).astype(np.float32)
    store.search_arrays(queries, k=5)  # warm
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        store.search_arrays(queries, k=5)
    retrieval_qps = reps * len(queries) / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "tts_with_st_e2e_p50_latency",
                "value": round(p50, 4),
                "unit": "s/utt",
                "vs_baseline": round(BASELINE_S / p50, 3),
                "extra": {
                    "audio_seconds": round(audio_s, 3),
                    "rtf": round(rtf, 4),
                    "best_latency_s": round(best, 4),
                    "retrieval_qps_1k_styles_top5": round(retrieval_qps, 1),
                    "batch8_utt_per_s": round(batch_utt_per_s, 2),
                    "batch8_rtf": round(batch_rtf, 4),
                    "device": str(jax.devices()[0]),
                    "stage_p50_ms": {
                        k: round(v["p50_s"] * 1e3, 1)
                        for k, v in engine.watch.stats().items()
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    main()
