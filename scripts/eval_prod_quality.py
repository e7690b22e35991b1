"""Quality gates for the PRODUCTION-geometry trained engine (r4 VERDICT #1).

Loads artifacts/prod_engine/engine_trained.npz (built by
scripts/train_synth_prod.sh at the default Config() geometry — the same
geometry bench.py's headline serves) plus its held-out corpus sample, and
measures the trained-demo gates AT THAT GEOMETRY:

- token purity       trained speech tokens track phoneme identity
                     (tests/test_trained_demo.py::test_tokenizer_is_phonetic)
- spectral ratio     zero-shot synthesis is speech-like, not noise
- SV similarity      timbre conditioning: synth-vs-A > synth-vs-B
- token round trip   tokens -> CFM -> vocoder -> tokenizer agreement
- PER                phoneme error rate of synthesized audio vs its input
                     text via a code-map recognizer fitted on held-out data
                     (pipeline/simeval.phoneme_error_rate)

Writes artifacts/prod_engine/quality.json — bench.py folds it into the
round artifact so the headline's provenance (trained weights + measured
quality) is visible in BENCH_r*.json.

  python scripts/eval_prod_quality.py [--art artifacts/prod_engine]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def load_engine(art: Path, tiny: bool = False):
    import jax
    import jax.numpy as jnp

    from autostyle_tts_tpu.pipeline.engine import Engine, EngineParams
    from autostyle_tts_tpu.utils.checkpoint import load_pytree
    from autostyle_tts_tpu.utils.config import Config, demo_config

    cfg = demo_config() if tiny else Config()
    init = EngineParams.init(jax.random.PRNGKey(0), cfg)
    tree = load_pytree(art / "engine_trained.npz", init.tree())
    params = EngineParams.from_tree(
        jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), tree)
    )
    return Engine(cfg, params=params)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--art", type=str,
                   default=str(REPO / "artifacts" / "prod_engine"))
    p.add_argument("--n_synth", type=int, default=6,
                   help="held-out texts to synthesize for PER/round-trip")
    p.add_argument("--tiny", action="store_true",
                   help="demo geometry (CPU validation of the script)")
    args = p.parse_args()
    art = Path(args.art)

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from collections import Counter, defaultdict

    from autostyle_tts_tpu.ops.resample import resample_poly_np
    from autostyle_tts_tpu.pipeline.simeval import (
        PhonemeRecognizer, SpeakerScorer, fit_code_map, phoneme_error_rate,
        token_round_trip,
    )
    from autostyle_tts_tpu.utils.native_audio import load_wav_fast

    engine = load_engine(art, tiny=args.tiny)
    a = engine.cfg.audio
    sample = art / "corpus_sample"
    rows = json.loads((sample / "manifest.json").read_text())
    wavs = [load_wav_fast(str(sample / r["wav"]), a.prompt_sample_rate)
            for r in rows]
    phns = [np.load(sample / r["phn"]) for r in rows]

    out = {"geometry": ("demo" if args.tiny else "production Config() — the bench headline geometry"),
           "held_out_utts": len(rows)}

    # ---- token purity ---------------------------------------------------
    votes = defaultdict(Counter)
    total = 0
    for wav, phn in zip(wavs, phns):
        feats = engine.prompt_features([wav])[0]
        n = min(len(feats.tokens), len(phn))
        for t, pp in zip(feats.tokens[:n], phn[:n]):
            votes[int(pp)][int(t)] += 1
            total += 1
    purity = sum(c.most_common(1)[0][1] for c in votes.values()) / max(total, 1)
    out["token_purity"] = round(float(purity), 4)

    # ---- synthesis gates -------------------------------------------------
    rec = PhonemeRecognizer(engine, code_map=fit_code_map(engine, wavs, phns))
    scorer = SpeakerScorer(engine)
    by_spk = {}
    for r, w in zip(rows, wavs):
        by_spk.setdefault(r["speaker"], (r, w))
    spk_items = list(by_spk.values())
    pers, ratios, rts = [], [], []
    sims_a, sims_b = [], []
    t0 = time.time()
    for i in range(min(args.n_synth, len(rows))):
        text = rows[-(i + 1)]["text"]
        (ra, wa) = spk_items[i % len(spk_items)]
        (rb, wb) = spk_items[(i + 1) % len(spk_items)]
        res = next(iter(engine.inference_tts_with_st(text, ra["text"], wa, wa)))
        wav = np.asarray(res["tts_speech"]).ravel()
        assert np.isfinite(wav).all()
        spec = np.abs(np.fft.rfft(wav * np.hanning(wav.size))) ** 2
        freqs = np.fft.rfftfreq(wav.size, 1 / a.sample_rate)
        ratios.append(float(spec[freqs < 4000].sum() / max(spec.sum(), 1e-9)))
        pers.append(float(phoneme_error_rate(rec, wav, text)))
        wav16 = resample_poly_np(wav, a.sample_rate, a.prompt_sample_rate)
        if len(spk_items) >= 2:
            sims_a.append(float(scorer.similarity([wav16], [wa])[0]))
            sims_b.append(float(scorer.similarity([wav16], [wb])[0]))
        # round trip: the VC path makes the expected tokens exact (no LM
        # sampling) — tokenize the prompt, resynthesize it, re-tokenize
        feats = engine.prompt_features([wa])[0]
        vc = next(iter(engine.inference_vc(wa, wa)))
        agree, n_cmp = token_round_trip(engine, vc["tts_speech"], feats.tokens)
        if n_cmp:
            rts.append(float(agree))
    out["synth_wall_s"] = round(time.time() - t0, 1)
    out["per_mean"] = round(float(np.mean(pers)), 4)
    out["per_each"] = [round(x, 3) for x in pers]
    out["spectral_lowband_ratio"] = round(float(np.mean(ratios)), 4)
    if sims_a:
        out["sv_sim_same"] = round(float(np.mean(sims_a)), 4)
        out["sv_sim_other"] = round(float(np.mean(sims_b)), 4)
        out["sv_margin"] = round(float(np.mean(sims_a) - np.mean(sims_b)), 4)
    if rts:
        out["token_round_trip"] = round(float(np.mean(rts)), 4)

    out["gates"] = {
        "token_purity>0.85": bool(out["token_purity"] > 0.85),
        "spectral_ratio>0.90": bool(out["spectral_lowband_ratio"] > 0.90),
        "per<0.5": bool(out["per_mean"] < 0.5),
        "sv_same>other": bool(out.get("sv_margin", 0) > 0),
    }
    (art / "quality.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
