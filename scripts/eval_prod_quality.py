"""Quality gates for the PRODUCTION-geometry trained engine (r4 VERDICT #1).

Loads artifacts/prod_engine/engine_trained.npz (built by
scripts/train_synth_prod*.sh at the default Config() geometry — the same
geometry bench.py's headline serves) plus its held-out corpus sample, and
measures the trained gates AT THAT GEOMETRY:

- cluster purity     each VQ code tracks ONE phoneme (token-keyed purity;
                     the demo suite's phoneme-keyed purity is also reported
                     but not gated: with a 4096-code production codebook a
                     single phoneme legitimately spreads over many codes,
                     so the phoneme-keyed number collapses even for a
                     perfectly phonetic tokenizer)
- code-map accuracy  held-out frame accuracy of the code->phoneme lookup
                     recognizer FITTED ON TRAIN utterances (fit-set size
                     must scale with the codebook — see
                     pipeline/simeval.fit_code_map)
- lm_token_per       PER of the token LM's OWN output (generated speech
                     tokens -> code-map phonemes vs the input text) —
                     isolates text->token alignment from acoustic quality
- PER                phoneme error rate of synthesized AUDIO vs its input
                     text (pipeline/simeval.phoneme_error_rate): the full
                     text -> LM -> CFM -> vocoder -> recognizer loop
- spectral ratio     zero-shot synthesis is speech-like, not noise
- SV similarity      timbre conditioning: synth-vs-A > synth-vs-B

Writes artifacts/prod_engine/quality.json — bench.py folds it into the
round artifact so the headline's provenance (trained weights + measured
quality) is visible in BENCH_r*.json.

  python scripts/eval_prod_quality.py [--art artifacts/prod_engine]
      [--corpus /tmp/synth_prod2/corpus] [--fit_utts 768]
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


def _default_corpus() -> str:
    for c in ("/tmp/synth_prod2/corpus", "/tmp/synth_prod/corpus"):
        if (Path(c) / "train_manifest.json").exists():
            return c
    return ""


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--art", type=str,
                   default=str(REPO / "artifacts" / "prod_engine"))
    p.add_argument("--corpus", type=str, default=_default_corpus(),
                   help="train corpus dir (train_manifest.json + wavs/phn) "
                        "for fitting the code-map recognizer")
    p.add_argument("--fit_utts", type=int, default=768,
                   help="train utterances the code map is fitted on")
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
        PhonemeRecognizer, SpeakerScorer, collapse_phoneme_frames,
        fit_code_map, levenshtein, phoneme_error_rate, text_to_phoneme_ids,
    )
    from autostyle_tts_tpu.utils.native_audio import load_wav_fast

    engine = load_engine(art, tiny=args.tiny)
    a = engine.cfg.audio
    sample = art / "corpus_sample"
    rows = json.loads((sample / "manifest.json").read_text())
    wavs = [load_wav_fast(str(sample / r["wav"]), a.prompt_sample_rate)
            for r in rows]
    phns = [np.load(sample / r["phn"]) for r in rows]
    feats = engine.prompt_features(wavs)   # ONE batched dispatch

    out = {"geometry": ("demo" if args.tiny else
                        "production Config() — the bench headline geometry"),
           "held_out_utts": len(rows)}

    # ---- tokenizer purity (both keys; only the token key is gated) -------
    by_phn = defaultdict(Counter)
    by_tok = defaultdict(Counter)
    total = 0
    for f, phn in zip(feats, phns):
        n = min(len(f.tokens), len(phn))
        for t, pp in zip(f.tokens[:n], phn[:n]):
            by_phn[int(pp)][int(t)] += 1
            by_tok[int(t)][int(pp)] += 1
            total += 1
    out["cluster_purity"] = round(
        sum(c.most_common(1)[0][1] for c in by_tok.values()) / max(total, 1), 4)
    out["phoneme_keyed_purity_info"] = round(
        sum(c.most_common(1)[0][1] for c in by_phn.values()) / max(total, 1), 4)
    out["codes_seen_held_out"] = len(by_tok)

    # ---- code-map recognizer: FIT ON TRAIN, evaluate held out ------------
    corpus = Path(args.corpus) if args.corpus else None
    if corpus and (corpus / "train_manifest.json").exists():
        train_rows = json.load(open(corpus / "train_manifest.json"))
        fit_rows = train_rows[: args.fit_utts]
        t0 = time.time()
        fw = [load_wav_fast(str(corpus / r["wav"]), a.prompt_sample_rate)
              for r in fit_rows]
        fp = [np.load(corpus / r["phn"]) for r in fit_rows]
        cm = fit_code_map(engine, fw, fp)
        out["code_map_fit"] = {
            "fit_utts": len(fit_rows),
            "codes_mapped": int((cm > 0).sum()),
            "fit_wall_s": round(time.time() - t0, 1),
        }
        del fw, fp
    else:
        # no train corpus available: degrade to fitting on the sample
        # (small-codebook geometries only — see fit_code_map docstring)
        cm = fit_code_map(engine, wavs, phns)
        out["code_map_fit"] = {"fit_utts": len(rows), "fallback": True}
    accs = []
    for f, phn in zip(feats, phns):
        n = min(len(f.tokens), len(phn))
        if n:
            accs.append(float((cm[f.tokens[:n]]
                               == np.clip(phn[:n], 0, 63)).mean()))
    out["code_map_holdout_acc"] = round(float(np.mean(accs)), 4)

    # ---- LM text-tracking: PER of generated TOKENS (no acoustics) --------
    by_spk = {}
    for r, w, f in zip(rows, wavs, feats):
        by_spk.setdefault(r["speaker"], (r, w, f))
    spk_items = list(by_spk.values())
    lm_pers = []
    for i in range(min(args.n_synth, len(rows))):
        text = rows[-(i + 1)]["text"]
        expected = text_to_phoneme_ids(text)
        ra, wa, fa = spk_items[i % len(spk_items)]
        gen_tokens, gen_lens, _ = engine._lm_stage(
            [text], [ra["text"]], [fa], np.stack([fa.spk]), None, 5.0)
        toks = np.asarray(gen_tokens)[0, : int(np.asarray(gen_lens)[0])]
        pred = collapse_phoneme_frames(cm[toks])
        lm_pers.append(levenshtein(pred, expected) / max(1, len(expected)))
    out["lm_token_per"] = round(float(np.mean(lm_pers)), 4)
    out["lm_token_per_each"] = [round(x, 3) for x in lm_pers]

    # ---- synthesis gates --------------------------------------------------
    rec = PhonemeRecognizer(engine, code_map=cm)
    scorer = SpeakerScorer(engine)
    pers, ratios = [], []
    sims_a, sims_b = [], []
    t0 = time.time()
    for i in range(min(args.n_synth, len(rows))):
        text = rows[-(i + 1)]["text"]
        (ra, wa, fa) = spk_items[i % len(spk_items)]
        (rb, wb, fb) = spk_items[(i + 1) % len(spk_items)]
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
    out["synth_wall_s"] = round(time.time() - t0, 1)
    out["per_mean"] = round(float(np.mean(pers)), 4)
    out["per_each"] = [round(x, 3) for x in pers]
    out["spectral_lowband_ratio"] = round(float(np.mean(ratios)), 4)
    if sims_a:
        out["sv_sim_same"] = round(float(np.mean(sims_a)), 4)
        out["sv_sim_other"] = round(float(np.mean(sims_b)), 4)
        out["sv_margin"] = round(float(np.mean(sims_a) - np.mean(sims_b)), 4)

    # ---- acoustic round trip: known tokens -> CFM -> vocoder -> recognizer
    # (phoneme level, not raw code ids: with a 4096-code codebook,
    # resynthesized audio legitimately re-tokenizes onto NEIGHBOURING codes
    # of the same phoneme; raw-id agreement only works for tiny codebooks)
    rts = []
    for i in range(min(3, len(spk_items))):
        ra, wa, fa = spk_items[i]
        vc = next(iter(engine.inference_vc(wa, wa)))
        wav_out = np.asarray(vc["tts_speech"]).ravel()
        w16 = resample_poly_np(wav_out, a.sample_rate, a.prompt_sample_rate)
        f2 = engine.prompt_features([w16])[0]
        m = min(len(f2.tokens), len(fa.tokens))
        if m:
            seq_in = collapse_phoneme_frames(cm[fa.tokens[:m]])
            seq_out = collapse_phoneme_frames(cm[f2.tokens[:m]])
            rts.append(1.0 - levenshtein(seq_out, seq_in)
                       / max(1, len(seq_in)))
    if rts:
        out["phoneme_round_trip"] = round(float(np.mean(rts)), 4)

    out["gates"] = {
        "cluster_purity>0.85": bool(out["cluster_purity"] > 0.85),
        "code_map_holdout_acc>0.75": bool(out["code_map_holdout_acc"] > 0.75),
        "spectral_ratio>0.90": bool(out["spectral_lowband_ratio"] > 0.90),
        "lm_token_per<0.5": bool(out["lm_token_per"] < 0.5),
        "per<0.5": bool(out["per_mean"] < 0.5),
        "sv_same>other": bool(out.get("sv_margin", 0) > 0),
    }
    (art / "quality.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
