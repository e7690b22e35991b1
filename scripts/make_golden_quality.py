"""Record golden-wav quality statistics for the trained demo fixture.

  python scripts/make_golden_quality.py

Re-runs the EXACT computation tests/test_trained_demo.py::
test_golden_wav_regression performs (deterministic VC resynthesis of the
first three corpus-sample rows with a seed-0 engine) and writes the
reference stats to tests/fixtures/golden_quality.json. Run this after
retraining/repackaging the demo fixture; never edit the JSON by hand.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from autostyle_tts_tpu.ops.stft import log_mel_spectrogram
    from autostyle_tts_tpu.pipeline.engine import Engine, EngineParams
    from autostyle_tts_tpu.utils.checkpoint import load_pytree
    from autostyle_tts_tpu.utils.config import demo_config
    from autostyle_tts_tpu.utils.native_audio import load_wav_fast

    fixtures = REPO / "tests" / "fixtures"
    sample = fixtures / "demo_corpus_sample"
    cfg = demo_config()
    init = EngineParams.init(jax.random.PRNGKey(0), cfg)
    tree = load_pytree(fixtures / "demo_engine.npz", init.tree())
    params = EngineParams.from_tree(
        jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), tree)
    )
    a = cfg.audio
    rows = json.loads((sample / "manifest.json").read_text())
    golden = {}
    for row in rows[:3]:
        eng = Engine(cfg, params=params, seed=0)
        src = load_wav_fast(str(sample / row["wav"]), a.prompt_sample_rate)
        wav = np.asarray(
            next(iter(eng.inference_vc(src, src)))["tts_speech"]
        ).ravel()
        mel = np.asarray(log_mel_spectrogram(
            jnp.asarray(wav[None]), a.sample_rate, a.n_fft, a.hop_length,
            a.win_length, n_mels=a.n_mels, fmax=a.fmax,
        ))[0]
        golden[row["wav"]] = {
            "n_samples": int(wav.size),
            "rms": float(np.sqrt((wav ** 2).mean())),
            "mel_mean": [round(float(x), 5) for x in mel.mean(0)],
            "mel_std": [round(float(x), 5) for x in mel.std(0)],
        }
        print(row["wav"], "n", wav.size,
              "rms", round(golden[row["wav"]]["rms"], 4))
    out = fixtures / "golden_quality.json"
    out.write_text(json.dumps(golden, indent=1))
    print("->", out)


if __name__ == "__main__":
    main()
