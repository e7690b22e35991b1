#!/usr/bin/env bash
# Train the full synthesis stack (tokenizer -> token LM -> CFM -> vocoder GAN)
# on the formant-synthesis corpus at demo geometry, export a merged engine
# snapshot, and synthesize golden wavs. Runs on the default backend (TPU).
#
#   bash scripts/train_synth_demo.sh [WORKDIR]
set -euo pipefail
WORK=${1:-/tmp/synth_demo}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
CORPUS=$WORK/corpus
mkdir -p "$WORK"

if [ ! -f "$CORPUS/manifest.json" ]; then
  python -m autostyle_tts_tpu.cli.make_corpus \
    --out_dir "$CORPUS" --n_utts "${N_UTTS:-1500}" --n_speakers 24
fi

COMMON=(--demo --manifest "$CORPUS/manifest.json" --wav_dir "$CORPUS"
        --batch_size "${BS:-16}" --prompt_seconds 1.5)

# 1) speech tokenizer: VQ + supervised phonetic objective
python -m autostyle_tts_tpu.cli.train_acoustic "${COMMON[@]}" \
  --stage tokenizer --out_dir "$WORK/ck_tok" \
  --epochs "${EP_TOK:-8}" --learning_rate 3e-4 --save_every 200

# 2) merge the trained tokenizer so LM/CFM batches use phonetic tokens
python -m autostyle_tts_tpu.cli.export_engine --demo \
  --output "$WORK/engine_tok.npz" --stage_ckpt tokenizer="$WORK/ck_tok"

# 3) token LM on the trained-tokenizer engine
python -m autostyle_tts_tpu.cli.train_acoustic "${COMMON[@]}" \
  --checkpoint "$WORK/engine_tok.npz" \
  --stage token_lm --out_dir "$WORK/ck_lm" \
  --epochs "${EP_LM:-25}" --learning_rate 3e-4 --save_every 500

# 4) CFM mel decoder
python -m autostyle_tts_tpu.cli.train_acoustic "${COMMON[@]}" \
  --checkpoint "$WORK/engine_tok.npz" \
  --stage cfm --out_dir "$WORK/ck_cfm" \
  --epochs "${EP_CFM:-25}" --learning_rate 3e-4 --save_every 500

# 5) vocoder (HiFi-GAN recipe)
python -m autostyle_tts_tpu.cli.train_acoustic "${COMMON[@]}" \
  --checkpoint "$WORK/engine_tok.npz" \
  --stage vocoder_gan --out_dir "$WORK/ck_voc" \
  --epochs "${EP_VOC:-30}" --learning_rate 2e-4 --save_every 500

# 6) merged engine snapshot
python -m autostyle_tts_tpu.cli.export_engine --demo \
  --output "$WORK/engine_trained.npz" \
  --stage_ckpt tokenizer="$WORK/ck_tok" \
  --stage_ckpt token_lm="$WORK/ck_lm" \
  --stage_ckpt cfm="$WORK/ck_cfm" \
  --stage_ckpt vocoder="$WORK/ck_voc"

# 7) golden wavs: zero-shot synthesis with a corpus prompt
python - "$WORK" "$CORPUS" <<'EOF'
import json, sys
import numpy as np
from pathlib import Path
work, corpus = Path(sys.argv[1]), Path(sys.argv[2])
from autostyle_tts_tpu.cli.common import build_engine
import argparse
ns = argparse.Namespace(config=None, overrides=[], checkpoint=str(work/"engine_trained.npz"),
                        tiny=False, demo=True, seed=0, profile=False, dp=0, tp=1)
eng = build_engine(ns)
rows = json.load(open(corpus/"manifest.json"))
from autostyle_tts_tpu.utils.native_audio import load_wav_fast
from autostyle_tts_tpu.utils.audio_io import write_wav
out = work/"golden"; out.mkdir(exist_ok=True)
for i, r in enumerate(rows[:3]):
    prompt = load_wav_fast(str(corpus/r["wav"]), eng.cfg.audio.prompt_sample_rate)
    res = next(iter(eng.inference_zero_shot(rows[i+10]["text"], r["text"], prompt)))
    wav = np.asarray(res["tts_speech"]).ravel()
    write_wav(out/f"golden_{i}.wav", wav, eng.cfg.audio.sample_rate)
    print("golden", i, r["text"], "->", rows[i+10]["text"], wav.shape)
print("golden wavs ->", out)
EOF
echo "DONE: $WORK/engine_trained.npz"
