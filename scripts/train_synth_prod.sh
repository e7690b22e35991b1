#!/usr/bin/env bash
# Train the synthesis stack at PRODUCTION geometry (the default Config():
# ~250M token LM + dim-512 CFM + iSTFT vocoder + dim-512 tokenizer — the
# exact geometry bench.py's headline runs) on the formant-synthesis corpus,
# and export the merged engine snapshot that bench.py serves when present
# (r4 VERDICT #1: the trained evidence and the benchmarked geometry must
# coincide).
#
#   bash scripts/train_synth_prod.sh [WORKDIR]
#
# The merged snapshot lands in artifacts/prod_engine/ (gitignored — ~1.3 GB;
# scripts/eval_prod_quality.py writes the checked-in quality.json next to it).
set -euo pipefail
WORK=${1:-/tmp/synth_prod}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
CORPUS=$WORK/corpus
ART=$REPO/artifacts/prod_engine
mkdir -p "$WORK" "$ART"

if [ ! -f "$CORPUS/manifest.json" ]; then
  python -m autostyle_tts_tpu.cli.make_corpus \
    --out_dir "$CORPUS" --n_utts "${N_UTTS:-4000}" --n_speakers "${N_SPK:-32}"
fi
# true held-out split: the last 16 utterances never enter training
python - "$CORPUS" <<'PYEOF'
import json, sys
from pathlib import Path
corpus = Path(sys.argv[1])
rows = json.load(open(corpus / "manifest.json"))
json.dump(rows[:-16], open(corpus / "train_manifest.json", "w"))
print(f"train {len(rows)-16} / held-out 16")
PYEOF

COMMON=(--manifest "$CORPUS/train_manifest.json" --wav_dir "$CORPUS"
        --prompt_seconds 1.5)

# 1) speech tokenizer (dim 512 L6, codebook 4096): VQ + supervised phonetics
python -m autostyle_tts_tpu.cli.train_acoustic "${COMMON[@]}" \
  --stage tokenizer --out_dir "$WORK/ck_tok" --batch_size "${BS_TOK:-16}" \
  --epochs "${EP_TOK:-6}" --learning_rate 3e-4 --save_every 500

# 2) merge the trained tokenizer so LM/CFM batches use phonetic tokens.
# export_engine is pure param plumbing (npz -> npz) — run it on the CPU
# backend: fetching ~1.3 GB through the TPU tunnel wedged the device once
# (the known axon wedge, see bench.py _device_watchdog)
CPU_ENV=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
"${CPU_ENV[@]}" python -m autostyle_tts_tpu.cli.export_engine \
  --output "$WORK/engine_tok.npz" --stage_ckpt tokenizer="$WORK/ck_tok"

# 3) token LM (~250M)
python -m autostyle_tts_tpu.cli.train_acoustic "${COMMON[@]}" \
  --checkpoint "$WORK/engine_tok.npz" \
  --stage token_lm --out_dir "$WORK/ck_lm" --batch_size "${BS_LM:-16}" \
  --epochs "${EP_LM:-20}" --learning_rate "${LR_LM:-1.5e-4}" --save_every 1000

# 4) CFM mel decoder (dim 512 L8)
python -m autostyle_tts_tpu.cli.train_acoustic "${COMMON[@]}" \
  --checkpoint "$WORK/engine_tok.npz" \
  --stage cfm --out_dir "$WORK/ck_cfm" --batch_size "${BS_CFM:-16}" \
  --epochs "${EP_CFM:-20}" --learning_rate "${LR_CFM:-2e-4}" --save_every 1000

# 5) vocoder (iSTFT/Vocos kind — the flagship default — under the GAN recipe)
python -m autostyle_tts_tpu.cli.train_acoustic "${COMMON[@]}" \
  --checkpoint "$WORK/engine_tok.npz" \
  --stage vocoder_gan --out_dir "$WORK/ck_voc" --batch_size "${BS_VOC:-16}" \
  --epochs "${EP_VOC:-24}" --learning_rate 2e-4 --save_every 1000

# 6) merged engine snapshot -> the bench-served artifact (CPU: see step 2)
"${CPU_ENV[@]}" python -m autostyle_tts_tpu.cli.export_engine \
  --output "$ART/engine_trained.npz" \
  --stage_ckpt tokenizer="$WORK/ck_tok" \
  --stage_ckpt token_lm="$WORK/ck_lm" \
  --stage_ckpt cfm="$WORK/ck_cfm" \
  --stage_ckpt vocoder="$WORK/ck_voc"

# 7) held-out corpus sample for the quality gates (small, lives with the
#    artifact) + the gates themselves
python - "$ART" "$CORPUS" <<'EOF'
import json, shutil, sys
from pathlib import Path
art, corpus = Path(sys.argv[1]), Path(sys.argv[2])
rows = json.load(open(corpus / "manifest.json"))
sample = rows[-16:]                      # tail = held out by convention
out = art / "corpus_sample"
for r in sample:
    for key in ("wav", "phn"):
        dst = out / r[key]
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(corpus / r[key], dst)
json.dump(sample, open(out / "manifest.json", "w"))
print("sample ->", out)
EOF

python scripts/eval_prod_quality.py
echo "DONE: $ART/engine_trained.npz"
