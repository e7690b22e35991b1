#!/usr/bin/env bash
# Big-corpus retrain of the production-geometry synthesis stack.
#
# The first prod run (scripts/train_synth_prod.sh, 4k utterances) produced a
# tokenizer that generalizes (held-out code-map accuracy 0.88) but an LM/CFM
# that MEMORIZED the corpus: LM train loss 0.9 vs held-out 5.97 (ln(4096)=8.3
# is chance), so generated tokens tracked text at PER~0.85. A ~250M LM needs
# far more than 4k tiny utterances. The corpus is synthetic (formant
# generator, train/synthcorpus.py) so data is free: this driver retrains
# LM/CFM/vocoder on a 24k-utterance/64-speaker corpus with the FIRST run's
# tokenizer kept frozen (its codes generalize; retraining it would also
# invalidate nothing — but frozen saves a stage and keeps prior diagnostics
# comparable).
#
#   bash scripts/train_synth_prod2.sh [WORKDIR2] [TOK_WORKDIR] [FROM_STAGE]
#   FROM_STAGE in lm|cfm|voc|export (default lm)
set -euo pipefail
WORK=${1:-/tmp/synth_prod2}
TOKWORK=${2:-/tmp/synth_prod}
FROM=${3:-lm}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
CORPUS=$WORK/corpus
ART=$REPO/artifacts/prod_engine
mkdir -p "$ART"
CPU_ENV=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
COMMON=(--manifest "$CORPUS/train_manifest.json" --wav_dir "$CORPUS"
        --prompt_seconds 1.5)

# hold out the tail 16 (same convention as train_synth_prod.sh)
[ -f "$CORPUS/train_manifest.json" ] || python - "$CORPUS" <<'PYEOF'
import json, sys
from pathlib import Path
corpus = Path(sys.argv[1])
rows = json.load(open(corpus / "manifest.json"))
json.dump(rows[:-16], open(corpus / "train_manifest.json", "w"))
print(f"train {len(rows)-16} / held-out 16")
PYEOF

# frozen tokenizer from the first prod run
[ -f "$WORK/engine_tok.npz" ] || cp "$TOKWORK/engine_tok.npz" "$WORK/engine_tok.npz"

# wait out a wedged device before burning a stage attempt on it — the
# tunneled device wedges silently between stages too (observed mid-run:
# the LM stage finished, then the CFM attempt hung in featurization until
# its 20-min watchdog fired), so probe before EVERY attempt, not just once
wait_device() {
  until timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128, 128)); np.asarray(x @ x)
print('device ok')
"; do
    echo "[prod2] device wedged — probe again in 2 min"
    sleep 120
  done
}

# train_acoustic exits 17 when its stall watchdog sees a wedged device;
# checkpoints make a rerun a resume, so retry (with a pause for the device)
run_stage() {
  local i rc
  for i in 1 2 3 4; do
    wait_device
    "$@" && return 0
    rc=$?
    [ "$rc" -ne 17 ] && return "$rc"
    echo "[prod2] stage watchdog-aborted (attempt $i) — waiting 3 min"
    sleep 180
  done
  return 1
}

case $FROM in lm) : ;; cfm) : ;; voc) : ;; export) : ;;
  *) echo "bad FROM_STAGE $FROM"; exit 1 ;; esac

if [ "$FROM" = lm ]; then
  run_stage python -m autostyle_tts_tpu.cli.train_acoustic "${COMMON[@]}" \
    --checkpoint "$WORK/engine_tok.npz" \
    --stage token_lm --out_dir "$WORK/ck_lm" --batch_size "${BS_LM:-32}" \
    --epochs "${EP_LM:-8}" --learning_rate "${LR_LM:-2e-4}" --save_every 1000
  FROM=cfm
fi
if [ "$FROM" = cfm ]; then
  run_stage python -m autostyle_tts_tpu.cli.train_acoustic "${COMMON[@]}" \
    --checkpoint "$WORK/engine_tok.npz" \
    --stage cfm --out_dir "$WORK/ck_cfm" --batch_size "${BS_CFM:-32}" \
    --epochs "${EP_CFM:-8}" --learning_rate "${LR_CFM:-2.5e-4}" --save_every 1000
  FROM=voc
fi
if [ "$FROM" = voc ]; then
  run_stage python -m autostyle_tts_tpu.cli.train_acoustic "${COMMON[@]}" \
    --checkpoint "$WORK/engine_tok.npz" \
    --stage vocoder_gan --out_dir "$WORK/ck_voc" --batch_size "${BS_VOC:-16}" \
    --epochs "${EP_VOC:-4}" --learning_rate 2e-4 --save_every 1000
fi

"${CPU_ENV[@]}" python -m autostyle_tts_tpu.cli.export_engine \
  --output "$ART/engine_trained.npz" \
  --stage_ckpt tokenizer="$TOKWORK/ck_tok" \
  --stage_ckpt token_lm="$WORK/ck_lm" \
  --stage_ckpt cfm="$WORK/ck_cfm" \
  --stage_ckpt vocoder="$WORK/ck_voc"

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

python scripts/eval_prod_quality.py --corpus "$CORPUS"
echo "DONE: $ART/engine_trained.npz"
