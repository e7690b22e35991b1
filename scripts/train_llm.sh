#!/usr/bin/env bash
# 5-seed ERC LoRA sweep (reference scripts/train_llm.sh protocol:
# EP=3 LR=3e-4 linear LORA_R=32 WINDOW=5 MAX_SEQ_LEN=1024, seeds 42..46).
set -euo pipefail
DATA=${1:-./data}
OUT=${2:-./finetuned_llm}
python -m autostyle_tts_tpu.cli.ft_llm \
  --data_folder "$DATA" --data_name iemocap --language en \
  --prompting_type spdescV2 --window 5 --re_gen_data \
  --do_train --do_eval_dev --do_eval_test \
  --seeds 42 43 44 45 46 --out_dir "$OUT"
