#!/usr/bin/env bash
# ZH variant (reference scripts/train_llm_cn.sh; Qwen2.5-7B geometry).
set -euo pipefail
DATA=${1:-./cndata}
OUT=${2:-./finetuned_llm_cn}
python -m autostyle_tts_tpu.cli.ft_llm \
  --data_folder "$DATA" --data_name iemocap --language zh \
  --prompting_type spdescV2 --window 5 --re_gen_data \
  --do_train --do_eval_dev --do_eval_test \
  --seeds 42 43 44 45 46 --out_dir "$OUT"
