#!/usr/bin/env bash
# dialog batch synthesis driver (reference dialog_generate.sh).
set -euo pipefail
python -m autostyle_tts_tpu.cli.tts_for_dialog \
  --corresponding_json "${1:?correspond json}" --dialogue_json "${2:?dialog jsonl}" \
  --style_wav_json "${3:?style db jsonl}" --style_wav_dir "${4:?style wav dir}" \
  --result_dir "${5:?result dir}" --timbre_map "${6:?timbre map}"
