#!/usr/bin/env bash
# per-line zero-shot driver (reference tts_prompt_generate.sh pointed at a
# missing tts_from_lines.py — provided here).
set -euo pipefail
python -m autostyle_tts_tpu.cli.tts_from_lines \
  --txt_path "${1:?txt}" --prompt_wav "${2:?prompt wav}" \
  --prompt_text "${3:?prompt text}" --result_dir "${4:?result dir}"
