#!/usr/bin/env bash
# Fixed style+timbre per-line TTS driver (reference tts_with_st_generate.sh:1).
# IS_EXP=true selects the two-stage zero-shot+VC experiment mode (--is_exp).
set -euo pipefail
python -m autostyle_tts_tpu.cli.tts_with_style_and_timbre \
  --txt_path "${1:?txt}" --style_wav_path "${2:?style wav}" \
  --style_wav_text "${3:?style text}" --timbre_wav_path "${4:?timbre wav}" \
  --result_dir "${5:?result dir}" --is_exp "${IS_EXP:-false}"
