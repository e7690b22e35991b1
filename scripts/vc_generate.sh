#!/usr/bin/env bash
# style x timbre matrix eval driver (reference vc_generate.sh).
set -euo pipefail
python -m autostyle_tts_tpu.cli.vc_from_dir \
  --txt_path "${1:?txt}" --style_dir "${2:?style dir}" \
  --timbre_dir "${3:?timbre dir}" --result_dir "${4:?result dir}" \
  --style_num "${5:-2}" --timbre_num "${6:-2}" --style_json "${7:?style json}"
