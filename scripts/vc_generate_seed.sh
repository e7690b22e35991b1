#!/usr/bin/env bash
# Seed-testset style x timbre matrix driver (reference vc_generate_seed.sh:1 —
# timbres drawn from a seedtts meta.lst instead of a wav dir).
set -euo pipefail
python -m autostyle_tts_tpu.cli.vc_from_dir_seed \
  --txt_path "${1:?txt}" --style_dir "${2:?style dir}" \
  --seed_meta_lst "${3:?seed meta.lst}" --result_dir "${4:?result dir}" \
  --style_num "${5:-2}" --timbre_num "${6:-2}" --style_json "${7:?style json}" \
  ${SEED_BASE_DIR:+--seed_base_dir "$SEED_BASE_DIR"}
