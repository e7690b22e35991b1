#!/usr/bin/env bash
# RAG synthesis driver (reference tts_with_rag.sh).
set -euo pipefail
python -m autostyle_tts_tpu.cli.tts_with_rag \
  --corresponding_json "${1:?retrieval jsonl}" \
  --result_dir "${2:?result dir}" \
  --timbre_map "${3:?timbre map (id=path,... or json)}"
