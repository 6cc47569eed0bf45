#!/bin/bash
# Round-5 chip session ladder (one process at a time on the tunnel):
#   query  - bf16 query A/B: default perhead vs perhead_nomax (VERDICT r4 #6)
#   eva    - EVA ViT-g bf16 G-retry ladder (VERDICT r4 #4): per-head
#            attention forms at G=8/G=4 vs the blocked batched G=8
# Usage: scripts/run_r5_chip.sh <query|eva> [logfile]
set -u
cd "$(dirname "$0")/.."
step="${1:?query|eva}"
log="${2:-/tmp/r5_${step}.log}"

case "$step" in
  query)
    {
      echo "=== query baseline (perhead) ==="
      timeout 1800 python bench.py --mode query
      echo "=== query perhead_nomax ==="
      SPRC_QF_ATTN=perhead_nomax timeout 1800 python bench.py --mode query
    } >"$log" 2>&1
    ;;
  eva)
    {
      echo "=== EVA bf16 G ladder (b1024) ==="
      SPRC_BENCH_VIT=eva SPRC_ABL_BATCH=1024 \
        SPRC_ABL_COMBOS=G8_perheadattn,G8,nomax+G8,G4_perheadattn \
        timeout 5400 python scripts/ablate_encode.py variants
    } >"$log" 2>&1
    ;;
  *) echo "unknown step $step" >&2; exit 2 ;;
esac
grep -hE '^\{' "$log" | tail -20
