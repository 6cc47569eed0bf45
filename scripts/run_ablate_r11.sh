#!/bin/bash
cd /root/repo
LOG=/root/repo/scripts/ablate_r2.log
while pgrep -f "run_ablate_r10.sh" > /dev/null; do sleep 10; done
run() {
  echo "=== $* ===" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
  sleep 3
}
run env SPRC_ATTN_V=11 python scripts/ablate_r2.py attn
run env SPRC_ABL_VARIANT=int8s SPRC_ATTN_V=11 python scripts/ablate_r2.py block
run env SPRC_BENCH_MODE=index python bench.py
run env SPRC_BENCH_MODE=query python bench.py
echo "ALL-DONE-11" >> "$LOG"
