#!/bin/bash
# Ablation round 3: stock flash attention (v6), bf16 scores, int8 matmuls.
cd /root/repo
LOG=/root/repo/scripts/ablate_r2.log
# wait for any prior runner to drain (one TPU client at a time)
while pgrep -f "run_ablate_r2.sh" > /dev/null; do sleep 10; done
run() {
  echo "=== $* ===" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
  sleep 3
}

run env SPRC_ATTN_V=6 python scripts/ablate_r2.py attn
run env SPRC_PALLAS_ATTN=0 SPRC_ATTN_IMPL=einsum_bf16 python scripts/ablate_r2.py attn
run env SPRC_ABL_VARIANT=full SPRC_ATTN_V=6 python scripts/ablate_r2.py block
run env SPRC_ABL_VARIANT=int8 SPRC_ATTN_V=3 python scripts/ablate_r2.py block
run env SPRC_ABL_VARIANT=int8 SPRC_ATTN_V=6 python scripts/ablate_r2.py block
run env SPRC_ATTN_V=6 python bench.py
echo "ALL-DONE-3" >> "$LOG"
