#!/bin/bash
# Sequential TPU ablation run (ONE process at a time on the tunnel).
cd /root/repo
LOG=/root/repo/scripts/ablate_r2.log
run() {
  echo "=== $* ===" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
  sleep 3
}

run env SPRC_PALLAS_ATTN=1 SPRC_ATTN_V=4 python scripts/ablate_r2.py attn
run env SPRC_PALLAS_ATTN=1 SPRC_ATTN_V=3 python scripts/ablate_r2.py attn
run env SPRC_PALLAS_ATTN=0 python scripts/ablate_r2.py attn
run env SPRC_ABL_VARIANT=full SPRC_ATTN_V=4 python scripts/ablate_r2.py block
run env SPRC_ABL_VARIANT=full SPRC_ATTN_V=3 python scripts/ablate_r2.py block
run env SPRC_ABL_VARIANT=noln SPRC_ATTN_V=4 python scripts/ablate_r2.py block
run env SPRC_ABL_VARIANT=noattn python scripts/ablate_r2.py block
run env SPRC_ABL_VARIANT=nomlp SPRC_ATTN_V=4 python scripts/ablate_r2.py block
run env SPRC_ABL_VARIANT=mmonly python scripts/ablate_r2.py block
run env SPRC_ABL_VARIANT=full SPRC_PALLAS_ATTN=0 python scripts/ablate_r2.py block
run env SPRC_ATTN_V=4 python bench.py
echo "ALL-DONE-2" >> "$LOG"
