#!/bin/bash
cd /root/repo
LOG=/root/repo/scripts/ablate_r2.log
while pgrep -f "run_ablate_r6.sh" > /dev/null; do sleep 10; done
echo "=== bench all (v3 attn) ===" >> "$LOG"
python bench.py >> "$LOG" 2>&1
echo "--- rc=$? ---" >> "$LOG"
echo "ALL-DONE-7" >> "$LOG"
