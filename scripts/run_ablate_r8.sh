#!/bin/bash
cd /root/repo
LOG=/root/repo/scripts/ablate_r2.log
while pgrep -f "run_bench_r7.sh" > /dev/null; do sleep 10; done
run() {
  echo "=== $* ===" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
  sleep 3
}
run python scripts/ablate_r2.py layout
echo "ALL-DONE-8" >> "$LOG"
