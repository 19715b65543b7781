#!/bin/bash
# Phase-15f driver (round 4): waits for p15e to finish, then runs the
# knee isolation probe (fresh-process per measurement + AOT memory/cost
# analysis) — knee_probe_r5.py.
set -u
cd "$(dirname "$0")/.."
LOG=runs/experiments15.log

# wait for 15e (max 5h)
for i in $(seq 1 300); do
  if grep -q "PHASE15E DONE" "$LOG"; then break; fi
  sleep 60
done
if ! grep -q "PHASE15E DONE" "$LOG"; then
  echo "[driver15f $(date +%H:%M:%S)] p15e never finished; aborting" >>"$LOG"
  exit 1
fi

echo "[driver15f $(date +%H:%M:%S)] START: knee_probe_r5 orchestrator" >>"$LOG"
timeout 14400 python scripts/knee_probe_r5.py >>"$LOG" 2>&1
echo "[driver15f $(date +%H:%M:%S)] END rc=$?: knee_probe_r5" >>"$LOG"
echo "[driver15f $(date +%H:%M:%S)] PHASE15F DONE" >>"$LOG"
