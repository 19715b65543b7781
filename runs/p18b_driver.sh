#!/bin/bash
# Phase-18b driver (round 4): after p18 finishes, tag-sweep every
# gate-failed rebuilt arm (mixRayleighTail third-arm table entries), then
# regenerate results.
set -u
cd "$(dirname "$0")/.."
LOG=runs/experiments15.log

for i in $(seq 1 240); do
  if grep -q "PHASE18 DONE" "$LOG"; then break; fi
  sleep 60
done
if ! grep -q "PHASE18 DONE" "$LOG"; then
  echo "[driver18b $(date +%H:%M:%S)] p18 never finished; aborting" >>"$LOG"
  exit 1
fi

echo "[driver18b $(date +%H:%M:%S)] START: tagsweep_failed" >>"$LOG"
timeout 5400 python runs/run_experiments17.py tagsweep_failed >>"$LOG" 2>&1
echo "[driver18b $(date +%H:%M:%S)] END rc=$?: tagsweep_failed" >>"$LOG"
timeout 900 python3 -c "import jax; jax.config.update('jax_platforms','cpu'); import runpy; runpy.run_path('runs/make_results.py', run_name='__main__')" >>"$LOG" 2>&1
echo "[driver18b $(date +%H:%M:%S)] PHASE18B DONE" >>"$LOG"
