#!/bin/bash
# Phase-18d driver (round 4, last stretch): 8QAM static via the proven
# equalizer-graft recipe from the rebuilt 16QAM static arm, then results.
set -u
cd "$(dirname "$0")/.."
LOG=runs/experiments15.log
step() {
  local t=$1; shift
  echo "[driver18d $(date +%H:%M:%S)] START ($t s cap): $*" >>"$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  echo "[driver18d $(date +%H:%M:%S)] END rc=$?: $*" >>"$LOG"
}
step 2700 python runs/run_experiments17.py graftrebuild 3
step 900 python3 -c "import jax; jax.config.update('jax_platforms','cpu'); import runpy; runpy.run_path('runs/make_results.py', run_name='__main__')"
echo "[driver18d $(date +%H:%M:%S)] PHASE18D DONE" >>"$LOG"
