#!/bin/bash
# Phase-17b driver (round 4): takes over from p17 after the in-flight
# claim_cell_ci finishes (p17's bash was killed so the queue could be
# re-planned around the BPSK-mobile gate FAIL; the CI process itself was
# left running).  Usage: p17b_driver.sh <ci_pid>
set -u
cd "$(dirname "$0")/.."
LOG=runs/experiments15.log
CI_PID=${1:?need the running claim_cell_ci PID}

probe_backend() {
  local tries=0
  while ! timeout 120 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
    tries=$((tries + 1))
    echo "[driver17b $(date +%H:%M:%S)] backend busy (probe $tries); waiting 60s" >>"$LOG"
    if [ "$tries" -ge 40 ]; then
      echo "[driver17b $(date +%H:%M:%S)] backend never freed; aborting" >>"$LOG"
      exit 1
    fi
    sleep 60
  done
}

step() {
  local t=$1; shift
  echo "[driver17b $(date +%H:%M:%S)] START ($t s cap): $*" >>"$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "[driver17b $(date +%H:%M:%S)] END rc=$rc: $*" >>"$LOG"
  if [ "$rc" -ne 0 ]; then
    probe_backend
  fi
}

# wait for the CI process (max ~2.5h; it is under its own 7200s timeout)
for i in $(seq 1 160); do
  kill -0 "$CI_PID" 2>/dev/null || break
  sleep 60
done
echo "[driver17b $(date +%H:%M:%S)] claim_cell_ci (pid $CI_PID) finished" >>"$LOG"
probe_backend

step 2700 python runs/run_experiments17.py tagsweep 1 mobile
step 5400 python scripts/knee_probe_r5.py
step 1800 python bench.py
step 1800 python scripts/knee_probe_r4.py --trace
step 900 python3 -c "import jax; jax.config.update('jax_platforms','cpu'); import runpy; runpy.run_path('runs/make_results.py', run_name='__main__')"
echo "[driver17b $(date +%H:%M:%S)] PHASE17B DONE" >>"$LOG"
