#!/bin/bash
# Phase-15b driver (round 4, second leg): perf probes + final bench +
# results regeneration.  Run AFTER p15_driver.sh completes (the bench reads
# runs/p15_bf16_control.json for the bf16 headline-eligibility gate).
set -u
cd "$(dirname "$0")/.."
LOG=runs/experiments15.log

probe_backend() {
  local tries=0
  while ! timeout 120 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
    tries=$((tries + 1))
    echo "[driver15b $(date +%H:%M:%S)] backend busy (probe $tries); waiting 60s" >>"$LOG"
    if [ "$tries" -ge 40 ]; then
      echo "[driver15b $(date +%H:%M:%S)] backend never freed; aborting" >>"$LOG"
      exit 1
    fi
    sleep 60
  done
}

step() {
  local t=$1; shift
  echo "[driver15b $(date +%H:%M:%S)] START ($t s cap): $*" >>"$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "[driver15b $(date +%H:%M:%S)] END rc=$rc: $*" >>"$LOG"
  if [ "$rc" -ne 0 ]; then
    probe_backend
  fi
}

step 3600 python scripts/doppler_prng_xcheck.py
step 5400 python scripts/claim_cell_ci.py
step 2700 python scripts/knee_probe_r4.py
step 2700 python bench.py
# results aggregation runs on CPU (no chip contention)
step 1200 python3 -c "import jax; jax.config.update('jax_platforms','cpu'); import runpy; runpy.run_path('runs/make_results.py', run_name='__main__')"
echo "[driver15b $(date +%H:%M:%S)] PHASE15B DONE" >>"$LOG"
