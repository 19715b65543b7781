#!/bin/bash
# Phase-15e driver (round 4, final leg): everything the interrupted p15c/p15d
# legs still owe — the claim-cell CI study (killed mid-cell twice), the
# canonical parity-protocol resweeps (run_experiments16), the knee xprof
# trace, a fresh-process bench, and results regeneration.
set -u
cd "$(dirname "$0")/.."
LOG=runs/experiments15.log

probe_backend() {
  local tries=0
  while ! timeout 120 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
    tries=$((tries + 1))
    echo "[driver15e $(date +%H:%M:%S)] backend busy (probe $tries); waiting 60s" >>"$LOG"
    if [ "$tries" -ge 40 ]; then
      echo "[driver15e $(date +%H:%M:%S)] backend never freed; aborting" >>"$LOG"
      exit 1
    fi
    sleep 60
  done
}

step() {
  local t=$1; shift
  echo "[driver15e $(date +%H:%M:%S)] START ($t s cap): $*" >>"$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "[driver15e $(date +%H:%M:%S)] END rc=$rc: $*" >>"$LOG"
  if [ "$rc" -ne 0 ]; then
    probe_backend
  fi
}

step 10800 python scripts/claim_cell_ci.py
for nb in 2 1 3 4; do
  step 3600 python runs/run_experiments16.py resweep "$nb" static
  step 3600 python runs/run_experiments16.py resweep "$nb" mobile
done
# second pass picks up anything a timeout interrupted
for nb in 2 1 3 4; do
  step 3600 python runs/run_experiments16.py resweep "$nb" static
  step 3600 python runs/run_experiments16.py resweep "$nb" mobile
done
step 2700 python scripts/knee_probe_r4.py --trace
step 2700 python bench.py
step 1200 python3 -c "import jax; jax.config.update('jax_platforms','cpu'); import runpy; runpy.run_path('runs/make_results.py', run_name='__main__')"
echo "[driver15e $(date +%H:%M:%S)] PHASE15E DONE" >>"$LOG"
