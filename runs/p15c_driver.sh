#!/bin/bash
# Phase-15c driver (round 4, third leg): fixed claim-cell CI study, a
# fresh-process bench rerun (the 15b bench ran in a degraded regime:
# d2h fence 33 ms vs the usual ~24, every step ~2x slow), and the knee
# xprof trace for diagnosis.
set -u
cd "$(dirname "$0")/.."
LOG=runs/experiments15.log

probe_backend() {
  local tries=0
  while ! timeout 120 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
    tries=$((tries + 1))
    echo "[driver15c $(date +%H:%M:%S)] backend busy (probe $tries); waiting 60s" >>"$LOG"
    if [ "$tries" -ge 40 ]; then
      echo "[driver15c $(date +%H:%M:%S)] backend never freed; aborting" >>"$LOG"
      exit 1
    fi
    sleep 60
  done
}

step() {
  local t=$1; shift
  echo "[driver15c $(date +%H:%M:%S)] START ($t s cap): $*" >>"$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "[driver15c $(date +%H:%M:%S)] END rc=$rc: $*" >>"$LOG"
  if [ "$rc" -ne 0 ]; then
    probe_backend
  fi
}

step 7200 python scripts/claim_cell_ci.py
step 2700 python bench.py
step 2700 python scripts/knee_probe_r4.py --trace
step 1200 python3 -c "import jax; jax.config.update('jax_platforms','cpu'); import runpy; runpy.run_path('runs/make_results.py', run_name='__main__')"
echo "[driver15c $(date +%H:%M:%S)] PHASE15C DONE" >>"$LOG"
