#!/bin/bash
# Phase-17 driver (round 4, recovery leg): the round-boundary cleanup wiped
# the gitignored runs/<token>/ checkpoint dirs, killing the p15c/p15d queue
# (claim_cell_ci and the parity resweeps crash on the missing arms).  This
# driver rebuilds the two contested claim-cell arms (fresh tail-curriculum
# recipe, no lost checkpoint needed), reruns the CI study against them,
# then the knee isolation probe, a fresh bench, the knee xprof trace, and
# results regeneration.
set -u
cd "$(dirname "$0")/.."
LOG=runs/experiments15.log

probe_backend() {
  local tries=0
  while ! timeout 120 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
    tries=$((tries + 1))
    echo "[driver17 $(date +%H:%M:%S)] backend busy (probe $tries); waiting 60s" >>"$LOG"
    if [ "$tries" -ge 40 ]; then
      echo "[driver17 $(date +%H:%M:%S)] backend never freed; aborting" >>"$LOG"
      exit 1
    fi
    sleep 60
  done
}

step() {
  local t=$1; shift
  echo "[driver17 $(date +%H:%M:%S)] START ($t s cap): $*" >>"$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "[driver17 $(date +%H:%M:%S)] END rc=$rc: $*" >>"$LOG"
  if [ "$rc" -ne 0 ]; then
    probe_backend
  fi
}

step 3600 python runs/run_experiments17.py rebuild 2 static
step 4500 python runs/run_experiments17.py rebuild 1 mobile
step 7200 python scripts/claim_cell_ci.py
step 5400 python scripts/knee_probe_r5.py
step 1800 python bench.py
step 1800 python scripts/knee_probe_r4.py --trace
step 900 python3 -c "import jax; jax.config.update('jax_platforms','cpu'); import runpy; runpy.run_path('runs/make_results.py', run_name='__main__')"
echo "[driver17 $(date +%H:%M:%S)] PHASE17 DONE" >>"$LOG"
