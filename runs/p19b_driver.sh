#!/bin/bash
# Phase-19b driver (round 5, follow-up leg): run AFTER p19_driver completes.
#   1. fused-curriculum STATIC control (the mobile variant's Mosaic compile
#      is SIGKILLed by this image's AOT helper — static-only auto-enable)
#   2. 2mod-mobile arm via static->mobile continuation (fresh fits keep
#      landing in an EVA-weak basin)
#   3. re-run the thin-cell CI study (picks up any newly committed arms)
#   4. regenerate RESULTS.md + README bench block
set -u
cd "$(dirname "$0")/.."
LOG=runs/experiments19.log

probe_backend() {
  local tries=0
  while ! timeout 120 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
    tries=$((tries + 1))
    echo "[driver19b $(date +%H:%M:%S)] backend busy (probe $tries); waiting 60s" >>"$LOG"
    if [ "$tries" -ge 40 ]; then
      echo "[driver19b $(date +%H:%M:%S)] backend never freed; aborting" >>"$LOG"
      exit 1
    fi
    sleep 60
  done
}

step() {
  local t=$1; shift
  echo "[driver19b $(date +%H:%M:%S)] START ($t s cap): $*" >>"$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "[driver19b $(date +%H:%M:%S)] END rc=$rc: $*" >>"$LOG"
  if [ "$rc" -ne 0 ]; then
    probe_backend
  fi
}

step 5400 python runs/run_experiments19.py zfcontinue 121
step 3600 python scripts/fused_curriculum_control.py
step 7200 python scripts/claim_cell_ci_r5.py
step 1200 python3 -c "import jax; jax.config.update('jax_platforms','cpu'); import runpy; runpy.run_path('runs/make_results.py', run_name='__main__')"
echo "[driver19b $(date +%H:%M:%S)] PHASE19B DONE" >>"$LOG"
