#!/bin/bash
# Phase-15d driver (round 4): canonical opt-12 sweeps under the
# reference-parity normalization protocol (see run_experiments16.py), then
# results regeneration.  Run AFTER p15c completes.
set -u
cd "$(dirname "$0")/.."
LOG=runs/experiments15.log

probe_backend() {
  local tries=0
  while ! timeout 120 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
    tries=$((tries + 1))
    echo "[driver15d $(date +%H:%M:%S)] backend busy (probe $tries); waiting 60s" >>"$LOG"
    if [ "$tries" -ge 40 ]; then
      echo "[driver15d $(date +%H:%M:%S)] backend never freed; aborting" >>"$LOG"
      exit 1
    fi
    sleep 60
  done
}

step() {
  local t=$1; shift
  echo "[driver15d $(date +%H:%M:%S)] START ($t s cap): $*" >>"$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "[driver15d $(date +%H:%M:%S)] END rc=$rc: $*" >>"$LOG"
  if [ "$rc" -ne 0 ]; then
    probe_backend
  fi
}

for nb in 2 1 3 4; do
  step 3600 python runs/run_experiments16.py resweep "$nb" static
  step 3600 python runs/run_experiments16.py resweep "$nb" mobile
done
# second pass picks up anything a timeout interrupted
for nb in 2 1 3 4; do
  step 3600 python runs/run_experiments16.py resweep "$nb" static
  step 3600 python runs/run_experiments16.py resweep "$nb" mobile
done
step 1200 python3 -c "import jax; jax.config.update('jax_platforms','cpu'); import runpy; runpy.run_path('runs/make_results.py', run_name='__main__')"
echo "[driver15d $(date +%H:%M:%S)] PHASE15D DONE" >>"$LOG"
