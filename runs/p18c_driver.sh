#!/bin/bash
# Phase-18c driver (round 4, stretch): static 16QAM/8QAM arm rebuilds via
# continuation from the successfully rebuilt mobile arms (fresh-from-base
# fails for these modulations; phase-14 finding), then results regen.
# Marker-gated and gate-protected: a round-end kill mid-step is harmless.
set -u
cd "$(dirname "$0")/.."
LOG=runs/experiments15.log

probe_backend() {
  local tries=0
  while ! timeout 120 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
    tries=$((tries + 1))
    echo "[driver18c $(date +%H:%M:%S)] backend busy (probe $tries); waiting 60s" >>"$LOG"
    if [ "$tries" -ge 40 ]; then exit 1; fi
    sleep 60
  done
}

step() {
  local t=$1; shift
  echo "[driver18c $(date +%H:%M:%S)] START ($t s cap): $*" >>"$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "[driver18c $(date +%H:%M:%S)] END rc=$rc: $*" >>"$LOG"
  if [ "$rc" -ne 0 ]; then probe_backend; fi
}

step 2400 python runs/run_experiments17.py xrebuild 4
step 2400 python runs/run_experiments17.py xrebuild 3
step 900 python3 -c "import jax; jax.config.update('jax_platforms','cpu'); import runpy; runpy.run_path('runs/make_results.py', run_name='__main__')"
echo "[driver18c $(date +%H:%M:%S)] PHASE18C DONE" >>"$LOG"
