#!/bin/bash
# Phase-18 driver (round 4, final leg): rebuild the five remaining
# claim-table ZF arms with the fresh tail-curriculum recipe (live
# checkpoints again after the round-boundary cleanup, plus a shot at
# parity-protocol cell improvements under the no-regression gate), then
# regenerate results.  Value order: QPSK-mobile (slimmest margin), 16QAM
# static, 16QAM mobile, 8QAM static, 8QAM mobile.
set -u
cd "$(dirname "$0")/.."
LOG=runs/experiments15.log

probe_backend() {
  local tries=0
  while ! timeout 120 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
    tries=$((tries + 1))
    echo "[driver18 $(date +%H:%M:%S)] backend busy (probe $tries); waiting 60s" >>"$LOG"
    if [ "$tries" -ge 40 ]; then
      echo "[driver18 $(date +%H:%M:%S)] backend never freed; aborting" >>"$LOG"
      exit 1
    fi
    sleep 60
  done
}

step() {
  local t=$1; shift
  echo "[driver18 $(date +%H:%M:%S)] START ($t s cap): $*" >>"$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "[driver18 $(date +%H:%M:%S)] END rc=$rc: $*" >>"$LOG"
  if [ "$rc" -ne 0 ]; then
    probe_backend
  fi
}

step 3600 python runs/run_experiments17.py rebuild 2 mobile
step 3600 python runs/run_experiments17.py rebuild 4 static
step 3600 python runs/run_experiments17.py rebuild 4 mobile
step 3600 python runs/run_experiments17.py rebuild 3 static
step 3600 python runs/run_experiments17.py rebuild 3 mobile
# second pass picks up anything a timeout interrupted
step 3600 python runs/run_experiments17.py rebuild 2 mobile
step 3600 python runs/run_experiments17.py rebuild 4 static
step 3600 python runs/run_experiments17.py rebuild 4 mobile
step 3600 python runs/run_experiments17.py rebuild 3 static
step 3600 python runs/run_experiments17.py rebuild 3 mobile
step 900 python3 -c "import jax; jax.config.update('jax_platforms','cpu'); import runpy; runpy.run_path('runs/make_results.py', run_name='__main__')"
echo "[driver18 $(date +%H:%M:%S)] PHASE18 DONE" >>"$LOG"
