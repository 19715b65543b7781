#!/bin/bash
# Phase-15 driver (round 4).  Serializes all chip work as SEPARATE processes
# under wall-clock timeouts; every step is resumable (done-marker JSON /
# output CSVs), so rerunning this driver continues where it left off.
# After any nonzero rc the backend is probed before the next step (a
# timeout-killed chip process holds the axon lease ~25-30 min).
set -u
cd "$(dirname "$0")/.."
LOG=runs/experiments15.log

probe_backend() {
  local tries=0
  while ! timeout 120 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
    tries=$((tries + 1))
    echo "[driver $(date +%H:%M:%S)] backend busy (probe $tries); waiting 60s" >>"$LOG"
    if [ "$tries" -ge 40 ]; then
      echo "[driver $(date +%H:%M:%S)] backend never freed; aborting" >>"$LOG"
      exit 1
    fi
    sleep 60
  done
}

step() {
  local t=$1; shift
  echo "[driver $(date +%H:%M:%S)] START ($t s cap): $*" >>"$LOG"
  timeout "$t" python "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "[driver $(date +%H:%M:%S)] END rc=$rc: $*" >>"$LOG"
  if [ "$rc" -ne 0 ]; then
    probe_backend
  fi
}

step 3600 scripts/doppler_rootcause.py stats
step 5400 scripts/doppler_rootcause.py control
step 7200 runs/run_experiments15.py qpsk_tail
step 7200 runs/run_experiments15.py bpsk_mobile_tail
step 1800 runs/run_experiments15.py dnn
step 5400 runs/run_experiments15.py bf16_control
# second pass picks up anything a timeout interrupted
step 7200 runs/run_experiments15.py qpsk_tail
step 7200 runs/run_experiments15.py bpsk_mobile_tail
echo "[driver $(date +%H:%M:%S)] PHASE15 DONE" >>"$LOG"
