#!/bin/bash
# Phase-14 driver (round 3).  Serializes all chip work as SEPARATE processes
# under wall-clock timeouts: the axon backend admits one process at a time,
# and a timeout-killed step (e.g. a hung classical cell, round-2 ADVICE
# item 1) must not wedge the rest of the queue.  Every step is resumable
# (done-marker / output-CSV / .wip resume payloads), so rerunning this
# driver continues where it left off.
set -u
cd "$(dirname "$0")/.."
LOG=runs/experiments14.log

probe_backend() {
  # A timeout-killed chip process leaves the axon server lease held for
  # ~25-30 min (CLAUDE.md); the next step would hang at backend init and
  # burn its own timeout.  Poll until a trivial client can attach (round-3
  # ADVICE item 3).
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
  timeout "$t" python runs/run_experiments14.py "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "[driver $(date +%H:%M:%S)] END rc=$rc: $*" >>"$LOG"
  if [ "$rc" -ne 0 ]; then
    probe_backend
  fi
}

step 3600 control
# mobile joint arms, worst regression first (16QAM mobile floors at ~0.26)
step 5400 mobile 1
step 5400 mobile 4
step 5400 mobile 3
step 5400 mobile 2
# second pass picks up any arm a timeout interrupted (resume payloads)
step 5400 mobile 1
step 5400 mobile 4
step 5400 mobile 3
step 5400 mobile 2
for i in 0 1 2 3 4 5 6; do
  step 1500 classical_cell "$i"
done
step 5400 qam8
step 3600 qpsk30
echo "[driver $(date +%H:%M:%S)] PHASE14 DONE" >>"$LOG"
