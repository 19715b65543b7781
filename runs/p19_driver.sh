#!/bin/bash
# Phase-19 driver (round 5): serialized chip queue.
#   1. fused-model matched-seed training control (gates the bench headline)
#   2. bench.py (new fused-kernel headline)
#   3. resweep_claims (committed-arm claim-table regeneration, zero training)
#   4. mobile per-sample filtering delta (deviation #7 bound)
#   5. big-grid nfft=512 end-to-end (train + sweep + bench + tp check)
#   6. non-LTE pilot schemes end-to-end (scattered + block arms)
#   7. fused-curriculum control + throughput (auto-enable evidence)
#   8. claim-arm completion retrains (2mod-mobile ZF, 3mod-mobile opt0)
# Every step is resumable by its own marker/artifact; a second pass picks up
# anything a timeout interrupted.
set -u
cd "$(dirname "$0")/.."
LOG=runs/experiments19.log

probe_backend() {
  local tries=0
  while ! timeout 120 python -c "import jax; print(jax.devices())" \
      >/dev/null 2>&1; do
    tries=$((tries + 1))
    echo "[driver19 $(date +%H:%M:%S)] backend busy (probe $tries); waiting 60s" >>"$LOG"
    if [ "$tries" -ge 40 ]; then
      echo "[driver19 $(date +%H:%M:%S)] backend never freed; aborting" >>"$LOG"
      exit 1
    fi
    sleep 60
  done
}

step() {
  local t=$1; shift
  echo "[driver19 $(date +%H:%M:%S)] START ($t s cap): $*" >>"$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "[driver19 $(date +%H:%M:%S)] END rc=$rc: $*" >>"$LOG"
  if [ "$rc" -ne 0 ]; then
    probe_backend
  fi
}

for pass in 1 2; do
  step 3600 python scripts/fused_model_train_control.py
  step 2700 python bench.py
  step 5400 python runs/resweep_claims.py
  step 5400 python scripts/mobile_per_sample_delta.py
  step 5400 python scripts/biggrid_e2e.py
  step 5400 python scripts/pilot_scheme_e2e.py
  step 5400 python scripts/fused_curriculum_control.py
done
step 5400 python runs/run_experiments19.py zfrebuild 101
step 5400 python runs/run_experiments19.py opt0rebuild 111
# second shots only if the first seed gate-failed (markers make the first
# invocations no-ops; a fresh seed is a fresh attempt)
step 5400 python runs/run_experiments19.py zfrebuild 102
step 5400 python runs/run_experiments19.py opt0rebuild 112
# CI adjudication of every thin-margin claim cell (uses the committed
# arms, incl. any the rebuilds above just restored)
step 7200 python scripts/claim_cell_ci_r5.py
step 7200 python scripts/claim_cell_ci_r5.py
step 1200 python3 -c "import jax; jax.config.update('jax_platforms','cpu'); import runpy; runpy.run_path('runs/make_results.py', run_name='__main__')"
echo "[driver19 $(date +%H:%M:%S)] PHASE19 DONE" >>"$LOG"
