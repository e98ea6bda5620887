#!/bin/bash
# Round-5 master queue.  Stage order = VERDICT r4 priority:
#   1. exp_reorder   — the centerpiece (rbh vs the 105-GFLOPS MKL-IE bar)
#   2. exp_wpack     — SpMV multi-row packing past the 30-GFLOPS line
#   3. run_bf16_leg  — widened dtype axis (>=30 rows, >=10 matrices)
#   4. exp_gell16_min— sacrificial: minimize/guard the wideband gell16
#                      crash in its own process (quarantine absorbs it)
#   5. medium study  — everything that remains (resume + quarantine)
# Matrix generation is disk-cached; a cache prewarmer overlaps stage 1-3
# TPU time.  One device owner at a time: pass the PID of any in-flight
# TPU process and we wait for it (pattern kills are forbidden).
#
# Usage: queue_r5.sh [pid-of-inflight-tpu-process]
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log(){ echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/queue_r5.log; }

if [ -n "$1" ]; then
  log "waiting for in-flight TPU pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

retry(){ local n=$1; shift
  for i in $(seq 1 "$n"); do
    "$@"; rc=$?
    [ $rc -eq 0 ] && return 0
    [ $rc -ne 2 ] && { log "non-poison failure rc=$rc: $*"; return $rc; }
    log "restart $i/$n after device poisoning: $*"
  done
}

PREWARM_MAX_S=10000 nohup python scripts/prewarm_medium_cache.py \
  > /tmp/prewarm_r5.log 2>&1 &
log "prewarmer pid $!"

log "=== reorder-block hybrid experiment (centerpiece) ==="
export REORDER_MAX_S=6000
retry 8 python scripts/exp_reorder.py
log "=== wpack SpMV grid ==="
retry 6 python scripts/exp_wpack.py
log "=== bf16 wide leg ==="
retry 6 python scripts/run_bf16_leg.py
log "=== gell16 wideband minimize (sacrificial) ==="
timeout 1800 python scripts/exp_gell16_min.py || \
  log "gell16 probe exited rc=$? (expected if the worker crashed)"
log "=== calibrated twins (fidelity fix leg; bases first) ==="
export TWINS_CALIBRATED=1 SKIP_GRID_FIRST=1 VALIDATION_TWINS_MAX_S=3600
retry 6 python scripts/run_validation_twins.py
unset TWINS_CALIBRATED VALIDATION_TWINS_MAX_S
log "=== medium study (rest of the round) ==="
export MEDIUM_STUDY_MAX_S=${MEDIUM_STUDY_MAX_S:-14000}
retry 60 python scripts/run_medium_study.py
log "=== queue_r5 done ==="
touch /tmp/queue_r5.done
