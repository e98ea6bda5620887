#!/bin/bash
# Round-5 tail queue (after the manual wpack-ablation takeover):
# calibrated twins -> medium study stint -> r5 auto re-measure ->
# medium study until the round ends.
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
log "=== calibrated twins (fidelity leg) ==="
TWINS_CALIBRATED=1 SKIP_GRID_FIRST=1 VALIDATION_TWINS_MAX_S=3600 \
  retry 6 python scripts/run_validation_twins.py
log "=== medium study stint ==="
MEDIUM_STUDY_MAX_S=9000 retry 40 python scripts/run_medium_study.py
log "=== r5 auto re-measure (dispatch accuracy) ==="
R5AUTO_MAX_S=4200 retry 12 python scripts/remeasure_auto_r5.py
log "=== medium study (until round end) ==="
MEDIUM_STUDY_MAX_S=20000 retry 40 python scripts/run_medium_study.py
log "=== queue_r5c done ==="
