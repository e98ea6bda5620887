#!/bin/bash
# Round-3 master queue: wait for the TPU tunnel to come back, then run
# every queued study strictly serially (two concurrent TPU processes
# poison the device allocator — CLAUDE.md gotcha).  Every study resumes
# from its CSV and exits 2 on device poisoning; the retry loops restart.
#
# Order: short high-information first (new-kernel grid), then the
# VERDICT-priority studies (validation twins -> spread refresh -> SDDMM
# -> bf16 leg), then the long stratified medium study (wall-budgeted,
# resumable across queue restarts).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
# tee to the canonical log so queue_r3b.sh's waiter sees progress without
# depending on how the operator redirected stdout (advisor r3)
log(){ echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/queue_r3.log; }

log "waiting for TPU..."
while true; do
  timeout 180 python -c "
import jax
assert any(d.platform not in ('cpu',) for d in jax.devices()), 'cpu only'
print('tpu ok:', jax.devices())
" 2>/dev/null && break
  log "tpu not up yet"
  sleep 120
done
log "TPU UP"

retry(){ local n=$1; shift
  for i in $(seq 1 "$n"); do
    "$@"; rc=$?
    [ $rc -eq 0 ] && return 0
    [ $rc -ne 2 ] && { log "non-poison failure rc=$rc: $*"; return $rc; }
    log "restart $i/$n after device poisoning: $*"
  done
}

log "=== new-kernel grid ===";     retry 6 python scripts/run_newkernels_r3.py
log "=== gell f32 combine calibration ==="
ENGINE=$(python scripts/calibrate_gell_combine.py 2>>/tmp/queue_r3.log | tail -1)
case "$ENGINE" in vpu|mxu) export SPGRID_GELL_F32_COMBINE="$ENGINE";; esac
log "windowed-f32 combine engine: ${SPGRID_GELL_F32_COMBINE:-mxu(default)}"
log "=== validation twins ===";    retry 10 python scripts/run_validation_twins.py
log "validation twins done"
python scripts/analyze_twins.py || true
log "=== spread refresh r3 ===";   bash scripts/refresh_spread_r3.sh
log "=== sddmm study ===";         retry 6 python scripts/run_sddmm_study.py
log "=== bf16 leg ===";            retry 6 python scripts/run_bf16_leg.py
export MEDIUM_STUDY_MAX_S=14000
log "=== medium study ===";        retry 40 python scripts/run_medium_study.py
log "=== queue_r3 done ==="
touch /tmp/queue_r3.done
