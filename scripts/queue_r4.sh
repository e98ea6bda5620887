#!/bin/bash
# Round-4 master queue: takes over from queue_r3.sh (the r3 wrapper was
# stopped mid-grid; its in-flight run_newkernels_r3.py keeps the device
# and we WAIT for that exact PID before touching the TPU — two
# concurrent TPU processes poison the allocator).
#
# Reordered vs queue_r3.sh for the wall-clock reality of this round
# (~10h left, full r3 plan needs ~15h): short high-VERDICT-value stages
# first (timing-protocol A/B, SDDMM planner A/B + pipeline refresh,
# bf16 leg), then the long twins leg (wall-budgeted, bases first), the
# spread refresh, and the medium study with whatever remains.  Matrix
# generation is disk-cached (spgrid.gen cache) so stage restarts stop
# re-paying multi-minute host generation.
#
# Usage: queue_r4.sh [pid-of-inflight-newkernels]
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log(){ echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/queue_r3.log; }

if [ -n "$1" ]; then
  log "waiting for in-flight newkernels pid $1"
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

log "=== new-kernel grid (finish remainder + probes) ==="
retry 6 python scripts/run_newkernels_r3.py
log "=== timing protocol A/B ==="
timeout 2400 python scripts/exp_timing_protocol.py || true
log "=== gell f32 combine calibration ==="
ENGINE=$(python scripts/calibrate_gell_combine.py 2>>/tmp/queue_r3.log | tail -1)
case "$ENGINE" in vpu|mxu) export SPGRID_GELL_F32_COMBINE="$ENGINE";; esac
log "windowed-f32 combine engine: ${SPGRID_GELL_F32_COMBINE:-mxu(default)}"
log "=== sddmm study (planner A/B + pipeline refresh) ==="
retry 6 python scripts/run_sddmm_study.py
log "=== bf16 leg ==="
retry 6 python scripts/run_bf16_leg.py
log "=== validation twins (budgeted, bases first) ==="
export VALIDATION_TWINS_MAX_S=9000
retry 10 python scripts/run_validation_twins.py
log "validation twins done"
python scripts/analyze_twins.py || true
log "=== spread refresh r3 ==="
bash scripts/refresh_spread_r3.sh
export MEDIUM_STUDY_MAX_S=12000
log "=== medium study ==="
retry 40 python scripts/run_medium_study.py
log "=== queue_r3 done ==="
touch /tmp/queue_r3.done
