#!/bin/bash
# Follow-on queue: waits for queue_r3.sh to finish, then runs the
# round-3 experiment passes (short, measurement-only) and the final
# analysis/figure regeneration.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log(){ echo "[$(date +%H:%M:%S)] $*"; }
while ! grep -q "queue_r3 done" /tmp/queue_r3.log 2>/dev/null; do
  sleep 120
done
log "=== gell f32 combine A/B (banded 262k) ==="
timeout 2400 python scripts/exp_gell_bench.py 2 || true
log "=== wrow SpMV ablation ==="
timeout 2400 python scripts/exp_spmv_ablate.py || true
log "=== analysis + figures ==="
python scripts/analyze_twins.py || true
python scripts/analyze_medium_study.py || true
python scripts/refit_costmodel.py || true
python scripts/make_comparison_figure.py || true
log "=== queue_r3b done ==="
