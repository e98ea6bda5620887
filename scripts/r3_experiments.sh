#!/bin/bash
# Round-3 post-study experiment + analysis pass.  Invoked by queue_r3b.sh
# as a child process, so this file stays editable right up until the
# studies finish.  Strictly serial; every step is best-effort.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log(){ echo "[$(date +%H:%M:%S)] $*"; }

log "=== gell f32 combine A/B (banded 262k) ==="
timeout 2400 python scripts/exp_gell_bench.py 2 || true
log "=== wrow SpMV ablation ==="
timeout 2400 python scripts/exp_spmv_ablate.py || true
log "=== Pallas DMA-gather rate (scattered fallback decision) ==="
timeout 2400 python scripts/exp_pallas_gather.py || true
log "=== analysis + figures ==="
python scripts/analyze_twins.py || true
python scripts/analyze_medium_study.py || true
python scripts/refit_costmodel.py || true
python scripts/make_comparison_figure.py || true
log "=== r3_experiments done ==="
