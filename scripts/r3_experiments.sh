#!/bin/bash
# Round-3 post-study experiment + analysis pass.  Invoked by queue_r3b.sh
# as a child process, so this file stays editable right up until the
# studies finish.  Strictly serial; every step is best-effort.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log(){ echo "[$(date +%H:%M:%S)] $*"; }

log "=== new-kernel grid remainder (re-run: round-4 worker crash burned the skew grid + probes) ==="
for i in 1 2 3 4 5 6; do
  python scripts/run_newkernels_r3.py; rc=$?
  [ $rc -eq 0 ] && break
  [ $rc -ne 2 ] && break
  log "restart $i/6 after device poisoning: newkernels"
done
log "=== gell f32 combine A/B (banded 262k) ==="
timeout 2400 python scripts/exp_gell_bench.py 2 || true
log "=== timing protocol A/B (VERDICT r3 weak 8) ==="
# queue_r4.sh already runs this right after the grid; don't pay twice
if [ ! -e benchmark_results/tpu-v5e/timing_protocol_ab.csv ]; then
  timeout 2400 python scripts/exp_timing_protocol.py || true
fi
# the four probes below already ran inside run_newkernels_r3.py's probe
# pass (tee'd to probes_r3.log); only re-run here if that pass never
# completed, so the TPU hours aren't spent twice
if [ ! -e benchmark_results/tpu-v5e/.newkernel_probes_done ]; then
  log "=== wrow SpMV ablation ==="
  timeout 2400 python scripts/exp_spmv_ablate.py || true
  log "=== wrow v2 block-stationary A/B (VERDICT r3 item 7) ==="
  timeout 2400 python scripts/exp_wrow_v2.py || true
  log "=== scoo gather/scatter ablation ==="
  timeout 2400 python scripts/exp_scoo_ablate.py || true
  log "=== Pallas DMA-gather rate (scattered fallback decision) ==="
  timeout 2400 python scripts/exp_pallas_gather.py || true
fi
log "=== n-scalability refresh (current kernels) ==="
timeout 3600 python -m spgrid.bench \
  --generate "512 512 256 32 normal random 1.0 0 0 0 14" \
  --kernels dense,bsr_pallas,panel_pallas --num-cols 128,256,512,1024 \
  --out benchmark_results/tpu-v5e/spmm_n_scalability_r3.csv || true
timeout 3600 python -m spgrid.bench \
  --generate "98304 98304 8 2.6667 normal random 0.05 0 0.05 0.5 14" \
  --kernels auto,gell,cv_gell --num-cols 128,256,512,1024 \
  --out benchmark_results/tpu-v5e/spmm_n_scalability_r3.csv || true
log "=== analysis + figures ==="
python scripts/analyze_twins.py || true
python scripts/analyze_sddmm_ab.py || true
python scripts/analyze_medium_study.py || true
python scripts/refit_costmodel.py || true
python scripts/make_comparison_figure.py || true
log "=== r3_experiments done ==="
