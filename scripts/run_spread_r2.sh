#!/bin/bash
# Round-2 spread-sample re-run: same 21-matrix stride-563 slice as round 1,
# auto now routed through the cost model (gell/dense/bsr/panel) plus the
# CV-on-X gell mode.  Resumes + restarts on device poisoning (exit 2).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=benchmark_results/tpu-v5e/medium_spread_r2.csv
for i in $(seq 1 "${MAX_RESTARTS:-20}"); do
  python -m spgrid.bench \
    --param-file matrix_generation_parameters/synthetic_matrices_medium_dataset.txt \
    --stride 563 --limit 60 --kernels auto,cv_gell --num-cols 512 \
    --out "$OUT" && exit 0
  code=$?
  [ "$code" != 2 ] && exit "$code"
  echo "restart $i after device error" >&2
done
exit 1
