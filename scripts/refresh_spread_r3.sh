#!/bin/bash
# Round-3 spread refresh: re-measure the suboptimal spread-sample rows
# under the current dispatch + kernels (gell windowed MXU combine, scoo,
# fill-aware wcoo_bands model).  Writes to a FRESH r3 refresh CSV (the r2
# refresh file already holds rows for these keys, and the CLI resumes by
# key), then replaces the spread rows wherever the new measurement wins.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=benchmark_results/tpu-v5e/medium_spread_r3_refresh.csv
for line in \
  "229375 229375 5 1.6667 normal random 0.05 0 0.05 0.95 14" \
  "311295 311295 5 1.6667 normal random 0.05 0 0.05 0.5 14" \
  "393215 393215 5 1.6667 normal random 0.05 0 0.5 0.75 14" \
  "118387 118387 10 3.3333 normal random 0.3 1000 0.05 0.5 14" \
  "202950 202950 10 3.3333 normal random 0.3 1000 1.9 0.25 14" \
  "524287 524287 5 1.6667 normal random 0.05 0 0.95 0.05 14"; do
  python -m spgrid.bench --generate "$line" --kernels auto --num-cols 512 \
    --out "$OUT" || true
done
python scripts/merge_refresh.py "$OUT"
