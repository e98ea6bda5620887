#!/bin/bash
# Round-5 end-of-round analysis pass (CPU-only; safe to run while the TPU
# is busy).  Order: refit validation tables -> medium-study dispatch
# accuracy -> twins (incl. the calibrated-fidelity comparison) -> the
# cross-platform comparison figure -> the reorder-centerpiece summary.
cd /root/repo
set -x
python scripts/refit_costmodel.py > benchmark_results/tpu-v5e/refit_r5.log 2>&1
python scripts/analyze_medium_study.py
python scripts/analyze_twins.py
python scripts/make_comparison_figure.py
python scripts/analyze_reorder.py
