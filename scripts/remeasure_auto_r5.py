"""Re-measure `auto` rows under the round-5 dispatch for every medium-study
matrix that has a fixed-kernel portfolio (dispatch accuracy must compare
the CURRENT cost model — smooth gather cliff, sell skew term, refit
fudges, ell dropped — not a blend of model eras; the r4 precedent is
medium_study_r4auto.csv).

Output: benchmark_results/tpu-v5e/medium_study_r5auto.csv (resume; exit 2
on device poisoning).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pandas as pd  # noqa: E402

from spgrid.bench.harness import run_spmm, BenchConfig  # noqa: E402
from spgrid.bench.schema import CSVWriter  # noqa: E402
from spgrid.gen.artificial import artificial_matrix_generation  # noqa: E402
from spgrid.gen.params import read_param_file  # noqa: E402

from run_medium_study import PARAMS, param_name, selected_params  # noqa: E402

RES = os.path.join(os.path.dirname(__file__), "..", "benchmark_results",
                   "tpu-v5e")
OUT = os.path.join(RES, "medium_study_r5auto.csv")


def main():
    t0 = time.time()
    max_s = float(os.environ.get("R5AUTO_MAX_S", 5400))
    study = pd.read_csv(os.path.join(RES, "medium_study.csv"))
    fixed_counts = study[study.kernel != "auto"].groupby("matrix_name") \
        .size()
    portfolio = set(fixed_counts[fixed_counts >= 2].index)
    params, _ = selected_params()
    by_name = {param_name(p): p for p in params}
    writer = CSVWriter(OUT)
    done = writer.done_keys()
    cfg = BenchConfig(num_cols=512, min_time_s=0.25)
    todo = [n for n in portfolio if n in by_name
            and (n, "auto", "512") not in done]
    print(f"{len(todo)} portfolio matrices to re-measure", flush=True)
    for i, name in enumerate(sorted(todo)):
        if time.time() - t0 > max_s:
            print("wall budget reached; stopping", flush=True)
            return
        p = by_name[name]
        print(f"[{i+1}/{len(todo)}] {name}", flush=True)
        try:
            csr = artificial_matrix_generation(
                p.nr_rows, p.nr_cols, p.avg_nnz_per_row, p.std_nnz_per_row,
                p.distribution, seed=p.seed, placement=p.placement,
                bw=p.bw, skew=p.skew,
                avg_num_neighbours=p.avg_num_neighbours,
                cross_row_similarity=p.cross_row_similarity, name=name)
            row = run_spmm(csr, kernel="auto", config=cfg)
            writer.write(row)
            print(f"  auto -> {row.fmt} {row.gflops:.1f} GF "
                  f"passed={row.errors_passed}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            if "RESOURCE_EXHAUSTED" in str(e) or "UNAVAILABLE" in str(e):
                sys.exit(2)


if __name__ == "__main__":
    main()
