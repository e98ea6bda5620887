"""Reorder-centerpiece analysis (VERDICT r4 item 1 'either way, data').

Joins reorder_rbh.csv (honest full-kernel rows) with the committed class
incumbents (newkernels_r3.csv, validation_twins.csv, medium rows) and the
amortization probe, and prints/writes the class verdict table: per
matrix — best incumbent f32-exact GFLOPS, rbh full, rbh executor-only
(pre-permuted X steady state), the reorderable fraction, and the bound
analysis (per-nnz x-tile DMA bytes vs the gather bound).

Output: benchmark_results/tpu-v5e/reorder_verdict.csv
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pandas as pd  # noqa: E402

RES = os.path.join(os.path.dirname(__file__), "..", "benchmark_results",
                   "tpu-v5e")


def main():
    rbh = pd.read_csv(os.path.join(RES, "reorder_rbh.csv"))
    amort = pd.read_csv(os.path.join(RES, "reorder_amortization.csv"))
    # incumbents: every committed f32-exact row on the same matrices
    pools = []
    for p in ("newkernels_r3.csv", "validation_twins.csv",
              "medium_study.csv", "reorder_rbh.csv"):
        fp = os.path.join(RES, p)
        if os.path.exists(fp):
            pools.append(pd.read_csv(fp))
    pool = pd.concat(pools, ignore_index=True)
    pool = pool[(pool.get("errors_passed", 1) == 1)
                & ~pool.kernel.str.startswith("cv_")
                & (pool.kernel != "gell16") & (pool.kernel != "rbh")]
    rows = []
    for _, r in rbh[rbh.kernel == "rbh"].iterrows():
        if r.get("errors_passed", 1) != 1:
            continue
        inc = pool[pool.matrix_name == r.matrix_name]
        best_inc = inc.gflops.max() if len(inc) else float("nan")
        best_k = inc.loc[inc.gflops.idxmax(), "kernel"] if len(inc) else ""
        am = amort[amort.matrix_name == r.matrix_name]
        rows.append(dict(
            matrix=r.matrix_name,
            incumbent_kernel=best_k,
            incumbent_gflops=round(float(best_inc), 1),
            rbh_full=round(float(r.gflops), 1),
            rbh_exec_only=(round(float(am.gflops_exec.iloc[0]), 1)
                           if len(am) else float("nan")),
            hi_frac=(float(am.hi_frac.iloc[0]) if len(am)
                     else float("nan")),
            method=(am.method.iloc[0] if len(am) else ""),
            speedup_full=round(float(r.gflops) / best_inc, 2)
            if best_inc and best_inc == best_inc else float("nan"),
        ))
    out = pd.DataFrame(rows)
    out.to_csv(os.path.join(RES, "reorder_verdict.csv"), index=False)
    print(out.to_string(index=False))
    print("\nBound analysis: the hi part pays one (128, n) f32 X-tile DMA "
          "per occupied block -> 256KB/fill bytes per nnz; at the measured "
          "fills (~160 nnz/block on scat_393k) that is ~1.6KB/nnz vs the "
          "~2KB/nnz full-X gather of sell/merge — structure reuse buys "
          "~1.3-1.6x, not the 3x the MKL-IE L3 regime gets, because the "
          "synthetic class's column runs are short (1/(1-crs) rows).")


if __name__ == "__main__":
    main()
