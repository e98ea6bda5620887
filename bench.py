"""Driver benchmark: one JSON line on the headline metric.

Headline: SpMM f32, n=512, on the DLMC-twin matrix (512x512 pruned
transformer weight, ~50% sparse) — the reference's best number for this
configuration is MKL CSR SpMM at 251.0 GFLOPS on a 24-thread AMD EPYC
(BASELINE.md, benchmark_results/amd-epyc7/spmm-scalability-n=512/
mkl_csr_f_24.csv:2).  vs_baseline = our GFLOPS / 251.0.

Runs the framework's best kernel for this density (dispatch picks the
densified-MXU path; the Pallas BSR kernel is also measured and the faster
one reported).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    import numpy as np
    from spgrid.core.config import BenchConfig
    from spgrid.bench.harness import run_spmm
    from spgrid.gen import artificial_matrix_generation

    csr = artificial_matrix_generation(
        512, 512, 256, 32, "normal", seed=14, placement="random", bw=1.0,
        name="dlmc_twin_512_0.5")
    cfg = BenchConfig(num_cols=512, dtype="float32", min_time_s=1.0,
                      warmup_iters=5)

    best = None
    for kernel in ("dense", "panel_pallas", "bsr_pallas"):
        try:
            row = run_spmm(csr, kernel=kernel, config=cfg)
        except Exception as e:
            print(f"kernel {kernel} failed: {e}", file=sys.stderr)
            continue
        if row.errors_passed and (best is None or row.gflops > best.gflops):
            best = row

    if best is None:
        print(json.dumps({"metric": "spmm_dlmc_n512_f32_gflops", "value": 0.0,
                          "unit": "GFLOPS", "vs_baseline": 0.0}))
        return 1

    print(json.dumps({
        "metric": "spmm_dlmc_n512_f32_gflops",
        "value": round(best.gflops, 2),
        "unit": "GFLOPS",
        "vs_baseline": round(best.gflops / 251.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
