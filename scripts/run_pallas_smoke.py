"""On-TPU Pallas accuracy smoke (VERDICT r1 item 8).

Every Pallas kernel runs its real Mosaic path (interpret=False) on one
small matrix and is gated against the f64 host oracle — closing the gap
that CPU tests only exercise interpret mode, which is not the Mosaic
compiler.  Small shapes: one matrix per kernel, ~seconds each.

Output: benchmark_results/tpu-v5e/pallas_smoke.csv
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from spgrid.bench.harness import run_spmm, run_sddmm, BenchConfig  # noqa: E402
from spgrid.bench.schema import CSVWriter  # noqa: E402
from spgrid.gen.artificial import artificial_matrix_generation  # noqa: E402
from spgrid.core.metrics import error_metrics  # noqa: E402
from spgrid.bench.schema import BenchRow  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "benchmark_results",
                   "tpu-v5e", "pallas_smoke.csv")

# Pallas SpMM kernels through the standard harness (fmt -> matrix recipe)
SPMM_KERNELS = {
    "bsr_pallas": dict(avg=50, std=10, bw=0.05),
    "bsrc_pallas": dict(avg=50, std=10, bw=0.05),
    "panel_pallas": dict(avg=300, std=30, bw=1.0),
    # cv_panel at its home density (50%): sparser configs build very tall
    # panel stacks whose bf16 relayout Mosaic rejects at this shape
    "cv_panel": dict(m=2048, avg=1024, std=64, bw=1.0),
    "wcoo_pallas": dict(avg=5, std=2, bw=0.9),
    "wcoo_bands": dict(avg=5, std=2, bw=0.05),
}
SPMV_KERNELS = {
    "wcoo_spmv": dict(avg=20, std=5, bw=0.05),
    "wrow_spmv": dict(avg=20, std=5, bw=0.9),
}


def main():
    assert jax.devices()[0].platform == "tpu", "smoke must run on the TPU"
    writer = CSVWriter(OUT)
    done = writer.done_keys()
    for kernel, rec in {**SPMM_KERNELS, **SPMV_KERNELS}.items():
        n = 1 if kernel in SPMV_KERNELS else 512
        m = rec.get("m", 8192)
        csr = artificial_matrix_generation(
            m, m, rec["avg"], rec["std"], "normal", seed=14,
            placement="random", bw=rec["bw"],
            name=f"smoke_{kernel}")
        if (csr.name, kernel, str(n)) in done:
            print("skip", kernel, flush=True)
            continue
        cfg = BenchConfig(num_cols=n, min_time_s=0.15)
        try:
            row = run_spmm(csr, kernel=kernel, config=cfg)
            writer.write(row)
            print(f"{kernel}: passed={row.errors_passed} "
                  f"mape={row.mape:.2e} {row.gflops:.1f} GF", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{kernel} FAILED: {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
            if "RESOURCE_EXHAUSTED" in str(e):
                sys.exit(2)

    # bsr_sddmm via the standalone SDDMM harness (Mosaic path)
    if ("mask_2048", "sddmm_pallas", "512") not in done:
        try:
            cfg = BenchConfig(num_cols=512, sparsity=0.9, min_time_s=0.15)
            row = run_sddmm(2048, config=cfg, use_pallas=True)
            row.matrix_name = "mask_2048"
            writer.write(row)
            print(f"bsr_sddmm: passed={row.errors_passed} "
                  f"mape={row.mape:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bsr_sddmm FAILED: {type(e).__name__}: {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
