"""bfloat16 benchmark leg (VERDICT r2 item 6).

The reference ships dual `_d`/`_f` builds of every kernel
(benchmark_code/CPU/AMD/make.sh:98-108) and reports both dtypes; spgrid's
committed TPU rows were all float32.  This leg measures dtype=bfloat16 —
where the v5e MXU's 197 TFLOPS lives — on the headline DLMC-twin matrix
plus one matrix per density regime, gated against the dequantized
(bf16-cast) host gold per the CV-kernel accuracy policy
(bench/harness.py:218-224; epsilon 3e-2 from core/config.py:91).

Output: benchmark_results/tpu-v5e/bf16_leg.csv (resume; exit 2 on device
poisoning).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spgrid.bench.harness import run_spmm, BenchConfig  # noqa: E402
from spgrid.bench.schema import CSVWriter  # noqa: E402
from spgrid.gen.artificial import artificial_matrix_generation  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "benchmark_results",
                   "tpu-v5e", "bf16_leg.csv")

JOBS = [
    # headline DLMC twin (50% dense transformer weight)
    ("dlmc_twin_512_0.5", dict(m=512, avg=256, std=32, placement="random",
                               bw=1.0, skew=0, neigh=0, crs=0),
     ["dense", "bsr_pallas", "panel_pallas"]),
    # mid-density too big to densify -> panel regime
    ("mid_16k_d2pct", dict(m=16384, avg=328, std=100, placement="random",
                           bw=1.0, skew=0, neigh=1.9, crs=0.25),
     ["panel_pallas", "bsr_pallas"]),
    # banded hypersparse -> gell windowed (bf16 X gather + MXU combine)
    ("band_98k", dict(m=98304, avg=8, std=2.6667, placement="random",
                      bw=0.05, skew=0, neigh=0.05, crs=0.5),
     ["gell", "bsr_pallas"]),
    # scattered hypersparse
    ("scat_131k", dict(m=131072, avg=6, std=2, placement="random",
                       bw=0.9, skew=0, neigh=0.9, crs=0.3),
     ["gell"]),
]


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    writer = CSVWriter(OUT)
    done = writer.done_keys()
    cfg = BenchConfig(num_cols=512, dtype="bfloat16", min_time_s=0.25)
    for tag, p, kernels in JOBS:
        name = f"bf16_{tag}"
        todo = [kk for kk in kernels if (name, kk, "512") not in done]
        if not todo:
            print(f"skip (done): {name}", flush=True)
            continue
        print(f"=== {name} -> {todo}", flush=True)
        try:
            csr = artificial_matrix_generation(
                p["m"], p["m"], p["avg"], p["std"], "normal", seed=14,
                placement=p["placement"], bw=p["bw"], skew=p["skew"],
                avg_num_neighbours=p["neigh"],
                cross_row_similarity=p["crs"], name=name)
        except Exception as e:  # noqa: BLE001
            print(f"  gen FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        for kk in todo:
            try:
                row = run_spmm(csr, kernel=kk, config=cfg)
                writer.write(row)
                print(f"  {kk}: {row.gflops:.1f} GF "
                      f"passed={row.errors_passed}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {kk} FAILED: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                if "RESOURCE_EXHAUSTED" in str(e):
                    sys.exit(2)


if __name__ == "__main__":
    main()
