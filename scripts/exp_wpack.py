"""Round-5 SpMV redesign measurement: wpack (multi-row packed) vs wrow.

VERDICT r4 item 2: SpMV best was 20.9 GF (wrow v1, util 0.144) — below
the 30-GFLOPS Alveo U280 line (BASELINE.md cross-platform SpMV table).
The r4 ablation bought the wpack design (ops/pallas/wpack_spmv.py):
multi-row pieces + group-local segmented reduce.  This grid runs it on
the four committed 100k benchmark configs (spmv.csv — the comparison
figure reads best-of per config) plus a scattered and a skewed config the
class map cares about, writing into the same spmv.csv.

Resume by done-keys; exit 2 on device poisoning for the retry wrapper.
"""
from __future__ import annotations

import itertools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spgrid.bench.harness import run_spmm, BenchConfig  # noqa: E402
from spgrid.bench.schema import CSVWriter  # noqa: E402
from spgrid.gen.artificial import artificial_matrix_generation  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "benchmark_results",
                   "tpu-v5e", "spmv.csv")


def main():
    writer = CSVWriter(OUT)
    done = writer.done_keys()
    cfg = BenchConfig(num_cols=1, min_time_s=0.3)
    jobs = []
    # the four committed comparison configs (run_reference_sweep.py:85-88)
    for avg, bw in itertools.product((5, 20), (0.05, 0.3)):
        jobs.append((f"synth_100k_a{avg}_b{bw:g}",
                     dict(avg=avg, bw=bw, neigh=0.05, crs=0.05)))
    # class extremes: fully scattered + skewed (mawi-class)
    jobs.append(("synth_100k_a20_b0.9",
                 dict(avg=20, bw=0.9, neigh=0.05, crs=0.05)))
    jobs.append(("synth_100k_a20_b0.9_s100",
                 dict(avg=20, bw=0.9, neigh=0.05, crs=0.05, skew=100)))
    for name, p in jobs:
        kernels = ["wpack_spmv"]
        if name not in {f"synth_100k_a{a}_b{b:g}" for a, b in
                        itertools.product((5, 20), (0.05, 0.3))}:
            kernels.append("wrow_spmv")      # head-to-head on new configs
        todo = [kk for kk in kernels if (name, kk, "1") not in done]
        if not todo:
            print(f"skip (done): {name}", flush=True)
            continue
        print(f"=== {name} -> {todo}", flush=True)
        try:
            csr = artificial_matrix_generation(
                100000, 100000, p["avg"], round(p["avg"] / 3, 4), "normal",
                14, "random", p["bw"], p.get("skew", 0), p["neigh"],
                p["crs"], name=name)
        except Exception as e:  # noqa: BLE001
            print(f"  gen FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        from spgrid.ops.pallas.wpack_spmv import DeviceWPACK
        from spgrid.ops.pallas.wrow_spmv import DeviceWROW
        wp = DeviceWPACK.from_csr(csr)
        print(f"  wpack util {wp.utilization:.3f} (wsel={wp.wsel}) vs "
              f"wrow util {DeviceWROW.from_csr(csr).utilization:.3f}",
              flush=True)
        for kk in todo:
            try:
                row = run_spmm(csr, kernel=kk, config=cfg)
                writer.write(row)
                print(f"  {kk}: {row.gflops:.2f} GF "
                      f"passed={row.errors_passed}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {kk} FAILED: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                if "UNAVAILABLE" in str(e) or "RESOURCE_EXHAUSTED" in str(e):
                    sys.exit(2)


if __name__ == "__main__":
    main()
