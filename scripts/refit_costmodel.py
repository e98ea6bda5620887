"""Refit cost-model per-format corrections from all committed TPU rows.

Merges every tpu-v5e result CSV, runs costmodel.fit_constants, and prints
the fitted multiplicative corrections next to the shipped ones.  The
shipped values (V5eConstants.fudge) are updated by hand from this output
— dispatch must not silently change between commits (VERDICT r2 weak #5:
the refit loop needs a bigger sample than the ~47 rows it rested on).
"""
from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spgrid.ops.costmodel import C, fit_constants  # noqa: E402
from spgrid.viz.dataset import merge_result_csvs  # noqa: E402

RES = os.path.join(os.path.dirname(__file__), "..", "benchmark_results",
                   "tpu-v5e")


def main():
    paths = sorted(glob.glob(os.path.join(RES, "*.csv")))
    paths = [p for p in paths
             if not any(s in os.path.basename(p) for s in
                        ("comparison", "occupancy", "ape", "summary",
                         "comm_bytes", "smoke"))]
    df = merge_result_csvs(paths)
    print(f"{len(df)} rows from {len(paths)} CSVs")
    shipped = dict(C.fudge)
    fitted = fit_constants(df)
    print(f"{'format':14s} {'shipped':>8s} {'refit-ratio':>12s} "
          f"{'new-total':>10s}")
    for fmt in sorted(set(shipped) | set(fitted)):
        print(f"{fmt:14s} {shipped.get(fmt, 1.0):8.3f} "
              f"{fitted.get(fmt, float('nan')):12.3f} "
              f"{C.fudge.get(fmt, 1.0):10.3f}")
    print("\napply by editing V5eConstants.fudge (spgrid/ops/costmodel.py)")


if __name__ == "__main__":
    main()
