"""Master plotter CLI: figures from result CSVs.

``python -m spgrid.viz results.csv [more.csv ...] --out-dir plots/``
produces the reference notebooks' standard figure set
(results_visualization/master_plotter_*.ipynb): per-matrix GFLOPS bars,
roofline scatter, per-feature sweeps, plus the merged ML-ready dataset.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="spgrid.viz")
    ap.add_argument("csvs", nargs="+", help="result CSV file(s)")
    ap.add_argument("--out-dir", default="plots")
    ap.add_argument("--features", nargs="*", default=[
        "density", "avg_nnz_per_row", "avg_bw_scaled", "skew",
        "avg_num_neighbours", "cross_row_similarity"])
    ap.add_argument("--dataset-out", default=None,
                    help="also write the merged ML-ready dataset CSV here")
    args = ap.parse_args(argv)

    from spgrid.viz.dataset import merge_result_csvs
    from spgrid.viz.plots import (
        plot_gflops_by_matrix, plot_roofline, plot_feature_sweep,
    )

    df = merge_result_csvs(args.csvs, drop_failed=False)
    os.makedirs(args.out_dir, exist_ok=True)
    made = []

    made.append(plot_gflops_by_matrix(
        df, os.path.join(args.out_dir, "gflops_by_matrix.png")))
    if df["gbytes_per_s"].notna().any():
        made.append(plot_roofline(
            df, os.path.join(args.out_dir, "roofline.png")))
    for feat in args.features:
        if feat in df.columns and df[feat].notna().sum() > 1:
            made.append(plot_feature_sweep(
                df, feat, os.path.join(args.out_dir, f"sweep_{feat}.png")))

    if args.dataset_out:
        df.to_csv(args.dataset_out, index=False)
        made.append(args.dataset_out)

    for p in made:
        print(p)
    return 0


if __name__ == "__main__":
    sys.exit(main())
