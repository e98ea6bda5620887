"""Merge benchmark result CSVs into one ML-ready dataset.

Reference counterpart: ``results_visualization/clean_dataset_for_mtzortzi
.ipynb`` — merges the per-platform result CSVs into a single 28-column
dataset (features + measured performance per kernel/matrix/config) used to
train performance predictors.  Here the per-run rows already carry the
feature vector (BenchRow), so merging is: concat, tag provenance, derive
the modeling columns, drop failed-oracle rows.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence


def merge_result_csvs(paths: Sequence[str], *, drop_failed: bool = True,
                      add_derived: bool = True):
    """Load + concat result CSVs -> pandas.DataFrame.

    Adds ``source`` (file stem, the platform/sweep tag) and, with
    ``add_derived``, the modeling columns the notebook derives:
    ``log_nnz``, ``log_m``, ``arithmetic_intensity`` (flops/byte),
    ``gflops_per_device``."""
    import pandas as pd

    frames = []
    for p in paths:
        df = pd.read_csv(p)
        df["source"] = os.path.splitext(os.path.basename(p))[0]
        frames.append(df)
    if not frames:
        raise ValueError("no input CSVs")
    out = pd.concat(frames, ignore_index=True)
    if drop_failed and "errors_passed" in out:
        out = out[out["errors_passed"] != 0].reset_index(drop=True)
    if add_derived:
        import numpy as np

        if "csr_nnz" in out:
            out["log_nnz"] = np.log10(out["csr_nnz"].clip(lower=1))
        if "csr_m" in out:
            out["log_m"] = np.log10(out["csr_m"].clip(lower=1))
        if {"csr_nnz", "input_columns", "csr_mem_footprint_mb"} <= set(out):
            flops = 2.0 * out["csr_nnz"] * out["input_columns"]
            bytes_ = out["csr_mem_footprint_mb"] * 2 ** 20
            out["arithmetic_intensity"] = flops / bytes_.clip(lower=1)
        if {"gflops", "num_devices"} <= set(out):
            out["gflops_per_device"] = out["gflops"] / out[
                "num_devices"].clip(lower=1)
    return out


def to_ml_dataset(df, target: str = "gflops",
                  features: Optional[Sequence[str]] = None):
    """Split a merged frame into (X, y) numpy arrays over the feature
    columns (the notebook's final step before model training)."""
    default = [
        "csr_m", "csr_k", "csr_nnz", "input_columns", "density",
        "avg_nnz_per_row", "std_nnz_per_row", "avg_bw_scaled",
        "std_bw_scaled", "avg_sc_scaled", "skew", "avg_num_neighbours",
        "cross_row_similarity", "log_nnz", "log_m", "arithmetic_intensity",
    ]
    cols = [c for c in (features or default)
            if c in df.columns and df[c].notna().any()]
    sub = df.dropna(subset=cols + [target])
    return sub[cols].to_numpy(dtype=float), sub[target].to_numpy(dtype=float)


def twin_ape(df, *, twin_suffix: str = "_twin", key: str = "matrix_name",
             metric: str = "gflops"):
    """Validation-vs-artificial-twin APE comparison.

    Reference counterpart: ``results_visualization/validation_plotter-
    SPLITTING.ipynb`` (outputs like 10_validation_vs_best_friend_APE.csv) —
    the statistical validation of the synthetic-matrix methodology: for each
    real validation matrix and its feature-matched artificial twin, the
    absolute percentage error of the measured metric, per kernel.

    Rows whose ``key`` ends in ``twin_suffix`` are twins of the row with the
    suffix stripped.  Returns a DataFrame with columns
    (matrix, kernel, real, twin, ape) plus a ``mape`` attribute."""
    import pandas as pd

    twins = df[df[key].str.endswith(twin_suffix)].copy()
    twins["base"] = twins[key].str[: -len(twin_suffix)]
    reals = df[~df[key].str.endswith(twin_suffix)]
    # distinguish runs at different configs: a sweep may carry several rows
    # per (matrix, kernel) — e.g. input_columns or dtype variants — and a
    # 2-key merge would cross-join real@config-A with twin@config-B
    extra = [c for c in ("input_columns", "dtype", "num_devices")
             if c in df.columns and df[c].nunique() > 1]
    merged = reals.merge(twins, left_on=[key, "kernel", *extra],
                         right_on=["base", "kernel", *extra],
                         suffixes=("_real", "_twin"))
    out = pd.DataFrame({
        "matrix": merged[key + "_real"],
        "kernel": merged["kernel"],
        "real": merged[metric + "_real"],
        "twin": merged[metric + "_twin"],
    })
    out["ape"] = (out["twin"] - out["real"]).abs() / out["real"].abs() * 100
    out.attrs["mape"] = float(out["ape"].mean()) if len(out) else float("nan")
    return out


def dispatch_accuracy(df, *, tol: float = 0.10, key: str = "matrix_name",
                      auto_kernel: str = "auto", include_lossy: bool = True):
    """%% of matrices where `auto` lands within `tol` of the best fixed
    kernel (the dispatch-quality number VERDICT r1 asked for; analysis of
    run_medium_study.py portfolio rows).

    `include_lossy=False` drops cv_* kernels from the fixed portfolio:
    auto dispatches the f32-exact candidate set by design (CV modes are
    an explicit tolerance opt-in, ops/costmodel.py::AUTO_CANDIDATES), so
    the headline accuracy compares it against kernels it is allowed to
    pick; the lossy-inclusive number is reported separately as the
    tolerance-enabled headroom."""
    import pandas as pd  # noqa: F401

    out = []
    for name, g in df.groupby(key):
        auto = g[g["kernel"] == auto_kernel]
        fixed = g[g["kernel"] != auto_kernel]
        if not include_lossy:
            fixed = fixed[~fixed["kernel"].str.startswith("cv_")]
        if "errors_passed" in g.columns:
            fixed = fixed[fixed["errors_passed"] == 1]
        fixed = fixed.dropna(subset=["gflops"])
        if auto.empty or fixed.empty:
            continue
        best = float(fixed["gflops"].max())
        a = float(auto["gflops"].iloc[0])
        if best > 0:
            out.append((name, a, best, a >= (1 - tol) * best))
    if not out:
        return float("nan"), out
    return sum(1 for *_, ok in out if ok) / len(out), out
