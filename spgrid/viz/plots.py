"""Results analysis & plotting.

Rebuilds the reference's analysis layer (``results_visualization/
master_plotter_*.ipynb`` + ``lib/plot`` spy plots) on pandas/matplotlib:
per-matrix GFLOPS bars, feature-sweep lines, scaling curves, roofline
scatter, and matrix structure (spy) plots.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import numpy as np


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def load_results(csv_path: str):
    import pandas as pd
    return pd.read_csv(csv_path)


def plot_gflops_by_matrix(df, out_path: str, kernels: Optional[Sequence[str]] = None):
    """Grouped bars: GFLOPS per matrix per kernel (master_plotter style)."""
    plt = _mpl()
    if kernels is None:
        kernels = sorted(df["kernel"].unique())
    mats = list(df["matrix_name"].unique())
    fig, ax = plt.subplots(figsize=(max(6, len(mats) * 0.8), 4))
    width = 0.8 / max(len(kernels), 1)
    for i, kern in enumerate(kernels):
        sub = df[df["kernel"] == kern].set_index("matrix_name")
        vals = [sub["gflops"].get(mx, float("nan")) for mx in mats]
        ax.bar(np.arange(len(mats)) + i * width, vals, width, label=kern)
    ax.set_xticks(np.arange(len(mats)) + 0.4)
    ax.set_xticklabels(mats, rotation=45, ha="right", fontsize=7)
    ax.set_ylabel("GFLOPS")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_feature_sweep(df, feature: str, out_path: str, y: str = "gflops"):
    """Performance vs one structural feature, per kernel (the synthetic-
    dataset methodology plots)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(6, 4))
    for kern in sorted(df["kernel"].unique()):
        sub = df[df["kernel"] == kern].sort_values(feature)
        ax.plot(sub[feature], sub[y], marker="o", ms=3, label=kern)
    ax.set_xlabel(feature)
    ax.set_ylabel(y)
    if df[feature].max() > 0 and df[feature].max() / max(df[feature][df[feature] > 0].min(), 1e-12) > 100:
        ax.set_xscale("log")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_roofline(df, out_path: str, hbm_gbps: float = 819.0,
                  peak_tflops: float = 98.5):
    """Roofline scatter: arithmetic intensity vs achieved GFLOPS."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(6, 4))
    ai = np.logspace(-2, 3, 100)
    ax.plot(ai, np.minimum(ai * hbm_gbps, peak_tflops * 1e3), "k-",
            lw=1, label="roofline")
    for kern in sorted(df["kernel"].unique()):
        sub = df[df["kernel"] == kern]
        with np.errstate(divide="ignore", invalid="ignore"):
            x = (sub["gflops"] / sub["gbytes_per_s"]).to_numpy()
        ax.scatter(x, sub["gflops"], s=12, label=kern)
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("arithmetic intensity (flops/byte)")
    ax.set_ylabel("GFLOPS")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_scaling(points, out_path: str):
    """Scaling curves from dist.scaling.ScalingPoint list."""
    plt = _mpl()
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 4))
    d = [p.num_devices for p in points]
    ax1.plot(d, [p.nnz_per_s / 1e9 for p in points], "o-")
    ax1.set_xlabel("devices")
    ax1.set_ylabel("Gnnz/s")
    ax2.plot(d, [p.efficiency for p in points], "o-")
    ax2.axhline(0.8, color="r", ls="--", lw=1, label="80% target")
    ax2.set_xlabel("devices")
    ax2.set_ylabel("scaling efficiency")
    ax2.set_ylim(0, 1.2)
    ax2.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def spy(csr, out_path: str, max_dim: int = 1024):
    """Matrix structure plot (ref csr_plot, csr_util_gen.c:2040 — PPM spy
    images); bins the matrix onto a max_dim^2 grid."""
    plt = _mpl()
    m, k = csr.shape
    bm = max(1, -(-m // max_dim))
    bk = max(1, -(-k // max_dim))
    gm, gk = -(-m // bm), -(-k // bk)
    grid = np.zeros((gm, gk), dtype=np.float32)
    rows = np.repeat(np.arange(m), np.diff(csr.row_ptr))
    np.add.at(grid, (rows // bm, csr.col_idx // bk), 1.0)
    fig, ax = plt.subplots(figsize=(5, 5))
    with np.errstate(divide="ignore"):
        ax.imshow(np.log1p(grid), cmap="viridis", interpolation="nearest",
                  aspect="auto")
    ax.set_title(f"{csr.name} ({m}x{k}, nnz={csr.nnz})", fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
