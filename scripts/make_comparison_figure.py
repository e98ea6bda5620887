"""Cross-platform comparison: spgrid-on-v5e vs the reference's baselines.

The single most persuasive artifact the project can produce (VERDICT r1,
missing item 6): spgrid's measured curves placed against the reference's
committed per-platform results.  Reference numbers come from BASELINE.md,
which cites each to a committed CSV or the paper notebooks'
`y_limit_dictionary` (results_visualization/master_plotter_synthetic.ipynb);
spgrid numbers are read from the committed benchmark_results CSVs.

Outputs benchmark_results/tpu-v5e/platform_comparison.{png,csv}.
"""
from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib  # noqa: E402
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

RES = os.path.join(os.path.dirname(__file__), "..", "benchmark_results",
                   "tpu-v5e")

# Reference numbers (BASELINE.md, each cited there to a committed artifact)
REF_SPMM = [
    ("EPYC naive CSR (24t)", 35.6),
    ("EPYC MKL CSR (24t)", 251.0),
    ("EPYC MKL GEMM bound (24t)", 626.0),
]
REF_HYPER = [
    ("EPYC MKL-IE scircuit (128t)", 105.1),
    ("EPYC MKL-IE mac_econ (128t)", 328.3),
]
REF_PIPE = [("EPYC pipeline total (64t)", 347.0)]
REF_SDDMM = [("EPYC SDDMM stage (64t)", 95.0)]
# SpMV per-device observed ceilings (paper y_limit_dictionary)
REF_SPMV_CEILINGS = [
    ("Tesla P100", 100), ("Tesla V100", 140), ("A100", 230),
    ("EPYC 64c", 175), ("EPYC 24c", 110), ("Altra Q80", 190),
    ("Xeon", 50), ("Ice Lake", 70), ("POWER9", 55), ("Alveo U280", 30),
]


def _col(path, kernel=None, col="gflops", key=None, where=None):
    out = []
    with open(os.path.join(RES, path)) as f:
        for r in csv.DictReader(f):
            if kernel and r.get("kernel") != kernel:
                continue
            if where and not where(r):
                continue
            v = r.get(col)
            if v:
                out.append((r.get(key, "") if key else "", float(v)))
    return out


# categorical slots 1/2 of the validated default palette (dataviz skill
# reference instance): color follows the ENTITY — spgrid-f32 is always
# blue, spgrid-bf16 always orange, reference systems always neutral gray
C_F32 = "#2a78d6"
C_BF16 = "#eb6834"
C_REF = "#888888"


def main():
    dlmc = max(v for _, v in _col("spmm_dlmc_twin.csv", kernel="dense"))
    pipe = max(v for _, v in _col("pipeline.csv"))
    sddmm = max(v for _, v in _col("pipeline.csv", col="gflops_sddmm"))
    spread_path = "medium_spread_r2.csv" if os.path.exists(
        os.path.join(RES, "medium_spread_r2.csv")) else "medium_spread_auto.csv"
    # the MKL-IE-comparable class: hypersparse rows only (<=16 nnz/row)
    spread = [v for _, v in _col(
        spread_path, kernel="auto",
        where=lambda r: float(r.get("avg_nnz_per_row") or 99) <= 16)]
    hyper_best = max(spread) if spread else float("nan")
    hyper_med = float(np.median(spread)) if spread else float("nan")
    spmv_best = max(v for _, v in _col("spmv.csv"))

    # r3 additions, each optional until its study CSV lands:
    # dtype=bfloat16 leg (VERDICT r2 item 6)
    bf16 = {}
    if os.path.exists(os.path.join(RES, "bf16_leg.csv")):
        for name, v in _col("bf16_leg.csv", key="matrix_name"):
            bf16[name] = max(v, bf16.get(name, 0.0))
    # validation twins: the direct MKL-IE head-to-head on feature-exact
    # twins of scircuit / mac_econ (VERDICT r2 weak #1)
    twins = {}
    if os.path.exists(os.path.join(RES, "validation_twins.csv")):
        for name, v in _col("validation_twins.csv", kernel="auto",
                            key="matrix_name"):
            twins[name] = max(v, twins.get(name, 0.0))
    # r5: the reorder-centerpiece leg measured rbh/sell/merge head-to-head
    # on the IE-class twins (reorder_rbh.csv) — the twin bars show the
    # best measured f32-exact kernel, which is what auto now dispatches
    if os.path.exists(os.path.join(RES, "reorder_rbh.csv")):
        for name, v in _col("reorder_rbh.csv", key="matrix_name"):
            if name in ("scircuit_twin", "mac_econ_fwd500_twin"):
                twins[name] = max(v, twins.get(name, 0.0))

    # (label, value, color) triples for the spgrid side
    ours_dlmc = [("spgrid v5e (dense-MXU, f32)", dlmc, C_F32)]
    if "bf16_dlmc_twin_512_0.5" in bf16:
        ours_dlmc.append(("spgrid v5e (bf16)",
                          bf16["bf16_dlmc_twin_512_0.5"], C_BF16))
    ours_hyper = [("spgrid v5e median (auto)", hyper_med, C_F32),
                  ("spgrid v5e best (auto)", hyper_best, C_F32)]
    for mat in ("scircuit", "mac_econ_fwd500"):
        if f"{mat}_twin" in twins:
            ours_hyper.append((f"spgrid {mat} twin (auto)",
                               twins[f"{mat}_twin"], C_F32))
    for tag, lbl in (("band_98k", "banded"), ("scat_131k", "scattered")):
        if f"bf16_{tag}" in bf16:
            ours_hyper.append((f"spgrid {lbl} (bf16)", bf16[f"bf16_{tag}"],
                               C_BF16))
    groups = [
        ("SpMM DLMC 512$^2$\n(n=512)", REF_SPMM, ours_dlmc),
        ("SpMM synthetic medium\n(hypersparse, n=512)", REF_HYPER,
         ours_hyper),
        ("Attention pipeline\n(n=512)", REF_PIPE,
         [("spgrid v5e", pipe, C_F32)]),
        ("SDDMM stage", REF_SDDMM, [("spgrid v5e", sddmm, C_F32)]),
    ]

    fig, axes = plt.subplots(1, 5, figsize=(20, 5.2))
    rows_out = []
    for ax, (title, ref, ours) in zip(axes, groups):
        names = [n for n, _ in ref] + [n for n, _, _ in ours]
        vals = [v for _, v in ref] + [v for _, v, _ in ours]
        colors = [C_REF] * len(ref) + [c for _, _, c in ours]
        ax.barh(range(len(vals)), vals, color=colors)
        ax.set_yticks(range(len(vals)))
        ax.set_yticklabels(names, fontsize=8)
        ax.set_xscale("log")
        ax.set_xlabel("GFLOPS (sparse-accounted)")
        ax.set_title(title, fontsize=10)
        for i, v in enumerate(vals):
            ax.text(v, i, f" {v:,.0f}", va="center", fontsize=8)
        for n, v in ref:
            rows_out.append((title.replace("\n", " "), n, v, "reference"))
        for n, v, _ in ours:
            rows_out.append((title.replace("\n", " "), n, v, "spgrid"))

    ax = axes[4]
    names = [n for n, _ in REF_SPMV_CEILINGS] + ["spgrid v5e best"]
    vals = [v for _, v in REF_SPMV_CEILINGS] + [spmv_best]
    colors = [C_REF] * len(REF_SPMV_CEILINGS) + [C_F32]
    ax.barh(range(len(vals)), vals, color=colors)
    ax.set_yticks(range(len(vals)))
    ax.set_yticklabels(names, fontsize=8)
    ax.set_xlabel("GFLOPS")
    ax.set_title("SpMV (n=1) per-device\nobserved ceilings", fontsize=10)
    for n, v in REF_SPMV_CEILINGS:
        rows_out.append(("SpMV ceilings", n, v, "reference"))
    rows_out.append(("SpMV ceilings", "spgrid v5e best", spmv_best, "spgrid"))

    fig.suptitle("spgrid (TPU v5e, 1 chip) vs reference platform baselines "
                 "— sparse-accounted GFLOPS, like for like per panel",
                 fontsize=12)
    fig.tight_layout(rect=(0, 0, 1, 0.95))
    fig.savefig(os.path.join(RES, "platform_comparison.png"), dpi=120)

    with open(os.path.join(RES, "platform_comparison.csv"), "w") as f:
        f.write("panel,system,gflops,source\n")
        for r in rows_out:
            f.write(",".join(str(x) for x in r) + "\n")
    print("wrote platform_comparison.{png,csv}; "
          f"dlmc={dlmc:.0f} hyper_med={hyper_med:.1f} pipe={pipe:.0f} "
          f"sddmm={sddmm:.0f} spmv={spmv_best:.1f}")


if __name__ == "__main__":
    main()
