"""Round-5 centerpiece experiment: reorder-block hybrid (rbh) on the
scattered-hypersparse class.

VERDICT r4 item 1: MKL-IE delivers 105-328 GFLOPS on this class by riding
256MB of L3 (spmm_kernel_mkl_ie.cpp:75-104, amd-64/n=512/mkl_ie_f.csv:2-3);
spgrid's measured f32-exact ceiling was ~35-45 GF (gather-intermediate
round-trip bound, ROADMAP).  The TPU lever is structure reuse: column-
cluster reordering into MXU block tiles (ops/rbh.py).  This script gives
rbh a head-to-head on every matrix of the class with committed rows:
the newkernels grid rows, the skew grid, and the scircuit/mac_econ/cop20k
validation twins — plus a banded sanity row where identity order must win.

Also records the amortization split: full kernel time (perm gather
included — the honest registered kernel) vs executor-only time on a
pre-permuted X (the iterative-solver steady state, where X lives in
permuted space across calls), into reorder_amortization.csv.

Output: benchmark_results/tpu-v5e/reorder_rbh.csv (+ amortization CSV);
resume by done-keys; exit 2 on device poisoning for the retry wrapper.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spgrid.bench.harness import run_spmm, BenchConfig  # noqa: E402
from spgrid.bench.schema import CSVWriter  # noqa: E402
from spgrid.gen.artificial import artificial_matrix_generation  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "benchmark_results",
                   "tpu-v5e", "reorder_rbh.csv")
AMORT = os.path.join(os.path.dirname(OUT), "reorder_amortization.csv")
CRASHES = os.path.join(os.path.dirname(OUT), ".reorder_crashes")
REX = os.path.join(os.path.dirname(OUT), ".reorder_rex")

G = dict(distribution="normal", seed=14)
# names match the newkernels/twins runs so the gen disk cache hits
JOBS = [
    # the class centerpiece rows (newkernels grid twins)
    ("r3_scat_393k", dict(m=393215, avg=5, std=1.6667, placement="random",
                          bw=0.5, skew=0, neigh=0.5, crs=0.75)),
    ("r3_scat_524k", dict(m=524287, avg=5, std=1.6667, placement="random",
                          bw=0.95, skew=0, neigh=0.95, crs=0.05)),
    # skew grid (mawi-class; merge's regime — can rbh beat 35.9-37.1?)
    ("r3_skew10_131k", dict(m=131072, avg=6, std=2, placement="random",
                            bw=0.9, skew=10, neigh=0.9, crs=0.3)),
    ("r3_skew1k_131k", dict(m=131072, avg=6, std=2, placement="random",
                            bw=0.9, skew=1000, neigh=0.9, crs=0.3)),
    ("r3_skew100k_131k", dict(m=131072, avg=6, std=2, placement="random",
                              bw=0.9, skew=100000, neigh=0.9, crs=0.3)),
    # banded sanity: identity order must win, rbh ~ bsr_pallas
    ("r3_band_98k", dict(m=98304, avg=8, std=2.6667, placement="random",
                         bw=0.05, skew=0, neigh=0.05, crs=0.5)),
    # validation twins of the reference's own IE-class matrices
    ("scircuit_twin", dict(m=170998, avg=5.60788, std=4.39216,
                           placement="random", bw=0.29725, skew=61.94716,
                           neigh=0.80336, crs=0.63302)),
    ("mac_econ_fwd500_twin", dict(m=206500, avg=6.16653, std=4.43586,
                                  placement="random", bw=0.00191,
                                  skew=6.13529, neigh=0.17669,
                                  crs=0.33051)),
    ("cop20k_A_twin", dict(m=121192, avg=21.65432, std=13.79266,
                           placement="random", bw=0.62306, skew=2.74059,
                           neigh=1.09583, crs=0.6334)),
    # the reference regime's upper end
    ("r3_giant_scat_1m", dict(m=1048576, avg=5, std=1.6667,
                              placement="random", bw=0.9, skew=0,
                              neigh=0.9, crs=0.3)),
]
# comparison kernels where the matrix has no committed row yet
EXTRA = {"scircuit_twin": ["sell", "merge"],
         "cop20k_A_twin": ["sell"],
         "mac_econ_fwd500_twin": ["sell"]}


def _amortization_probe(csr, writer_path: str):
    """Executor-only time on pre-permuted X vs the full registered kernel
    (the difference is the per-call perm-gather price)."""
    import jax.numpy as jnp
    from spgrid.bench.harness import make_x
    from spgrid.core.timing import time_kernel_chained
    from spgrid.ops.rbh import DeviceRBH, rbh_spmm

    a = DeviceRBH.from_csr(csr)
    print(f"  split: {a.stats}", flush=True)
    x = make_x(csr.k, 512, "float32", 14)
    xd = jnp.asarray(x)
    t_full = time_kernel_chained(rbh_spmm, xd, operands=a,
                                 min_time_s=0.3).time_per_iter_s
    if a.perm is not None:
        xp = jnp.take(xd, a.perm, axis=0).block_until_ready()
        a2 = DeviceRBH(None, a.bsr, a.res, a.res_fmt, a.shape, a.nnz,
                       a.stats, a.name)
        t_exec = time_kernel_chained(rbh_spmm, xp, operands=a2,
                                     min_time_s=0.3).time_per_iter_s
    else:
        t_exec = t_full
    gf = 2.0 * csr.nnz * 512 / 1e9
    new = not os.path.exists(writer_path)
    with open(writer_path, "a") as fh:
        if new:
            fh.write("matrix_name,method,threshold,hi_frac,hi_blocks,"
                     "hi_fill,t_full_s,t_exec_s,gflops_full,gflops_exec\n")
        fh.write(f"{csr.name},{a.stats.method},{a.stats.threshold},"
                 f"{a.stats.hi_frac:.4f},{a.stats.hi_blocks},"
                 f"{a.stats.hi_fill:.4f},{t_full:.6g},{t_exec:.6g},"
                 f"{gf / t_full:.2f},{gf / t_exec:.2f}\n")
    print(f"  amortization: full {gf / t_full:.1f} GF, executor-only "
          f"{gf / t_exec:.1f} GF (perm {1e3 * (t_full - t_exec):.2f} ms)",
          flush=True)


def main():
    t0 = time.time()
    max_s = float(os.environ.get("REORDER_MAX_S", 7200))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    writer = CSVWriter(OUT)
    done = writer.done_keys()
    crash_skip = set()
    for path, strikes in ((CRASHES, 1), (REX, 2)):
        if os.path.exists(path):
            from collections import Counter
            with open(path) as fh:
                cnt = Counter(tuple(l.strip().split("|")) for l in fh
                              if "|" in l)
            crash_skip |= {k for k, c in cnt.items() if c >= strikes}
    amort_done = set()
    if os.path.exists(AMORT):
        with open(AMORT) as fh:
            amort_done = {l.split(",")[0] for l in fh}
    cfg = BenchConfig(num_cols=512, min_time_s=0.25)
    for tag, p in JOBS:
        kernels = ["rbh"] + EXTRA.get(tag, [])
        todo = [kk for kk in kernels if (tag, kk, "512") not in done]
        probe = tag not in amort_done
        if not todo and not probe:
            print(f"skip (done): {tag}", flush=True)
            continue
        if time.time() - t0 > max_s:
            print(f"wall budget {max_s:.0f}s reached; stopping", flush=True)
            return
        print(f"=== {tag} -> {todo}", flush=True)
        try:
            csr = artificial_matrix_generation(
                p["m"], p["m"], p["avg"], p["std"], G["distribution"],
                seed=G["seed"], placement=p["placement"], bw=p["bw"],
                skew=p["skew"], avg_num_neighbours=p["neigh"],
                cross_row_similarity=p["crs"], name=tag)
        except Exception as e:  # noqa: BLE001
            print(f"  gen FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        for kk in todo:
            if (tag, kk) in crash_skip:
                print(f"  {kk}: quarantined", flush=True)
                continue
            try:
                row = run_spmm(csr, kernel=kk, config=cfg)
                writer.write(row)
                print(f"  {kk}: {row.gflops:.1f} GF "
                      f"passed={row.errors_passed}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {kk} FAILED: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                msg = str(e)
                if "UNAVAILABLE" in msg or "crashed" in msg:
                    with open(CRASHES, "a") as fh:
                        fh.write(f"{tag}|{kk}\n")
                    sys.exit(2)
                if "RESOURCE_EXHAUSTED" in msg:
                    with open(REX, "a") as fh:
                        fh.write(f"{tag}|{kk}\n")
                    sys.exit(2)
        if probe and (tag, "rbh") not in crash_skip:
            try:
                _amortization_probe(csr, AMORT)
            except Exception as e:  # noqa: BLE001
                print(f"  amort probe FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                if "UNAVAILABLE" in str(e) or "RESOURCE_EXHAUSTED" in str(e):
                    sys.exit(2)


if __name__ == "__main__":
    main()
