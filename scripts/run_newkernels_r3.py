"""TPU measurement grid for the round-2/3 kernels without v5e rows.

VERDICT r2 items 2/3/5: `merge`, `sell`, and `scoo` exist only as CPU
f64-correctness rows; `gell16`'s windowed MXU combine (round 3) has no
measurement.  This grid gives each a head-to-head on the regimes it was
built for, so the cost model can admit the winners to AUTO_CANDIDATES
with fitted constants (the wcoo_bands lesson: never admit unmeasured).

Regimes (one parameter line each, spread-sample twins where possible):
- banded windowable hypersparse  -> gell windowed vs gell16 MXU combine
  vs sell vs merge (VERDICT item 3: the 229k-row class)
- scattered hypersparse m>=300k  -> scoo's target class (item 2; the
  reference covers it with MKL-IE at 105-328 GFLOPS, mkl_ie_f.csv:2-3)
- wide-band (>30k rows) hypersparse -> unwindowable: scoo vs wcoo_bands
- skew grid 0..1e5 (mawi-class, ref config.sh:329 skew 8e6) -> merge's
  claimed skew-proof role vs gell's COO tail (item 5)

Output: benchmark_results/tpu-v5e/newkernels_r3.csv (resume; exit 2 on
device poisoning for the retry wrapper).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spgrid.bench.harness import run_spmm, BenchConfig  # noqa: E402
from spgrid.bench.schema import CSVWriter  # noqa: E402
from spgrid.gen.artificial import artificial_matrix_generation  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "benchmark_results",
                   "tpu-v5e", "newkernels_r3.csv")
CRASHES = os.path.join(os.path.dirname(OUT), ".newkernel_crashes")
REX = os.path.join(os.path.dirname(OUT), ".newkernel_rex")

# (tag, gen kwargs, kernels)
G = dict(distribution="normal", seed=14)
JOBS = [
    # banded windowable (spread twin of the art_229375 row)
    ("band_229k", dict(m=229375, avg=5, std=1.6667, placement="random",
                       bw=0.05, skew=0, neigh=0.05, crs=0.95),
     ["gell", "gell16", "cv_gell", "sell", "merge"]),
    # banded mid-size (windowed plan, smaller gen cost) for the same A/B
    ("band_98k", dict(m=98304, avg=8, std=2.6667, placement="random",
                      bw=0.05, skew=0, neigh=0.05, crs=0.5),
     ["gell", "gell16", "cv_gell", "sell", "merge", "wcoo_bands"]),
    # scattered hypersparse — scoo's target (art_393215 twin: 9-34 GF in r2)
    ("scat_393k", dict(m=393215, avg=5, std=1.6667, placement="random",
                       bw=0.5, skew=0, neigh=0.5, crs=0.75),
     ["gell", "gell16", "scoo", "sell", "dgell"]),
    ("scat_524k", dict(m=524287, avg=5, std=1.6667, placement="random",
                       bw=0.95, skew=0, neigh=0.95, crs=0.05),
     ["gell", "gell16", "scoo", "dgell"]),
    # wide band: unwindowable at n=512 for the exact modes (band ~60k
    # rows of 200k); cv_gell's bf16 source windows it (r3 mode-aware cap)
    ("wideband_196k", dict(m=196608, avg=6, std=2, placement="diagonal",
                           bw=0.3, skew=0, neigh=0.3, crs=0.5),
     ["gell", "gell16", "cv_gell", "scoo", "wcoo_bands", "dgell"]),
    # the reference regime's upper end (mkl_ie runs m = 65k-2M;
    # spgrid's largest committed row was 524k): banded -> windowed gell,
    # scattered -> scoo's worst case (X = 2GB, source 32x the cliff)
    ("giant_band_1m", dict(m=1048576, avg=5, std=1.6667,
                           placement="diagonal", bw=0.02, skew=0,
                           neigh=0.02, crs=0.5),
     ["gell", "cv_gell"]),
    ("giant_scat_1m", dict(m=1048576, avg=5, std=1.6667,
                           placement="random", bw=0.9, skew=0,
                           neigh=0.9, crs=0.3),
     ["gell", "scoo", "dgell"]),
    # skew grid, scattered (mawi-class tail behavior)
    ("skew10_131k", dict(m=131072, avg=6, std=2, placement="random",
                         bw=0.9, skew=10, neigh=0.9, crs=0.3),
     ["gell", "merge", "scoo", "dgell"]),
    ("skew1k_131k", dict(m=131072, avg=6, std=2, placement="random",
                         bw=0.9, skew=1000, neigh=0.9, crs=0.3),
     ["gell", "merge", "scoo", "dgell"]),
    ("skew100k_131k", dict(m=131072, avg=6, std=2, placement="random",
                           bw=0.9, skew=100000, neigh=0.9, crs=0.3),
     ["gell", "merge", "scoo", "dgell"]),
]


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    writer = CSVWriter(OUT)
    done = writer.done_keys()
    crash_skip = set()
    if os.path.exists(CRASHES):
        with open(CRASHES) as fh:
            crash_skip = {tuple(l.strip().split("|")) for l in fh if "|" in l}
    if os.path.exists(REX):
        from collections import Counter
        with open(REX) as fh:
            cnt = Counter(tuple(l.strip().split("|")) for l in fh
                          if "|" in l)
        crash_skip |= {key for key, c in cnt.items() if c >= 2}
    cfg = BenchConfig(num_cols=512, min_time_s=0.25)
    for tag, p, kernels in JOBS:
        name = f"r3_{tag}"
        todo = [kk for kk in kernels if (name, kk, "512") not in done]
        if not todo:
            print(f"skip (done): {name}", flush=True)
            continue
        print(f"=== {name}: {p} -> {todo}", flush=True)
        try:
            csr = artificial_matrix_generation(
                p["m"], p["m"], p["avg"], p["std"], G["distribution"],
                seed=G["seed"], placement=p["placement"], bw=p["bw"],
                skew=p["skew"], avg_num_neighbours=p["neigh"],
                cross_row_similarity=p["crs"], name=name)
        except Exception as e:  # noqa: BLE001
            print(f"  gen FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        for kk in todo:
            if (name, kk) in crash_skip:
                print(f"  {kk}: skipped (crashed the worker on a previous "
                      f"attempt)", flush=True)
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
                # A kernel fault or failed alloc poisons the PROCESS: every
                # later device call returns UNAVAILABLE/RESOURCE_EXHAUSTED
                # (round-4 lesson: the whole skew grid + probes burned as
                # collateral of one gell16 crash).  Blame the crashing
                # (matrix, kernel) so the restart skips it, then exit 2
                # for the retry wrapper.
                if "UNAVAILABLE" in msg or "crashed" in msg:
                    with open(CRASHES, "a") as fh:
                        fh.write(f"{name}|{kk}\n")
                    sys.exit(2)
                if "RESOURCE_EXHAUSTED" in msg:
                    # count attempts: a row that OOMs twice is genuinely
                    # too big (not collateral poisoning) — quarantine it
                    # so the retry budget isn't burned on one giant row
                    with open(REX, "a") as fh:
                        fh.write(f"{name}|{kk}\n")
                    sys.exit(2)

    # Short probe passes, same TPU process (one device owner at a time):
    # the wrow ablation + DMA-gather rate inform the SpMV/scattered
    # redesigns and must not wait for the multi-hour studies.
    flag = os.path.join(os.path.dirname(OUT), ".newkernel_probes_done")
    if not os.path.exists(flag):
        probe_log = os.path.join(os.path.dirname(OUT), "probes_r3.log")

        class _Tee:
            def __init__(self, *streams):
                self.streams = streams

            def write(self, s):
                for st in self.streams:
                    st.write(s)

            def flush(self):
                for st in self.streams:
                    st.flush()

        any_ok = False
        with open(probe_log, "a") as plog:
            old = sys.stdout
            sys.stdout = _Tee(old, plog)
            try:
                for name, mod in (("wrow ablation", "exp_spmv_ablate"),
                                  ("wrow v2 A/B", "exp_wrow_v2"),
                                  ("scoo ablation", "exp_scoo_ablate"),
                                  ("dma-gather probe", "exp_pallas_gather")):
                    print(f"=== probe: {name} ===", flush=True)
                    try:
                        sys.path.insert(0, os.path.dirname(__file__))
                        __import__(mod).main([])
                        any_ok = True
                    except SystemExit:
                        any_ok = True
                    except Exception as e:  # noqa: BLE001
                        print(f"  probe FAILED: {type(e).__name__}: "
                              f"{str(e)[:200]}", flush=True)
            finally:
                sys.stdout = old
        # only mark done if the device was actually alive for the pass
        # (a poisoned process fails every probe with UNAVAILABLE)
        if any_ok:
            with open(flag, "w") as fh:
                fh.write("done\n")


if __name__ == "__main__":
    main()
