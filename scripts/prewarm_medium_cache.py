"""Pre-generate medium-study matrices into the gen disk cache.

Host generation is the medium study's bottleneck on this 1-CPU box;
run this while the TPU is busy with another stage so the study itself
is device-bound.  Mirrors run_medium_study.py's param selection exactly
(stride, seeded shuffle, resume keys) and touches no jax/device state.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spgrid.bench.schema import CSVWriter  # noqa: E402
from spgrid.gen.artificial import artificial_matrix_generation  # noqa: E402

from run_medium_study import OUT, param_name, selected_params  # noqa: E402


def main():
    t0 = time.time()
    max_s = float(os.environ.get("PREWARM_MAX_S", 7200))
    params, _ = selected_params()
    done = CSVWriter(OUT).done_keys()
    for i, p in enumerate(params):
        name = param_name(p)
        if (name, "auto", "512") in done:
            continue
        if time.time() - t0 > max_s:
            print("prewarm budget reached", flush=True)
            return
        try:
            artificial_matrix_generation(
                p.nr_rows, p.nr_cols, p.avg_nnz_per_row, p.std_nnz_per_row,
                p.distribution, seed=p.seed, placement=p.placement,
                bw=p.bw, skew=p.skew,
                avg_num_neighbours=p.avg_num_neighbours,
                cross_row_similarity=p.cross_row_similarity, name=name)
            print(f"[{i+1}/{len(params)}] cached {name}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[{i+1}] gen FAILED {name}: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
