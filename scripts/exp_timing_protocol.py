"""Timing-protocol continuity A/B (VERDICT r3 weak #8).

Round 3 replaced the per-loop-length jits (one compile per trip count)
with a single dynamic-trip-count jit (core/timing.py::_chained_many).
Every cost-model fudge constant and all cross-round comparisons rest on
round-2 numbers measured under the OLD protocol; this script measures the
same kernels under both protocols on the headline matrix plus one gell
row and commits the delta, so a protocol-induced shift can't silently
masquerade as a kernel regression/improvement.

Old protocol (reconstructed here): identical differenced chained loop,
but the fori_loop trip count is a static jit argument — a fresh compile
per loop length, exactly the round-2 behavior.

Output: benchmark_results/tpu-v5e/timing_protocol_ab.csv
"""
from __future__ import annotations

import csv
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from spgrid.core.timing import _feedback, _sync_fetch  # noqa: E402
from spgrid.gen.artificial import artificial_matrix_generation  # noqa: E402
from spgrid.ops import dispatch  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "benchmark_results",
                   "tpu-v5e", "timing_protocol_ab.csv")


def time_static_protocol(kernel, x, operands, min_time_s=0.5, repeats=3):
    """Round-2 protocol: static trip count, one compile per length."""
    @functools.partial(jax.jit, static_argnames=("iters",))
    def many(x0, operands, iters):
        def body(i, xc):
            return _feedback(kernel(operands, xc), x0)
        return jax.lax.fori_loop(0, iters, body, x0)

    i1 = 4
    _sync_fetch(many(x, operands, iters=i1))
    t0 = time.perf_counter()
    _sync_fetch(many(x, operands, iters=i1))
    t1 = time.perf_counter() - t0
    per_est = max(t1 / i1 / 4, 1e-8)
    i2 = 0
    t2 = 0.0
    for _ in range(8):
        i2_new = i1 + max(i1, min(int(min_time_s / per_est) + 1, 1 << 20))
        if i2_new <= i2:
            break
        i2 = i2_new
        _sync_fetch(many(x, operands, iters=i2))       # compile + warm
        t0 = time.perf_counter()
        _sync_fetch(many(x, operands, iters=i2))
        t2 = time.perf_counter() - t0
        if t2 >= min_time_s * 0.9 or i2 >= 1 << 20:
            break
        per_est = max((t2 - t1) / (i2 - i1), t2 / i2 / 4, 1e-9)
    pers = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync_fetch(many(x, operands, iters=i1))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync_fetch(many(x, operands, iters=i2))
        tb = time.perf_counter() - t0
        per = (tb - ta) / (i2 - i1)
        if per > 0:
            pers.append(per)
    pers.sort()
    return pers[len(pers) // 2] if pers else t2 / max(i2, 1)


def main(argv=None):
    from spgrid.core.timing import time_kernel_chained

    jobs = [
        ("dlmc_twin_512", dict(m=512, avg=256, std=32, placement="random",
                               bw=1.0), ("dense", "bsr_pallas")),
        ("band_98k", dict(m=98304, avg=8, std=2.6667, placement="random",
                          bw=0.05, skew=0, avg_num_neighbours=0.05,
                          cross_row_similarity=0.5), ("gell",)),
    ]
    rows = []
    with jax.default_matmul_precision("highest"):
        for name, p, kernels in jobs:
            csr = artificial_matrix_generation(
                p["m"], p["m"], p["avg"], p["std"], "normal", seed=14,
                placement=p["placement"], bw=p["bw"],
                skew=p.get("skew", 0),
                avg_num_neighbours=p.get("avg_num_neighbours", 0.0),
                cross_row_similarity=p.get("cross_row_similarity", 0.0),
                name=name)
            dev = dispatch.build(csr, kernels[0]) if False else None
            x = jnp.asarray(np.random.default_rng(0)
                            .random((csr.k, 512), np.float64)
                            .astype(np.float32))
            flops = 2.0 * csr.nnz * 512
            for kk in kernels:
                a = dispatch.build(csr, kk)
                fn = dispatch.spmm_fn(kk)
                kernel = lambda ops, xc: fn(ops[0], xc)     # noqa: E731
                new = time_kernel_chained(kernel, x, operands=(a,),
                                          min_time_s=0.5).time_per_iter_s
                old = time_static_protocol(kernel, x, (a,), min_time_s=0.5)
                delta = new / old - 1.0
                rows.append(dict(matrix=name, kernel=kk,
                                 t_dynamic_s=f"{new:.3e}",
                                 t_static_s=f"{old:.3e}",
                                 gflops_dynamic=f"{flops/new/1e9:.1f}",
                                 gflops_static=f"{flops/old/1e9:.1f}",
                                 rel_delta=f"{delta:+.4f}"))
                print(f"{name}/{kk}: dynamic {flops/new/1e9:.1f} GF, "
                      f"static {flops/old/1e9:.1f} GF, delta {delta:+.2%}",
                      flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"-> {OUT}", flush=True)


if __name__ == "__main__":
    main()
