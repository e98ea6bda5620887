"""WROW v2 A/B: block-stationary SpMV accumulation (ROADMAP SpMV).

The v2 kernel is promoted into ops/pallas/wrow_spmv.py (variant="v2",
round 4); this probe checks correctness against a float64 host gold and
runs the v1-vs-v2 head-to-head on the TPU (invoked by the new-kernel
probe pass).  Flip wrow_spmv's default variant when v2 wins.
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from spgrid.core.timing import time_kernel_chained  # noqa: E402
from spgrid.gen.artificial import artificial_matrix_generation  # noqa: E402
from spgrid.ops.pallas.wrow_spmv import DeviceWROW, wrow_spmv  # noqa: E402


def main(argv):
    m = int(argv[0]) if argv else 100000
    avg = float(argv[1]) if len(argv) > 1 else 20.0
    bw = float(argv[2]) if len(argv) > 2 else 0.05
    interpret = jax.default_backend() != "tpu"
    csr = artificial_matrix_generation(m, m, avg, avg / 3, "normal",
                                       seed=14, placement="random", bw=bw)
    a = DeviceWROW.from_csr(csr)
    x = np.random.default_rng(0).standard_normal(m).astype(np.float32)
    xj = jnp.asarray(x)
    gold = np.zeros(m)
    np.add.at(gold, np.repeat(np.arange(m), csr.degrees),
              csr.values * x[csr.col_idx])
    y2 = np.asarray(wrow_spmv(a, xj, interpret=interpret, variant="v2"),
                    np.float64)
    err = np.abs(y2 - gold).max() / max(np.abs(gold).max(), 1e-30)
    print(f"wrow-v2 m={m} nnz={csr.nnz} util={a.utilization:.3f} "
          f"max_rel~{err:.2e}", flush=True)
    assert err < 1e-4, err
    if interpret:
        print("(interpret mode: correctness only)")
        return
    flops = 2.0 * csr.nnz
    for name in ("v1", "v2"):
        r = time_kernel_chained(
            lambda ops, xx, v=name: wrow_spmv(ops[0], xx, variant=v),
            xj, operands=(a,), min_time_s=0.3, repeats=3)
        t = r.time_per_iter_s
        print(f"wrow-{name}: {t*1e6:9.1f}us {flops/t/1e9:7.1f} GF "
              f"{t/a.num_groups*1e9:6.1f} ns/group", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
