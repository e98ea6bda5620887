"""Measure both windowed-f32 gell combine engines, print the winner.

Run by queue_r3.sh before the auto-dispatch studies: the MXU 6-pass
block-diagonal combine (round-3) should beat the r2 VPU mul+reduce by the
gathered-intermediate read-back ratio (~680 vs ~280 GB/s), but it is
unmeasured until the tunnel is up — and the studies must not lock an
unmeasured default into hundreds of committed rows.  Output: diagnostic
lines on stderr, the winning engine name ("vpu"|"mxu") as the ONLY line
on stdout (the queue captures it into SPGRID_GELL_F32_COMBINE).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from spgrid.core.timing import time_kernel_chained  # noqa: E402
from spgrid.gen.artificial import artificial_matrix_generation  # noqa: E402
import spgrid.ops.gell as gell_mod  # noqa: E402
from spgrid.ops.gell import DeviceGELL, gell_spmm  # noqa: E402


def main():
    m, n = 98304, 512
    csr = artificial_matrix_generation(m, m, 8, 2.6667, "normal", seed=14,
                                       placement="random", bw=0.05)
    a = DeviceGELL.from_csr(csr, mode="f32")
    if a.win_plan is None:
        print("no window plan; engines identical", file=sys.stderr)
        print("mxu")
        return
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((m, n)).astype(np.float32))
    times = {}
    for engine in ("vpu", "mxu"):
        def fn(ops, xx, e=engine):
            gell_mod.WIN_F32_COMBINE = e
            return gell_spmm(ops[0], xx)
        r = time_kernel_chained(fn, x, operands=(a,), min_time_s=0.3,
                                repeats=3)
        times[engine] = r.time_per_iter_s
        gf = 2.0 * csr.nnz * n / r.time_per_iter_s / 1e9
        print(f"{engine}: {r.time_per_iter_s*1e6:.1f}us {gf:.1f} GFLOPS",
              file=sys.stderr, flush=True)
    winner = min(times, key=times.get)
    print(f"winner: {winner} ({times['vpu']/times['mxu']:.2f}x vpu/mxu)",
          file=sys.stderr)
    print(winner)


if __name__ == "__main__":
    main()
