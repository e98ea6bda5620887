"""wpack per-group cost ablation (r5: measured 460 ns/group vs wrow v1's
14.1 — 7.5x slower despite 4.3x utilization; exp_wpack grid).

Times, on the a20_b0.05 100k benchmark config (the class's anchor):
  1. wrow v1 (baseline ns/group)
  2. wpack noseg       — gather+fma only (the v1-equivalent part)
  3. wpack nogather    — + lane-prefix (isolates the 7 shift-adds)
  4. wpack full/pad    — + the 2 boundary takes, pad prefix
  5. wpack full/roll   — same with pltpu.roll prefix
The deltas name the culprit op; findings land in wpack_ablate.log.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOG = os.path.join(os.path.dirname(__file__), "..", "benchmark_results",
                   "tpu-v5e", "wpack_ablate.log")


def mark(msg):
    print(msg, flush=True)
    with open(LOG, "a") as fh:
        fh.write(msg + "\n")


def main(argv=None):
    import numpy as np
    import jax.numpy as jnp
    from spgrid.core.timing import time_kernel_chained
    from spgrid.gen.artificial import artificial_matrix_generation
    from spgrid.ops.pallas.wpack_spmv import DeviceWPACK, wpack_spmv
    from spgrid.ops.pallas.wrow_spmv import DeviceWROW, wrow_spmv

    csr = artificial_matrix_generation(
        100000, 100000, 20, round(20 / 3, 4), "normal", 14, "random",
        0.05, 0, 0.05, 0.05, name="synth_100k_a20_b0.05")
    x = (np.random.default_rng(0).random(csr.k) + 0.5).astype(np.float32)
    xd = jnp.asarray(x)

    wr = DeviceWROW.from_csr(csr)
    t = time_kernel_chained(wrow_spmv, xd, operands=wr,
                            min_time_s=0.3).time_per_iter_s
    g_wr = wr.cols.shape[0] // 8
    mark(f"wrow v1: {t*1e6:.1f} us, {t/g_wr*1e9:.2f} ns/group "
         f"({2*csr.nnz/t/1e9:.2f} GF)")

    wp = DeviceWPACK.from_csr(csr)
    gp = wp.cols.shape[0] // 8
    mark(f"wpack: util {wp.utilization:.3f} wsel {wp.wsel} groups {gp}")
    for tag, kw in (("noseg", dict(ablate="noseg")),
                    ("nogather/pad", dict(ablate="nogather", prefix="pad")),
                    ("nogather/roll", dict(ablate="nogather",
                                           prefix="roll")),
                    ("full/pad", dict(prefix="pad")),
                    ("full/roll", dict(prefix="roll"))):
        try:
            fn = lambda a, v: wpack_spmv(a, v, **kw)  # noqa: E731
            t = time_kernel_chained(fn, xd, operands=wp,
                                    min_time_s=0.3).time_per_iter_s
            mark(f"wpack {tag}: {t*1e6:.1f} us, {t/gp*1e9:.2f} ns/group "
                 f"({2*csr.nnz/t/1e9:.2f} GF)")
        except Exception as e:  # noqa: BLE001
            mark(f"wpack {tag}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
