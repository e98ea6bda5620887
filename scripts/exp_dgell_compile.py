"""dgell Mosaic-compile bisect + first timing (round 4).

The full-fan-out dgell (one DMA semaphore per copy, 112+ live, 224
unrolled copy ops) crashed the remote Mosaic compiler on every grid
matrix (HTTP 500 / tpu_compile_helper exit 1).  The wave restructure
bounds live semaphores (SPGRID_DGELL_WAVE).  This probe compiles and
times the kernel on a small scattered matrix across wave sizes and
(rb, slots) caps so the fix is chosen from data, not guesswork.

Run standalone (owns the TPU): python scripts/exp_dgell_compile.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main(argv=()):
    import jax
    import jax.numpy as jnp
    from spgrid.gen.artificial import artificial_matrix_generation
    from spgrid.ops.pallas.dgell import DeviceDGELL, _dgell_call
    from spgrid.core.timing import time_kernel_chained

    # small scattered matrix: enough rows for a real grid, tiny gen cost
    csr = artificial_matrix_generation(
        65536, 65536, 5, 1.6667, "normal", seed=14, placement="random",
        bw=0.9, skew=0, avg_num_neighbours=0.9, cross_row_similarity=0.3,
        name="dgell_probe_65k")
    n = 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((65536, n)), jnp.float32)

    for rb in (16, 8):
        a = DeviceDGELL.from_csr(csr, rb=rb)
        fan = a.rb * a.slots
        for wave in (8, 16, 32, fan):
            if wave > fan:
                continue
            try:
                fn = lambda ops, xx: _dgell_call(  # noqa: E731
                    ops[0], ops[1], xx, rb=a.rb, S=a.slots,
                    wave=wave, interpret=False)
                r = time_kernel_chained(
                    fn, x, operands=(a.cols, a.values),
                    min_time_s=0.25, repeats=3)
                t = r.time_per_iter_s
                gf = 2.0 * csr.nnz * n / t / 1e9
                rows_s = a.values.shape[0] // a.rb * fan / t / 1e6
                print(f"rb={a.rb} S={a.slots} wave={wave:3d}: "
                      f"{t*1e6:9.1f}us {gf:7.1f} GF "
                      f"{rows_s:8.1f} Mfetch/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"rb={a.rb} S={a.slots} wave={wave:3d} FAILED: "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
