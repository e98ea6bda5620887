"""SCOO bottleneck ablation: gather vs sorted scatter-add (r3 probe).

scoo's cost model carries a PLACEHOLDER 12 ns/nnz for the in-place
sorted scatter-add (`costmodel.C.scoo_scatter`); this probe measures the
stages separately on the real device so the constant can be fitted and
the combine redesigned if the scatter dominates:

  full         window gather + product + y.at[rows].add (the kernel)
  noscatter    gather + product, reduced into one fixed row (scatter cut)
  nogather     product on a static slice + scatter (gather cut)

Usage: python scripts/exp_scoo_ablate.py [m avg bw]
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from spgrid.core.timing import time_kernel_chained  # noqa: E402
from spgrid.gen.artificial import artificial_matrix_generation  # noqa: E402
from spgrid.ops.scoo import DeviceSCOO, _round_up, scoo_spmm  # noqa: E402

VARIANTS = ("full", "noscatter", "nogather")


@functools.partial(jax.jit, static_argnames=("m", "plan", "variant"))
def _scoo_variant(rows, cols, vals, x, *, m, plan, variant):
    nb, ns, R, W, E = plan
    k, n = x.shape
    k_pad = _round_up(k, W)
    if k_pad != k:
        x = jnp.pad(x, ((0, k_pad - k), (0, 0)))

    def outer(_, blk):
        rb, cb, vb = blk

        def inner(y, wblk):
            rw, cw, vw, j = wblk
            xw = jax.lax.dynamic_slice(x, (j * W, 0), (W, n))
            if variant == "nogather":
                g = jax.lax.dynamic_slice(xw, (0, 0), (1, n))
                p = vw[:, None] * g
            else:
                g = jnp.take(xw, cw, axis=0)
                p = vw[:, None] * g
            p = jax.lax.optimization_barrier(p)
            if variant == "noscatter":
                y = y.at[0].add(jnp.sum(p, axis=0))
            else:
                y = y.at[rw].add(p, indices_are_sorted=True)
            return y, 0

        y0 = jnp.zeros((R + 8, n), jnp.float32)
        yb, _ = jax.lax.scan(
            inner, y0, (rb, cb, vb, jnp.arange(ns, dtype=jnp.int32)))
        return 0, yb[:R]

    _, ys = jax.lax.scan(outer, 0, (rows, cols, vals))
    return ys.reshape(nb * R, n)[:m].astype(x.dtype)


def main(argv):
    m = int(argv[0]) if argv else 200000
    avg = float(argv[1]) if len(argv) > 1 else 6.0
    bw = float(argv[2]) if len(argv) > 2 else 0.9
    n = 512
    csr = artificial_matrix_generation(m, m, avg, avg / 3, "normal",
                                       seed=14, placement="random", bw=bw)
    a = DeviceSCOO.from_csr(csr)
    nb, ns, R, W, E = a.plan
    nnz_pad = nb * ns * E
    print(f"scoo m={m} nnz={csr.nnz} plan nb={nb} ns={ns} E={E} "
          f"pad={nnz_pad/csr.nnz:.2f}x", flush=True)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((m, n)).astype(np.float32))
    # correctness of the full path vs the production entry
    y_prod = np.asarray(scoo_spmm(a, x))
    y_full = np.asarray(_scoo_variant(a.rows, a.cols, a.values, x,
                                      m=a.shape[0], plan=a.plan,
                                      variant="full"))
    assert np.allclose(y_prod, y_full), "variant full != production"
    flops = 2.0 * csr.nnz * n
    for variant in VARIANTS:
        fn = lambda ops, xx, v=variant: _scoo_variant(  # noqa: E731
            ops[0], ops[1], ops[2], xx, m=a.shape[0], plan=a.plan,
            variant=v)
        r = time_kernel_chained(
            fn, x, operands=(a.rows, a.cols, a.values),
            min_time_s=0.3, repeats=3)
        t = r.time_per_iter_s
        print(f"{variant:10s} {t*1e6:9.1f}us {flops/t/1e9:7.1f} GF "
              f"{t/nnz_pad*1e9:6.2f} ns/padded-nnz", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
