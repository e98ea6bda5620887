"""Probe: can column-chunking X put scattered gathers on the fast path?

The measured XLA gather cliff is ~5x slower once the SOURCE exceeds
~64MB (see ops/gell.py module doc) — and scattered structure cannot be
row-windowed under it (newkernels_r3.csv: every kernel 17-35 GF on the
scat twins, ~8% of the random-access HBM ceiling).  But the cliff is
source BYTES: a (k, nc) column slice of X with nc*k*4 <= 64MB is under
it for any k in the study range.  Gathering the same scattered rows
once per column chunk re-pays only the index traffic (nnz*4B per chunk,
~3% of the row data at n=512) — if each chunked gather runs at the
fast rate, the whole scattered class rides it.

All operands are device-generated: host->device rides a ~2MB/s tunnel
here (CLAUDE.md), so a transferred 1GB X stalls for minutes.

Run standalone (owns the TPU): python scripts/exp_colchunk_gather.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=()):
    import jax
    import jax.numpy as jnp
    from spgrid.core.timing import time_kernel_chained

    k = 524288
    nnz = 2_621_440          # scat_524k twin scale: avg 5/row
    key = jax.random.PRNGKey(0)
    kx, ki = jax.random.split(key)
    idx = jax.jit(lambda kk: jax.random.randint(
        kk, (nnz,), 0, k, dtype=jnp.int32))(ki)
    idx.block_until_ready()

    print(f"k={k} gathered rows={nnz}", flush=True)
    for nc in (512, 128, 64, 32, 16):
        src_mb = k * nc * 4 / (1 << 20)
        x = jax.jit(lambda kk, nc=nc: jax.random.normal(
            kk, (k, nc), jnp.float32))(kx)
        x.block_until_ready()
        fn = jax.jit(lambda xx, ii: jnp.take(xx, ii, axis=0))
        r = time_kernel_chained(
            lambda ops, xx: fn(xx, ops[0]), x, operands=(idx,),
            min_time_s=0.25, repeats=3)
        t = r.time_per_iter_s
        by = nnz * nc * 4 * 2
        print(f"nc={nc:4d} src={src_mb:7.1f}MB: {t*1e6:9.1f}us "
              f"{nnz/t/1e6:8.1f} Mrow/s {by/t/1e9:7.1f} GB/s", flush=True)
        del x

    # end-to-end shape: full n=512 gathered via 64-col chunks vs one shot
    n = 512
    xb = jax.jit(lambda kk: jax.random.normal(
        kk, (k, n), jnp.float32))(kx)
    xb.block_until_ready()

    def chunked(ops, xx):
        # slice inside jit: XLA may fuse the slice into the gather and
        # keep the big source on the slow path — measure to find out
        ii = ops[0]
        outs = [jnp.take(xx[:, c:c + 64], ii, axis=0)
                for c in range(0, n, 64)]
        return jnp.concatenate(outs, axis=1)

    def oneshot(ops, xx):
        return jnp.take(xx, ops[0], axis=0)

    # pre-materialized chunk buffers: each gather operand is genuinely
    # a separate <=64MB device array (what a real cgell layout keeps)
    xsplit = tuple(jax.jit(lambda a, c=c: a[:, c:c + 64] + 0.0)(xb)
                   for c in range(0, n, 64))
    for p in xsplit:
        p.block_until_ready()

    def presplit(ops, xx):
        ii = ops[0]
        outs = [jnp.take(p, ii, axis=0) for p in ops[1:]]
        return jnp.concatenate(outs, axis=1)

    for name, f, extra in (("oneshot", oneshot, ()),
                           ("chunk64-fused", chunked, ()),
                           ("chunk64-presplit", presplit, xsplit)):
        fn = jax.jit(f)
        r = time_kernel_chained(fn, xb, operands=(idx,) + extra,
                                min_time_s=0.25, repeats=3)
        t = r.time_per_iter_s
        by = nnz * n * 4 * 2
        print(f"{name}: {t*1e6:9.1f}us {by/t/1e9:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
