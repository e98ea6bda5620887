"""Measure Pallas primitives for the hypersparse SpMM redesign:

1. per-row HBM->VMEM DMA gather rate (scattered 2KB rows)
2. lane-shuffle (take_along_axis) op throughput on resident tiles

Decides between DMA-gather GELL vs window-piece (WROW-SpMM) designs.
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spgrid.core.timing import time_kernel_chained

LANE = 128


def dma_gather(x, idx2, G, n):
    """Gather rows x[idx] via per-row DMAs, G rows per grid step."""
    steps = idx2.shape[0] // 8  # idx2 is (steps*8 pad, G) SMEM-blocked

    def kernel(i_ref, x_ref, o_ref, scratch, sems):
        s = pl.program_id(0)
        row = s % 8

        def start(slot, j):
            pltpu.make_async_copy(
                x_ref.at[pl.ds(i_ref[row, j], 1), :],
                scratch.at[slot, pl.ds(j % (G // 2), 1), :],
                sems.at[slot, j % (G // 2)],
            ).start()

        # fill first half, then overlap second half with first's waits
        for j in range(G // 2):
            start(0, j)
        for j in range(G // 2):
            start(1, G // 2 + j)
        for half in range(2):
            for j in range(G // 2):
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(i_ref[row, half * G // 2 + j], 1), :],
                    scratch.at[half, pl.ds(j, 1), :],
                    sems.at[half, j],
                ).wait()
            o_ref[pl.ds(half * (G // 2), G // 2), :] = scratch[half]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(idx2.shape[0] // 8 * 8 and idx2.shape[0],),
        in_specs=[
            pl.BlockSpec((8, G), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((G, n), lambda b: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, G // 2, n), jnp.float32),
            pltpu.SemaphoreType.DMA((2, G // 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((idx2.shape[0] * G, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(idx2, x)


def shuffle_bench(reps):
    """Chain `reps` dependent lane-gathers on one resident (256,128) tile."""
    def kernel(s_ref, i_ref, o_ref):
        acc = s_ref[:]
        idx = i_ref[:]
        for _ in range(reps):
            acc = jnp.take_along_axis(acc, idx, axis=1) + 1.0
        o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, LANE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def main(argv):
    rng = np.random.default_rng(0)
    k, n = 65536, 512
    X = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)

    if "xla" in argv or not argv:
        # baseline: XLA's own gather on the same over-cliff source/pattern
        nrows = 64 * 384
        idx = jnp.asarray(rng.integers(0, k, nrows).astype(np.int32))
        fn = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
        r = time_kernel_chained(
            lambda ops, x: fn(x, ops[0]), X, operands=(idx,),
            min_time_s=0.3, repeats=3)
        t = r.time_per_iter_s
        by = nrows * n * 4 * 2
        print(f"xla-gather 134MB-src: {t*1e6:9.1f}us "
              f"{nrows/t/1e6:8.1f} Mrow/s {by/t/1e9:7.1f} GB/s", flush=True)

    if "dma" in argv or not argv:
        for G in (64, 256):
            nsteps = 384  # G*nsteps rows gathered
            nrows = G * nsteps
            idx = rng.integers(0, k, (nsteps, G)).astype(np.int32)
            pad = (-nsteps) % 8
            idx2 = jnp.asarray(np.pad(idx, ((0, pad), (0, 0))))

            fn = jax.jit(functools.partial(dma_gather, G=G, n=n))
            try:
                r = time_kernel_chained(
                    lambda ops, x: fn(x, ops[0]), X, operands=(idx2,),
                    min_time_s=0.3, repeats=3)
                t = r.time_per_iter_s
                by = nrows * n * 4 * 2
                print(f"dma-gather G={G}: {t*1e6:9.1f}us "
                      f"{nrows/t/1e6:8.1f} Mrow/s {by/t/1e9:7.1f} GB/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"dma-gather G={G} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    if "shuffle" in argv or not argv:
        src = jnp.asarray(rng.standard_normal((256, LANE)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, LANE, (256, LANE)), jnp.int32)
        ts = {}
        for reps in (64, 256):
            fn = jax.jit(shuffle_bench(reps))
            r = time_kernel_chained(
                lambda ops, x: fn(x, ops[0]), src, operands=(idx,),
                min_time_s=0.3, repeats=3)
            ts[reps] = r.time_per_iter_s
            print(f"shuffle chain reps={reps}: {r.time_per_iter_s*1e6:9.2f}us",
                  flush=True)
        # differenced: per (gather+add) on (256,128) = 32 sublane tiles
        per = (ts[256] - ts[64]) / (256 - 64)
        print(f"per shuffle+add (256,128): {per*1e9:.1f} ns "
              f"= {per*0.94e9/32:.2f} cyc/subtile-pair", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
