"""WROW SpMV bottleneck ablation (VERDICT r2 weak #4 / ROADMAP item 3).

wrow_spmv measures ~21 GFLOPS = ~41ns per 8-piece group; the streaming
bound for its layout (~13.5KB/group at 680 GB/s) is ~20ns and the
measured Pallas floor for this shape of work is lower still.  This
script times kernel VARIANTS that each delete one stage of the group
body, isolating where the 41ns go:

  full      8 x-row loads + lane gather + FMA + reduce + y RMW
  nogather  loads + FMA on un-gathered src + reduce + RMW
  noload    one static x row reused + gather + FMA + reduce + RMW
  normw     loads + gather + FMA + reduce into a fixed accumulator row
  empty     loop body only touches the carry (overhead floor)

Variants write SOMETHING derived from their inputs to y2 so Mosaic
cannot DCE the stage under test.  Run on the real TPU:
    python scripts/exp_spmv_ablate.py [m avg bw]
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from spgrid.core.timing import time_kernel_chained  # noqa: E402
from spgrid.gen.artificial import artificial_matrix_generation  # noqa: E402
from spgrid.ops.pallas.wrow_spmv import (  # noqa: E402
    DeviceWROW, GROUPS_PER_STEP, LANE, wrow_spmv,
)

VARIANTS = ("full", "nogather", "noload", "normw", "empty")


def _kernel(pw_ref, gsub_ref, cols_ref, vals_ref, x2_ref, y2_ref, *,
            variant):
    b = pl.program_id(0)
    brow = b % 8

    @pl.when(b == 0)
    def _():
        y2_ref[:] = jnp.zeros_like(y2_ref)

    def body(g, _):
        sr = gsub_ref[brow, g]
        v = vals_ref[pl.ds(g * 8, 8), :]
        if variant == "empty":
            y2_ref[pl.ds(0, 1), :] += jnp.sum(v, axis=0, keepdims=True)
            return 0
        if variant == "noload":
            src = x2_ref[pl.ds(0, 8), :]
        else:
            src = jnp.concatenate(
                [x2_ref[pl.ds(pw_ref[brow, g * 8 + r], 1), :]
                 for r in range(8)], axis=0)
        if variant == "nogather":
            p = src * v
        else:
            idx = cols_ref[pl.ds(g * 8, 8), :].astype(jnp.int32)
            p = jnp.take_along_axis(src, idx, axis=1) * v
        row = 0 if variant == "normw" else sr
        y2_ref[pl.ds(row, 1), :] += jnp.sum(p, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, GROUPS_PER_STEP, body, 0, unroll=GROUPS_PER_STEP)


@functools.partial(jax.jit, static_argnames=("m2", "variant"))
def _spmv_variant(piece_w, group_sub, cols, vals, x2, *, m2, variant):
    gp = cols.shape[0] // (8 * GROUPS_PER_STEP)
    k2 = x2.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(gp,),
        in_specs=[
            pl.BlockSpec((8, 8 * GROUPS_PER_STEP), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, GROUPS_PER_STEP), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8 * GROUPS_PER_STEP, LANE), lambda b: (b, 0)),
            pl.BlockSpec((8 * GROUPS_PER_STEP, LANE), lambda b: (b, 0)),
            pl.BlockSpec((k2, LANE), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m2, LANE), lambda b: (0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m2, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() != "tpu",
    )(piece_w, group_sub, cols, vals, x2)


def main(argv):
    m = int(argv[0]) if argv else 100000
    avg = float(argv[1]) if len(argv) > 1 else 20.0
    bw = float(argv[2]) if len(argv) > 2 else 0.05
    csr = artificial_matrix_generation(m, m, avg, avg / 3, "normal",
                                       seed=14, placement="random", bw=bw)
    a = DeviceWROW.from_csr(csr)
    x = np.random.default_rng(0).standard_normal(m).astype(np.float32)
    xj = jnp.asarray(x)
    # reference numbers from the production kernel
    y = np.asarray(wrow_spmv(a, xj), np.float64)
    gold = np.zeros(m)
    np.add.at(gold, np.repeat(np.arange(m), csr.degrees),
              csr.values * x[csr.col_idx])
    err = np.abs(y - gold).max() / max(np.abs(gold).max(), 1e-30)
    flops = 2.0 * csr.nnz
    G = a.num_groups
    print(f"m={m} nnz={csr.nnz} groups={G} util={a.utilization:.3f} "
          f"max_rel~{err:.1e}", flush=True)

    k2 = max(-(-m // LANE), 1)
    x2 = jnp.zeros((k2 * LANE,), jnp.float32).at[:m].set(xj) \
        .reshape(k2, LANE)
    m2 = max(-(-m // LANE), 1)
    for variant in VARIANTS:
        fn = lambda ops, xx, v=variant: _spmv_variant(  # noqa: E731
            ops[0], ops[1], ops[2], ops[3], xx, m2=m2, variant=v)
        r = time_kernel_chained(
            fn, x2, operands=(a.piece_w, a.group_sub, a.cols, a.values),
            min_time_s=0.3, repeats=3)
        t = r.time_per_iter_s
        print(f"{variant:9s} {t*1e6:9.1f}us  {flops/t/1e9:7.1f} GF  "
              f"{t/G*1e9:6.1f} ns/group", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
