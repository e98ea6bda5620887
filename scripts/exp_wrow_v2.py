"""WROW v2 prototype: block-stationary SpMV accumulation (ROADMAP SpMV).

v1 (ops/pallas/wrow_spmv.py) pays, per 8-piece group: a sublane reduce
and a read-modify-write of a dynamically-indexed y row — and consecutive
groups of one target block form a serial RMW chain on the same row.  v2
exploits the layout's existing guarantee that a block's groups are
CONTIGUOUS: an (8,128) VMEM accumulator carries partials across groups
(and across grid steps — scratch persists), flushing to y once per
TARGET BLOCK (sr change detected via an SMEM "open block" cell).  The
per-group body shrinks to loads + lane-shuffle + FMA + full-tile add.

Correctness in interpret mode, then an A/B vs v1 on the TPU (run by the
new-kernel probe pass).  If it wins, promote into wrow_spmv.
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


def _kernel(pw_ref, gsub_ref, cols_ref, vals_ref, x2_ref, y2_ref,
            acc, open_ref):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    brow = b % 8

    @pl.when(b == 0)
    def _():
        y2_ref[:] = jnp.zeros_like(y2_ref)
        acc[:] = jnp.zeros_like(acc)
        open_ref[0] = jnp.int32(-1)

    def body(g, _):
        sr = gsub_ref[brow, g]
        opn = open_ref[0]

        @pl.when((sr != opn) & (opn >= 0))
        def _():
            y2_ref[pl.ds(opn, 1), :] += jnp.sum(acc[:], axis=0,
                                                keepdims=True)
            acc[:] = jnp.zeros_like(acc)

        @pl.when(sr != opn)
        def _():
            open_ref[0] = sr

        src = jnp.concatenate(
            [x2_ref[pl.ds(pw_ref[brow, g * 8 + r], 1), :] for r in range(8)],
            axis=0)
        idx = cols_ref[pl.ds(g * 8, 8), :].astype(jnp.int32)
        v = vals_ref[pl.ds(g * 8, 8), :]
        acc[:] += jnp.take_along_axis(src, idx, axis=1) * v
        return 0

    jax.lax.fori_loop(0, GROUPS_PER_STEP, body, 0, unroll=GROUPS_PER_STEP)

    @pl.when(b == nb - 1)
    def _():
        opn = open_ref[0]

        @pl.when(opn >= 0)
        def _():
            y2_ref[pl.ds(opn, 1), :] += jnp.sum(acc[:], axis=0,
                                                keepdims=True)


@functools.partial(jax.jit, static_argnames=("m2", "interpret"))
def wrow_spmv_v2(piece_w, group_sub, cols, vals, x2, *, m2, interpret):
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
        scratch_shapes=[
            pltpu.VMEM((8, LANE), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m2, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(piece_w, group_sub, cols, vals, x2)


def run(a: DeviceWROW, x: jax.Array, interpret: bool) -> jax.Array:
    m, k = a.shape
    k2 = max(-(-k // LANE), 1)
    x2 = jnp.zeros((k2 * LANE,), x.dtype).at[:k].set(x).reshape(k2, LANE)
    m2 = max(-(-m // LANE), 1)
    y2 = wrow_spmv_v2(a.piece_w, a.group_sub, a.cols, a.values, x2, m2=m2,
                      interpret=interpret)
    return y2.reshape(-1)[:m].astype(x.dtype)


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
    y2 = np.asarray(run(a, xj, interpret), np.float64)
    err = np.abs(y2 - gold).max() / max(np.abs(gold).max(), 1e-30)
    print(f"wrow-v2 m={m} nnz={csr.nnz} util={a.utilization:.3f} "
          f"max_rel~{err:.2e}", flush=True)
    assert err < 1e-4, err
    if interpret:
        print("(interpret mode: correctness only)")
        return
    flops = 2.0 * csr.nnz
    for name, fn in (
        # both sides rebuild x2 from the fed-back x inside the timed fn
        # (the chained protocol perturbs x; a closed-over x2 would let
        # XLA hoist the kernel out of the loop)
        ("v1", lambda ops, xx: wrow_spmv(ops[0], xx)),
        ("v2", lambda ops, xx: run(ops[0], xx, False)),
    ):
        r = time_kernel_chained(fn, xj, operands=(a,), min_time_s=0.3,
                                repeats=3)
        t = r.time_per_iter_s
        print(f"wrow-{name}: {t*1e6:9.1f}us {flops/t/1e9:7.1f} GF "
              f"{t/a.num_groups*1e9:6.1f} ns/group", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
