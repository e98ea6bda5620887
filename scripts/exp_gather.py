"""Microbenchmark: XLA gather / segment-sum building blocks on the TPU.

Round-2 design probe for the hypersparse SpMM regime (VERDICT.md item 1):
the whole kernel design hinges on how fast the TPU can gather scattered
(~2KB) X rows from HBM.  Reference counterpart of the regime:
benchmark_code/CPU/AMD spmm_kernel_mkl_ie.cpp:75-104 (105-328 GFLOPS on
EPYC for the same matrix class).

Usage: python scripts/exp_gather.py [expname ...]
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from spgrid.core.timing import time_kernel_chained

BW = 819e9  # v5e HBM bytes/s


def mk_idx(k, nnz, seed=0, banded=None):
    rng = np.random.default_rng(seed)
    if banded:
        # row-sorted, cols within a band (scaled bw `banded`)
        rows = np.sort(rng.integers(0, k, nnz))
        half = max(1, int(banded * k / 2))
        cols = rows + rng.integers(-half, half, nnz)
        return np.clip(cols, 0, k - 1).astype(np.int32), rows.astype(np.int32)
    return rng.integers(0, k, nnz).astype(np.int32), \
        np.sort(rng.integers(0, k, nnz)).astype(np.int32)


def _x16(X):
    """f32 (k,n) -> (k, 2n) int16: [:, :n] high halves, [:, n:] low."""
    bits = np.asarray(X).view(np.int32)
    hi = (bits >> 16).astype(np.int16)
    lo = bits.astype(np.int16)
    return jnp.asarray(np.concatenate([hi[:, None, :], lo[:, None, :]],
                                      axis=1).reshape(bits.shape[0], -1))


def report(name, t, useful_bytes, flops=None):
    gbs = useful_bytes / t / 1e9
    extra = f"  {flops / t / 1e9:9.1f} GFLOPS" if flops else ""
    print(f"{name:34s} {t * 1e6:10.1f} us  {gbs:7.1f} GB/s "
          f"({useful_bytes / 1e6:.0f}MB, {100 * useful_bytes / BW / t:.0f}% SOL)"
          f"{extra}", flush=True)


def run(name, fn, x, operands, useful_bytes, flops=None):
    try:
        r = time_kernel_chained(fn, x, operands=operands, min_time_s=0.3,
                                repeats=3)
        report(name, r.time_per_iter_s, useful_bytes, flops)
        return r.time_per_iter_s
    except Exception as e:  # noqa: BLE001
        print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return None


def main(which):
    k = 65536
    per_row = 6
    nnz = k * per_row
    n = 512
    X = jnp.asarray(np.random.default_rng(1).standard_normal((k, n)),
                    jnp.float32)
    cols_r, rows = mk_idx(k, nnz, banded=None)
    cols_b, rows_b = mk_idx(k, nnz, banded=0.05)
    colsj = jnp.asarray(cols_r)
    colsbj = jnp.asarray(cols_b)
    rowsj = jnp.asarray(rows)
    vals = jnp.asarray(
        np.random.default_rng(2).standard_normal(nnz), jnp.float32)
    out_bytes = nnz * n * 4
    flops = 2.0 * nnz * n

    def gather_full(ops, x):
        (idx,) = ops
        return jnp.take(x, idx, axis=0)

    def gather_fill(ops, x):
        (idx,) = ops
        return jnp.take(x, idx, axis=0, fill_value=0)

    def gather_n128(ops, x):
        (idx,) = ops
        return jnp.take(x[:, :128], idx, axis=0)

    def gather_sorted(ops, x):
        (idx,) = ops
        return jnp.take(x, idx, axis=0)

    def coo_spmm(ops, x):
        idx, rws, v = ops
        prods = v[:, None] * jnp.take(x, idx, axis=0, fill_value=0)
        return jax.ops.segment_sum(prods, rws, num_segments=k + 1)[:k]

    def ell_like(ops, x):
        idx, v = ops
        # ELL formulation: slots as trailing axis, weighted sum — no scatter
        g = jnp.take(x, idx.reshape(k, per_row).reshape(-1), axis=0,
                     fill_value=0).reshape(k, per_row, n)
        return jnp.einsum("rw,rwn->rn", v.reshape(k, per_row), g,
                          preferred_element_type=jnp.float32)

    def ell_mulsum(ops, x):
        idx, v = ops
        g = jnp.take(x, idx, axis=0, fill_value=0).reshape(k, per_row, n)
        return jnp.sum(v.reshape(k, per_row, 1) * g, axis=1)

    def segsum_only(ops, p):
        (rws,) = ops
        return jax.ops.segment_sum(p, rws, num_segments=k + 1)[:k]

    def ell_blocked(ops, x, rb=512):
        idx, v = ops
        cb = idx.reshape(k // rb, rb, per_row)
        vb = v.reshape(k // rb, rb, per_row)

        def block(args):
            c, vv = args
            g = jnp.take(x, c.reshape(-1), axis=0,
                         fill_value=0).reshape(rb, per_row, n)
            return jnp.einsum("rw,rwn->rn", vv, g,
                              preferred_element_type=jnp.float32)
        return jax.lax.map(block, (cb, vb)).reshape(k, n)

    def ell_blocked_bf16(ops, x):
        return ell_blocked(ops, x)

    def ell_blocked_i16(ops, x, rb=512):
        # x carried as (k, 2*n) int16: [:, :n]=hi16, [:, n:]=lo16 of f32
        idx, v = ops
        cb = idx.reshape(k // rb, rb, per_row)
        vb = v.reshape(k // rb, rb, per_row)

        def block(args):
            c, vv = args
            g = jnp.take(x, c.reshape(-1), axis=0,
                         fill_value=0).reshape(rb, per_row, 2, n)
            hi = g[:, :, 0, :].astype(jnp.int32)
            lo = g[:, :, 1, :].astype(jnp.int32) & 0xFFFF
            f = jax.lax.bitcast_convert_type(
                (hi << 16) | lo, jnp.float32)
            return jnp.einsum("rw,rwn->rn", vv, f,
                              preferred_element_type=jnp.float32)
        return jax.lax.map(block, (cb, vb)).reshape(k, n)

    def gather_bc16(ops, x):
        # f32 rows gathered as int16 rows of 2x width (same bytes)
        (idx,) = ops
        xv = jax.lax.bitcast_convert_type(x, jnp.int16).reshape(k, n * 2)
        g = jnp.take(xv, idx, axis=0)
        return jax.lax.bitcast_convert_type(
            g.reshape(nnz, n, 2), jnp.float32)

    def gather_bc8(ops, x):
        (idx,) = ops
        xv = jax.lax.bitcast_convert_type(x, jnp.int8).reshape(k, n * 4)
        g = jnp.take(xv, idx, axis=0)
        return jax.lax.bitcast_convert_type(
            g.reshape(nnz, n, 4), jnp.float32)

    def gather_int8(ops, x):
        (idx,) = ops
        return jnp.take(x, idx, axis=0)

    def gather_bf16w(ops, x):
        # bf16 source viewed as (k, 1024): 2KB rows, bf16 dtype
        (idx,) = ops
        return jnp.take(x.reshape(k // 2, n * 2), idx % (k // 2), axis=0)

    exps = {
        "gather_unsorted": lambda: run(
            "take (k,512) f32 unsorted", gather_full, X, (colsj,),
            out_bytes * 2),
        "gather_fill": lambda: run(
            "take fill_value=0 unsorted", gather_fill, X, (colsj,),
            out_bytes * 2),
        "gather_sorted": lambda: run(
            "take (k,512) f32 col-sorted", gather_sorted, X, (colsbj,),
            out_bytes * 2),
        "gather_n128": lambda: run(
            "take (k,128) f32 unsorted", gather_n128, X, (colsj,),
            out_bytes * 2 // 4),
        "gather_bf16": lambda: run(
            "take (k,512) bf16 unsorted", gather_full,
            X.astype(jnp.bfloat16), (colsj,), out_bytes),
        "coo": lambda: run(
            "coo gather+segsum", coo_spmm, X, (colsj, rowsj, vals),
            out_bytes * 2 + k * n * 4, flops),
        "ell_einsum": lambda: run(
            "ell take+einsum (m,w,n)", ell_like, X, (colsj, vals),
            out_bytes * 2 + k * n * 4, flops),
        "ell_mulsum": lambda: run(
            "ell take+mul+sum", ell_mulsum, X, (colsj, vals),
            out_bytes * 2 + k * n * 4, flops),
        "ell_blocked": lambda: run(
            "ell lax.map blocked f32", ell_blocked, X, (colsj, vals),
            out_bytes + k * n * 4, flops),
        "ell_blocked_b": lambda: run(
            "ell lax.map blocked f32 banded", ell_blocked, X,
            (colsbj, vals), out_bytes + k * n * 4, flops),
        "ell_blocked_bf16": lambda: run(
            "ell lax.map blocked bf16", ell_blocked_bf16,
            X.astype(jnp.bfloat16), (colsj, vals),
            out_bytes // 2 + k * n * 4, flops),
        "ell_blocked_i16": lambda: run(
            "ell lax.map blocked i16-pair", ell_blocked_i16, _x16(X),
            (colsj, vals), out_bytes + k * n * 4, flops),
        "gather_bc16": lambda: run(
            "take f32-as-int16 (k,1024)", gather_bc16, X, (colsj,),
            out_bytes * 2),
        "gather_bc8": lambda: run(
            "take f32-as-int8 (k,2048)", gather_bc8, X, (colsj,),
            out_bytes * 2),
        "gather_int8": lambda: run(
            "take (k,512) int8 unsorted", gather_int8,
            jnp.ones((k, n), jnp.int8), (colsj,), out_bytes // 2),
        "gather_bf16w": lambda: run(
            "take (k/2,1024) bf16 2KB rows", gather_bf16w,
            X.astype(jnp.bfloat16), (colsj,), out_bytes),
        "segsum_only": lambda: run(
            "segment_sum (nnz,512)->(k,512)", segsum_only,
            jnp.ones((nnz, n), jnp.float32), (rowsj,),
            out_bytes * 2 + k * n * 4),
    }
    names = which or list(exps)
    print(f"k={k} nnz={nnz} n={n} dev={jax.devices()[0].platform}",
          flush=True)
    for nm in names:
        exps[nm]()


if __name__ == "__main__":
    main(sys.argv[1:])
