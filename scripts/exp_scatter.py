"""Round-3 measurement campaign: primitives for the UNWINDOWABLE
(scattered) hypersparse SpMM regime (VERDICT r2 item 2).

The windowed gather-ELL (ops/gell.py) needs a <64MB gather source; a
scattered matrix with k >= ~300k has none, and the slow-path gather
(~55 Mrow/s = 110 GB/s effective) caps the class at 9-34 GFLOPS vs the
reference EPYC MKL-IE's 105-328 (amd-64/n=512/mkl_ie_f.csv:2-3).

Candidate designs, each bounded by a different unmeasured primitive:

A. n-tiled gather: gather from (k, w) column slices of X — the source is
   k*w*bytes, under the 64MB cliff for w=64..128 even at k ~ 500k.  Needs
   the gather rate as f(row_width, source_bytes): if the fast path is
   byte-bound (~400 GB/s) narrow rows win outright; if it is row-bound
   (~200 Mrow/s regardless of width) they lose 8x.
B. column-window COO + sorted segment_sum: entries sorted by (row-chunk,
   col-window); each scan step gathers from a <64MB dynamic slice (fast)
   and scatter-adds into the chunk's (R, n) carry.  Needs the TPU
   segment_sum/scatter-add rate.
C. column-window COO + one-hot MXU combine (wcoo_pallas's combine at
   XLA level): per (chunk, window) block, products (E, n) are reduced to
   (R, n) by a (R, E) one-hot matmul.  Needs the effective MXU rate at
   small R and the bf16-split accuracy cost.

Usage: python scripts/exp_scatter.py [gatherw] [segsum] [onehot] [proto]
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from spgrid.core.timing import time_kernel_chained


def bench(label, fn, x, operands, per_unit, unit):
    try:
        r = time_kernel_chained(fn, x, operands=operands, min_time_s=0.25,
                                repeats=3)
        t = r.time_per_iter_s
        print(f"{label:58s} {t*1e6:10.1f}us  "
              f"{per_unit/t/1e9:8.2f} G{unit}/s", flush=True)
        return t
    except Exception as e:  # noqa: BLE001
        print(f"{label:58s} FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return None


def gather_width(rng):
    """Gather rate vs (source rows k, row width w, sortedness)."""
    print("== A: gather rate vs row width / source size / sortedness")
    nrows = 1 << 21                     # 2M gathered rows per call
    for k in (1 << 15, 1 << 17, 1 << 19):
        idx_r = jnp.asarray(rng.integers(0, k, nrows).astype(np.int32))
        idx_s = jnp.sort(idx_r)
        for w in (64, 128, 512):
            for dt, b in (("f32", 4), ("bf16", 2)):
                src_mb = k * w * b / (1 << 20)
                x = jnp.asarray(
                    rng.standard_normal((k, w)).astype(np.float32))
                if dt == "bf16":
                    x = x.astype(jnp.bfloat16)
                for sorted_, idx in (("rnd", idx_r), ("srt", idx_s)):
                    fn = jax.jit(lambda ops, xc: jnp.take(
                        xc, ops[0], axis=0,
                        indices_are_sorted=(sorted_ == "srt")).sum(0))
                    label = (f"take k={k>>10}k w={w} {dt} "
                             f"src={src_mb:6.1f}MB {sorted_}")
                    t = bench(label, fn, x, (idx,), nrows / 1e0, "row")
                    del fn
                del x


def segsum(rng):
    """Sorted segment_sum (E, n)->(R, n): the B-design combine."""
    print("== B: segment_sum / scatter-add rate (n=512 f32)")
    n = 512
    for R, E in ((32768, 131072), (32768, 16384), (8192, 65536),
                 (1024, 16384)):
        rows = np.sort(rng.integers(0, R, E).astype(np.int32))
        prods = jnp.asarray(rng.standard_normal((E, n)).astype(np.float32))
        rowsd = jnp.asarray(rows)

        def seg(ops, p):
            return jax.ops.segment_sum(p, ops[0], num_segments=R,
                                       indices_are_sorted=True)
        fn = jax.jit(seg)
        bench(f"segsum sorted E={E>>10}k R={R>>10}k", fn, prods, (rowsd,),
              E, "row")
        # unique-sorted scatter (permutation-write): rows 0..E-1 spaced
        uniq = jnp.asarray(
            np.sort(rng.choice(R, size=min(E, R), replace=False))
            .astype(np.int32))
        y0 = jnp.zeros((R, n), jnp.float32)
        pu = prods[: uniq.shape[0]]

        def scat(ops, p):
            u, y = ops
            return y.at[u].add(p, indices_are_sorted=True,
                               unique_indices=True)
        fn2 = jax.jit(scat)
        bench(f"scatter-add uniq-sorted E={int(uniq.shape[0])>>10}k "
              f"R={R>>10}k", fn2, pu, (uniq, y0), int(uniq.shape[0]), "row")


def onehot(rng):
    """One-hot MXU combine rate: (R, E) @ (E, n) with E entries."""
    print("== C: one-hot MXU combine (bf16 one-hot, f32 accum)")
    n = 512
    for R, E in ((512, 8192), (1024, 8192), (2048, 8192)):
        rows = np.sort(rng.integers(0, R, E).astype(np.int32))
        oh = np.zeros((R, E), np.float32)
        oh[rows, np.arange(E)] = 1.0
        ohd = jnp.asarray(oh, jnp.bfloat16)
        prods = jnp.asarray(rng.standard_normal((E, n)).astype(np.float32))

        def comb(ops, p):
            return jax.lax.dot_general(
                ops[0], p.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        fn = jax.jit(comb)
        bench(f"one-hot ({R},{E>>10}k)@({E>>10}k,{n})", fn, prods, (ohd,),
              E, "row")


def proto(rng):
    """End-to-end B prototype: two-level scan, col-window gather +
    sorted segment_sum, on an art_393215-like scattered matrix."""
    print("== proto: windowed-COO scan (m=k=393216, avg 6/row, n=512)")
    m = k = 393216
    n = 512
    avg = 6
    nnz = m * avg
    rows = np.repeat(np.arange(m, dtype=np.int64), avg)
    cols = rng.integers(0, k, nnz).astype(np.int64)
    vals = rng.standard_normal(nnz).astype(np.float32)

    R = 1 << 15                         # 32k-row chunks
    W = 1 << 15                         # 32k-col windows: 64MB f32 src
    nb, ns = m // R, k // W
    blk = (rows // R) * ns + cols // W
    order = np.lexsort((rows, blk))
    rows, cols, vals, blk = rows[order], cols[order], vals[order], blk[order]
    counts = np.bincount(blk, minlength=nb * ns)
    E = int(-(-counts.max() // 8) * 8)
    print(f"  blocks={nb}x{ns} E_pad={E} fill={nnz/(nb*ns*E):.2f}")
    # pad each block to E entries (pad rows point at local row 0 val 0)
    lrow = np.zeros((nb * ns, E), np.int32)
    lcol = np.zeros((nb * ns, E), np.int32)
    lval = np.zeros((nb * ns, E), np.float32)
    off = np.zeros(nb * ns + 1, np.int64)
    np.cumsum(counts, out=off[1:])
    idx = np.arange(nnz) - off[blk] + blk * E
    flat_r = lrow.reshape(-1); flat_c = lcol.reshape(-1)
    flat_v = lval.reshape(-1)
    flat_r[idx] = (rows % R).astype(np.int32)
    flat_c[idx] = (cols % W).astype(np.int32)
    flat_v[idx] = vals
    lrow = jnp.asarray(lrow.reshape(nb, ns, E))
    lcol = jnp.asarray(lcol.reshape(nb, ns, E))
    lval = jnp.asarray(lval.reshape(nb, ns, E))
    x = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))

    @jax.jit
    def spmm(ops, xc):
        lr, lc, lv = ops

        def outer(_, blkb):
            lrb, lcb, lvb = blkb

            def inner(carry, sblk):
                lrw, lcw, lvw, wi = sblk
                xw = jax.lax.dynamic_slice(xc, (wi * W, 0), (W, n))
                g = jnp.take(xw, lcw, axis=0)
                p = lvw[:, None] * g
                return carry + jax.ops.segment_sum(
                    p, lrw, num_segments=R, indices_are_sorted=True), 0

            y0 = jnp.zeros((R, n), jnp.float32)
            yb, _ = jax.lax.scan(
                inner, y0,
                (lrb, lcb, lvb, jnp.arange(ns, dtype=jnp.int32)))
            return 0, yb

        _, ys = jax.lax.scan(outer, 0, (lr, lc, lv))
        return ys.reshape(m, n)

    t = bench("proto windowed-COO scan", spmm, x, (lrow, lcol, lval),
              2.0 * nnz * n / 1e0, "FLOP")
    if t:
        print(f"  -> {2.0*nnz*n/t/1e9:.1f} GFLOPS vs gell slow-path ~34")
        y = spmm((lrow, lcol, lval), x)
        import scipy.sparse as sp
        a = sp.coo_matrix((vals, (rows, cols)), shape=(m, k)).tocsr()
        gold = a @ np.asarray(x, np.float64)
        err = np.max(np.abs(np.asarray(y, np.float64) - gold)
                     / (np.abs(gold) + 1e-6))
        print(f"  max rel err {err:.2e}")


def main(argv):
    rng = np.random.default_rng(0)
    which = set(argv) or {"gatherw", "segsum", "onehot"}
    if "gatherw" in which:
        gather_width(rng)
    if "segsum" in which:
        segsum(rng)
    if "onehot" in which:
        onehot(rng)
    if "proto" in which:
        proto(rng)


if __name__ == "__main__":
    main(sys.argv[1:])
