"""Pallas TPU kernel: WCOO SpMM/SpMV — lane-gather + one-hot MXU reduction.

The hypersparse companion to bsr_spmm (see spgrid.formats.wcoo for the
layout rationale, derived from measured v5e behavior: scalar gather/scatter
are ~1000x off roofline; the 128-lane shuffle and the MXU are the fast
paths).

Per grid step (n_tile nt, chunk c):
  window   XT[nt*NS:, win[c]*128 : +128]                  (NS, 128) auto-DMA,
           reused while consecutive chunks share the window
  gather   g = take_along_axis(window, bcast(cols[c]))    (NS, 128)
  product  p = g * vals[c]                                (NS, 128)
  reduce   contrib = p @ onehot(row_local[c])             (NS, 128)  MXU
  accum    out[:, sub[c]*128 : +128] += contrib           dynamic lane slice

Output is YT (n_pad, mb*R) — transposed; callers slice/transpose back.
Chunks of one row block are consecutive (packer guarantee) so the output
tile stays resident in VMEM across its chunks; the first chunk of each
block zeroes the whole tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spgrid.formats.wcoo import WCOOMatrix, LANE


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(W, win_ref, rb_ref, subfirst_ref,
            cols_ref, rows_ref, vals_ref, xt_ref, out_ref):
    c = pl.program_id(1)
    # sub/first ride as an (8, 2*8) SMEM-blocked input (8 chunk rows x
    # [sub, first] pairs x 8-chunk block): keeping them in scalar-prefetch
    # SMEM alongside win/rb overflows the ~1MB SMEM on ~100k-row matrices.
    crow = (c // 8) % 8
    sub_c = subfirst_ref[crow, 2 * (c % 8)]
    first_c = subfirst_ref[crow, 2 * (c % 8) + 1]

    @pl.when(first_c == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ns = xt_ref.shape[0]
    # Slot arrays arrive as (8, W) blocks of 8 chunks (TPU tiling); select
    # this chunk's sublane row dynamically.
    srow = c % 8
    cols = cols_ref[pl.ds(srow, 1), :]                       # (1, W)
    rows = rows_ref[pl.ds(srow, 1), :]
    vals = vals_ref[pl.ds(srow, 1), :]
    idx = jnp.broadcast_to(cols, (ns, W))
    g = jnp.take_along_axis(xt_ref[:], idx, axis=1)          # lane shuffle
    p = g * vals                                             # (NS, W)
    # One-hot segmented reduction on the MXU. 0/1 entries are exact in any
    # precision; HIGHEST keeps the f32 products intact through the pass.
    oh = (rows.reshape(W, 1)
          == jax.lax.broadcasted_iota(jnp.int32, (W, W), 1))
    contrib = jax.lax.dot(
        p, oh.astype(p.dtype),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    off = sub_c * W
    out_ref[:, pl.ds(off, W)] += contrib


@functools.partial(
    jax.jit,
    static_argnames=("W", "R", "mb", "m", "n", "ns", "interpret"),
)
def _wcoo_spmm(c_win, c_rb, c_sub, c_first, cols, rows, vals, xt,
               *, W, R, mb, m, n, ns, interpret):
    nchunks = c_win.shape[0]          # true chunks; slot arrays are padded
    n_pad, k_pad = xt.shape
    num_n_tiles = n_pad // ns

    # interleave [sub, first] pairs, 8 chunks per row, 8 rows per block
    padc = (-nchunks) % 64
    sub_p = jnp.pad(c_sub, (0, padc))
    first_p = jnp.pad(c_first, (0, padc))
    subfirst = jnp.stack([sub_p, first_p], axis=1).reshape(-1, 16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_n_tiles, nchunks),
        in_specs=[
            pl.BlockSpec((8, 16), lambda nt, c, win, rb: (c // 64, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, W), lambda nt, c, win, rb: (c // 8, 0)),
            pl.BlockSpec((8, W), lambda nt, c, win, rb: (c // 8, 0)),
            pl.BlockSpec((8, W), lambda nt, c, win, rb: (c // 8, 0)),
            pl.BlockSpec((ns, W),
                         lambda nt, c, win, rb: (nt, win[c])),
        ],
        out_specs=pl.BlockSpec(
            (ns, R), lambda nt, c, win, rb: (nt, rb[c])),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, W),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, mb * R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_n_tiles * nchunks * ns * W * (1 + W),
            bytes_accessed=num_n_tiles * nchunks * (ns * W + 3 * W) * 4
            + n_pad * mb * R * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(c_win, c_rb, subfirst, cols, rows, vals, xt)
    return out


@jax.tree_util.register_pytree_node_class
class DeviceWCOO:
    """Device mirror of WCOOMatrix (chunk arrays on device)."""

    def tree_flatten(self):
        children = (self.cols, self.rows, self.values, self.chunk_window,
                    self.chunk_rowblock, self.chunk_sub, self.chunk_first)
        aux = (self.shape, self.nnz, self.W, self.R, self.num_rowblocks,
               self.utilization, self.name)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.cols, obj.rows, obj.values, obj.chunk_window,
         obj.chunk_rowblock, obj.chunk_sub, obj.chunk_first) = children
        (obj.shape, obj.nnz, obj.W, obj.R, obj.num_rowblocks,
         obj.utilization, obj.name) = aux
        return obj

    def __init__(self, w: WCOOMatrix):
        assert w.cols_in_window.ndim == 2
        self.cols = jnp.asarray(w.cols_in_window)
        self.rows = jnp.asarray(w.row_local)
        self.values = jnp.asarray(w.values)
        self.chunk_window = jnp.asarray(w.chunk_window)
        self.chunk_rowblock = jnp.asarray(w.chunk_rowblock)
        self.chunk_sub = jnp.asarray(w.chunk_sub)
        self.chunk_first = jnp.asarray(w.chunk_first)
        self.shape = w.shape
        self.nnz = w.nnz
        self.W = w.W
        self.R = w.R
        self.num_rowblocks = w.num_rowblocks
        self.utilization = w.utilization
        self.name = w.name

    @classmethod
    def from_csr(cls, csr, R: int = 1024, W: int = LANE) -> "DeviceWCOO":
        from spgrid.formats.wcoo import csr_to_wcoo
        return cls(csr_to_wcoo(csr, R=R, W=W))


def wcoo_spmm(a: DeviceWCOO, x: jax.Array, *, sublanes: int = 128,
              interpret: bool | None = None) -> jax.Array:
    """Y = A @ X.  X (k, n) is transposed/padded internally; returns (m, n).

    For SpMV pass x of shape (k,): runs with 8 sublanes (n padded to 8)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    k, n = x.shape
    m = a.shape[0]
    ns = min(sublanes, _round_up(n, 8))
    n_pad = _round_up(n, ns)
    k_pad = _round_up(max(k, a.W), a.W)
    xt = jnp.zeros((n_pad, k_pad), x.dtype)
    xt = jax.lax.dynamic_update_slice(xt, x.T, (0, 0))
    mb = a.num_rowblocks

    yt = _wcoo_spmm(
        a.chunk_window, a.chunk_rowblock, a.chunk_sub, a.chunk_first,
        a.cols, a.rows, a.values, xt,
        W=a.W, R=a.R, mb=mb, m=m, n=n, ns=ns, interpret=interpret,
    )
    y = yt[:n, :m].T.astype(x.dtype)
    return y[:, 0] if squeeze else y
