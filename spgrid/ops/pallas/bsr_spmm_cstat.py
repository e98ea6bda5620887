"""Pallas TPU kernel: C-stationary block-sparse SpMM.

The row-stationary kernel (bsr_spmm.py) re-DMAs a (bk x n_tile) X tile per
block, so its HBM traffic is nb*bk*n_tile*4 bytes — for matrices whose
block grid is mostly full that is ~32x the size of X itself and becomes the
bound (measured: 4096^2 50%-dense f32 n=512 runs at exactly its
268MB/819GB/s traffic time).  This variant inverts the stationarity, the
TPU analogue of the reference's CSC/column-major kernels
(spmv_kernel_mkl_csc.cpp) crossed with its row-band partitioning
(split_matrix, spmv_bench.cpp:952-987):

  - rows are split into bands of R rows; each band's output slab
    (R x n_tile) stays RESIDENT in VMEM for the whole band pass,
  - within a band, blocks are sorted by (block_col, block_row), so
    consecutive grid steps share the same X tile and Pallas skips the
    re-DMA (input revisiting),
  - each step accumulates block @ X-tile into a dynamic row window of the
    resident output slab.

HBM traffic drops to blocks + (distinct block-cols per band) X tiles + one
output write — for a full block grid that is ~(blocks + bands * X + Y),
within ~15% of the dense matmul's traffic, while keeping block-skipping
for structured sparsity.

Padding blocks carry local block-row R/bm (a sacrificial row window past
the band's real rows) and repeat the previous block's column so they cost
no extra DMA.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spgrid.formats.csr import CSRMatrix
from spgrid.ops.layouts import _round_up
from spgrid.formats.bsr import csr_to_bsr


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceBSRCol:
    """Band-partitioned, column-major-sorted block layout (see module doc).

    Arrays are flattened over (band, slot) with every band padded to the
    same slot count; ``local_rows[s]`` is the block-row *within its band*
    (pad slots point at the sacrificial row R/bm)."""

    local_rows: jax.Array    # (bands*max_nb,) int32
    block_cols: jax.Array    # (bands*max_nb,) int32
    blocks: jax.Array        # (bands*max_nb, bm, bk)
    shape: Tuple[int, int]
    nnz: int
    num_blocks: int          # true block count
    band_rows: int           # R — rows per band (multiple of bm)
    bands: int
    max_nb: int              # slots per band

    def tree_flatten(self):
        return ((self.local_rows, self.block_cols, self.blocks),
                (self.shape, self.nnz, self.num_blocks, self.band_rows,
                 self.bands, self.max_nb))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def bm(self) -> int:
        return self.blocks.shape[1]

    @property
    def bk(self) -> int:
        return self.blocks.shape[2]

    @classmethod
    def from_csr(cls, csr: CSRMatrix, bm: int = 128, bk: int = 128,
                 band_rows: int = 2048) -> "DeviceBSRCol":
        bsr = csr_to_bsr(csr, bm=bm, bk=bk)
        R = min(band_rows, _round_up(max(csr.m, bm), bm))
        if R % bm:
            raise ValueError(f"band_rows {R} must be a multiple of bm {bm}")
        rows_per_band = R // bm
        brows = np.repeat(np.arange(bsr.mb, dtype=np.int64),
                          np.diff(bsr.block_row_ptr))
        bcols = bsr.block_col_idx.astype(np.int64)
        band_of = brows // rows_per_band
        bands = max(int(band_of.max(initial=0)) + 1, -(-bsr.mb // rows_per_band), 1)
        # sort by (band, col, row): column-major within each band
        order = np.lexsort((brows, bcols, band_of))
        counts = np.bincount(band_of, minlength=bands)
        max_nb = max(int(counts.max(initial=1)), 1)

        lrows = np.full(bands * max_nb, rows_per_band, dtype=np.int32)
        cols = np.zeros(bands * max_nb, dtype=np.int32)
        blocks = np.zeros((bands * max_nb, bm, bk), dtype=csr.values.dtype)
        starts = np.concatenate([[0], np.cumsum(counts)])
        for band in range(bands):
            s, e = starts[band], starts[band + 1]
            sl = order[s:e]
            o = band * max_nb
            lrows[o:o + (e - s)] = (brows[sl] % rows_per_band).astype(np.int32)
            cols[o:o + (e - s)] = bcols[sl].astype(np.int32)
            blocks[o:o + (e - s)] = bsr.blocks[sl]
            if e > s:  # pad slots repeat the last real column: no extra DMA
                cols[o + (e - s): o + max_nb] = int(bcols[sl[-1]])
        return cls(
            local_rows=jnp.asarray(lrows),
            block_cols=jnp.asarray(cols),
            blocks=jnp.asarray(blocks),
            shape=csr.shape,
            nnz=csr.nnz,
            num_blocks=bsr.num_blocks,
            band_rows=R,
            bands=bands,
            max_nb=max_nb,
        )


def _kernel(lrows_ref, cols_ref, block_ref, x_ref, out_ref, *, max_nb, bm):
    band = pl.program_id(0)
    b = pl.program_id(2)

    @pl.when(b == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    r = lrows_ref[band * max_nb + b]
    acc = jnp.dot(block_ref[0], x_ref[:], preferred_element_type=jnp.float32)
    win = (pl.ds(r * bm, bm), slice(None))
    out_ref[win] += acc


@functools.partial(jax.jit, static_argnames=("aux", "n_tile", "interpret"))
def _bsr_spmm_cstat(local_rows, block_cols, blocks, x, *, aux, n_tile,
                    interpret):
    (m, _k), bands, max_nb, R = aux
    _, bm, bk = blocks.shape
    k, n = x.shape
    n_pad = _round_up(n, n_tile)
    k_pad = _round_up(k, bk)
    if n_pad != n or k_pad != k:
        x = jnp.pad(x, ((0, k_pad - k), (0, n_pad - n)))
    num_n_tiles = n_pad // n_tile
    slab = R + bm                       # + sacrificial pad-row window

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bands, num_n_tiles, max_nb),
        in_specs=[
            pl.BlockSpec(
                (1, bm, bk),
                lambda band, nt, b, lrows, cols: (band * max_nb + b, 0, 0),
            ),
            pl.BlockSpec(
                (bk, n_tile),
                lambda band, nt, b, lrows, cols: (cols[band * max_nb + b], nt),
            ),
        ],
        out_specs=pl.BlockSpec(
            (slab, n_tile),
            lambda band, nt, b, lrows, cols: (band, nt),
        ),
    )

    out = pl.pallas_call(
        _kernel_bound(max_nb, bm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bands * slab, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * blocks.shape[0] * bm * bk * n_pad,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + k_pad * n_pad * x.dtype.itemsize * bands
            + bands * slab * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(local_rows, block_cols, blocks, x)
    out = out.reshape(bands, slab, n_pad)[:, :R].reshape(bands * R, n_pad)
    return out[:m, :n].astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _kernel_bound(max_nb: int, bm: int):
    return functools.partial(_kernel, max_nb=max_nb, bm=bm)


def bsr_spmm_cstat(a: DeviceBSRCol, x: jax.Array, *, n_tile: int = 512,
                   interpret: bool | None = None) -> jax.Array:
    """Y = A @ X, C-stationary band-resident variant (see module doc)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_tile = min(n_tile, _round_up(x.shape[1], 128))
    aux = (a.shape, a.bands, a.max_nb, a.band_rows)
    return _bsr_spmm_cstat(a.local_rows, a.block_cols, a.blocks, x,
                           aux=aux, n_tile=n_tile, interpret=interpret)
