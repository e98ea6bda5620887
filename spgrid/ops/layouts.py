"""Device-resident sparse layouts (static-shape jnp arrays) built from host
formats.

TPU kernels need static shapes; every layout here pads to hardware-friendly
multiples and carries the true nnz for flop accounting (the reference counts
flops on the original CSR nnz regardless of format, spmv_bench.cpp:404-408).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spgrid.formats.csr import CSRMatrix
from spgrid.formats.ell import csr_to_ell
from spgrid.formats.bsr import csr_to_bsr
from spgrid.formats.sell import csr_to_sell


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceCOO:
    """Sorted COO on device — for segment-sum SpMV/SpMM baselines."""

    rows: jax.Array      # (nnz_pad,) int32, padded with m (out-of-range)
    cols: jax.Array      # (nnz_pad,) int32, padded with 0
    values: jax.Array    # (nnz_pad,) dtype, padded with 0
    shape: Tuple[int, int]
    nnz: int

    def tree_flatten(self):
        return (self.rows, self.cols, self.values), (self.shape, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_csr(cls, csr: CSRMatrix, pad_multiple: int = 128) -> "DeviceCOO":
        nnz_pad = _round_up(max(csr.nnz, 1), pad_multiple)
        rows = np.full(nnz_pad, csr.m, dtype=np.int32)
        cols = np.zeros(nnz_pad, dtype=np.int32)
        vals = np.zeros(nnz_pad, dtype=csr.values.dtype)
        rows[: csr.nnz] = np.repeat(np.arange(csr.m, dtype=np.int32), csr.degrees)
        cols[: csr.nnz] = csr.col_idx
        vals[: csr.nnz] = csr.values
        return cls(jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
                   csr.shape, csr.nnz)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceELL:
    """Padded ELL on device: (m_pad, w) cols/vals. Pad cols point at 0 with
    value 0, so they contribute nothing."""

    cols: jax.Array      # (m_pad, w) int32
    values: jax.Array    # (m_pad, w) dtype
    shape: Tuple[int, int]
    nnz: int

    def tree_flatten(self):
        return (self.cols, self.values), (self.shape, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_csr(cls, csr: CSRMatrix, row_multiple: int = 8,
                 width_multiple: int = 8) -> "DeviceELL":
        ell = csr_to_ell(csr, pad_multiple=width_multiple)
        m_pad = _round_up(csr.m, row_multiple)
        cols = np.zeros((m_pad, ell.width), dtype=np.int32)
        vals = np.zeros((m_pad, ell.width), dtype=csr.values.dtype)
        cols[: csr.m] = ell.cols
        vals[: csr.m] = ell.values
        return cls(jnp.asarray(cols), jnp.asarray(vals), csr.shape, csr.nnz)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceBSR:
    """Flattened block-sparse rows on device, sorted by block row.

    ``block_rows[b]``/``block_cols[b]`` give the block-grid coordinates of
    dense block ``blocks[b]`` (bm, bk).  ``row_starts`` is true
    block_row_ptr.  Padding blocks (to ``pad_multiple``) carry row = mb
    (one past the last block row), col = 0, values = 0; kernels mask them.
    """

    block_rows: jax.Array   # (nb_pad,) int32
    block_cols: jax.Array   # (nb_pad,) int32
    row_starts: jax.Array   # (mb+1,) int32
    blocks: jax.Array       # (nb_pad, bm, bk)
    shape: Tuple[int, int]  # logical (m, k)
    nnz: int
    num_blocks: int         # true block count

    def tree_flatten(self):
        return ((self.block_rows, self.block_cols, self.row_starts, self.blocks),
                (self.shape, self.nnz, self.num_blocks))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def bm(self) -> int:
        return self.blocks.shape[1]

    @property
    def bk(self) -> int:
        return self.blocks.shape[2]

    @property
    def mb(self) -> int:
        return len(self.row_starts) - 1

    @classmethod
    def from_csr(cls, csr: CSRMatrix, bm: int = 8, bk: int = 128,
                 pad_multiple: int = 1) -> "DeviceBSR":
        bsr = csr_to_bsr(csr, bm=bm, bk=bk)
        nb = bsr.num_blocks
        nb_pad = _round_up(max(nb, 1), pad_multiple)
        rows = np.full(nb_pad, bsr.mb, dtype=np.int32)
        cols = np.zeros(nb_pad, dtype=np.int32)
        blocks = np.zeros((nb_pad, bm, bk), dtype=csr.values.dtype)
        rows[:nb] = np.repeat(np.arange(bsr.mb, dtype=np.int32),
                              np.diff(bsr.block_row_ptr))
        cols[:nb] = bsr.block_col_idx
        blocks[:nb] = bsr.blocks
        return cls(
            block_rows=jnp.asarray(rows),
            block_cols=jnp.asarray(cols),
            row_starts=jnp.asarray(bsr.block_row_ptr, dtype=jnp.int32),
            blocks=jnp.asarray(blocks),
            shape=csr.shape,
            nnz=csr.nnz,
            num_blocks=nb,
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceSELL:
    """SELL-C-sigma on device: per width-bucket padded arrays + permutation."""

    perm: jax.Array                 # (m_pad,) int32 original row of slot i
    bucket_cols: tuple              # tuple of (s, C, w) int32
    bucket_vals: tuple              # tuple of (s, C, w) dtype
    bucket_slice_rows: tuple        # tuple of (s,) int32 first slot of slice
    shape: Tuple[int, int]
    nnz: int
    C: int

    def tree_flatten(self):
        return ((self.perm, self.bucket_cols, self.bucket_vals,
                 self.bucket_slice_rows),
                (self.shape, self.nnz, self.C))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_csr(cls, csr: CSRMatrix, C: int = 8, sigma: int = 256) -> "DeviceSELL":
        sell = csr_to_sell(csr, C=C, sigma=sigma)
        m_pad = _round_up(csr.m, C)
        # Padding slots get unique out-of-range rows (m..m_pad-1) so the
        # un-permute scatter never collides with real rows.
        perm = np.arange(m_pad, dtype=np.int32)
        perm[: csr.m] = sell.perm
        return cls(
            perm=jnp.asarray(perm),
            bucket_cols=tuple(jnp.asarray(b.cols) for b in sell.buckets),
            bucket_vals=tuple(jnp.asarray(b.values) for b in sell.buckets),
            bucket_slice_rows=tuple(jnp.asarray(b.slice_rows) for b in sell.buckets),
            shape=csr.shape,
            nnz=csr.nnz,
            C=C,
        )
