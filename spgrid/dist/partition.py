"""nnz-balanced block-row partitioning of a BSR matrix across shards.

The distributed analogue of ``loop_partitioner_balance_prefix_sums``
(parallel_util.h:141-165): shard boundaries land on block rows so each
device receives ~equal stored blocks; per-shard arrays are padded to a
common static shape (sacrificial blocks with local row = mb_local) and
stacked on a leading device axis for ``shard_map``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spgrid.formats.bsr import BSRMatrix, csr_to_bsr
from spgrid.formats.csr import CSRMatrix
from spgrid.formats.partition import balance_prefix_sums


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedBSR:
    """Stacked per-shard BSR arrays; leading axis = shard index.

    Every shard covers ``rows_per_shard`` logical rows (equal static output
    shard); block rows are *local* to the shard.  ``nnz`` is the true global
    nnz for flop accounting."""

    block_rows: jax.Array     # (S, nbs) int32, local block-row ids
    block_cols: jax.Array     # (S, nbs) int32, global block-col ids
    blocks: jax.Array         # (S, nbs, bm, bk)
    shape: Tuple[int, int]
    rows_per_shard: int       # logical rows per shard (multiple of bm)
    nnz: int

    def tree_flatten(self):
        return ((self.block_rows, self.block_cols, self.blocks),
                (self.shape, self.rows_per_shard, self.nnz))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def num_shards(self) -> int:
        return self.blocks.shape[0]

    @property
    def bm(self) -> int:
        return self.blocks.shape[2]

    @property
    def bk(self) -> int:
        return self.blocks.shape[3]


def partition_bsr(csr: CSRMatrix, num_shards: int, bm: int = 8,
                  bk: int = 128) -> ShardedBSR:
    """Build the stacked shard arrays from a host CSR.

    Shards are *contiguous equal row ranges* (static output shapes demand
    equal rows/shard); the nnz imbalance that motivates the reference's
    prefix-sum balancer shows up instead as per-shard padding, reported by
    the caller via ``block fill``.  A future variant can permute rows by the
    balancer before sharding (sigma-sort style) to equalize blocks.
    """
    bsr = csr_to_bsr(csr, bm=bm, bk=bk)
    mb = bsr.mb
    mb_per_shard = -(-mb // num_shards)
    rows_per_shard = mb_per_shard * bm

    brp = bsr.block_row_ptr
    counts = []
    ranges = []
    for s in range(num_shards):
        b0 = min(s * mb_per_shard, mb)
        b1 = min(b0 + mb_per_shard, mb)
        lo, hi = int(brp[b0]), int(brp[b1])
        counts.append(hi - lo)
        ranges.append((b0, b1, lo, hi))
    nbs = max(max(counts), 1)

    S = num_shards
    rows = np.full((S, nbs), mb_per_shard, dtype=np.int32)  # sacrificial
    cols = np.zeros((S, nbs), dtype=np.int32)
    blocks = np.zeros((S, nbs, bm, bk), dtype=csr.values.dtype)
    brows_global = np.repeat(np.arange(mb, dtype=np.int32), np.diff(brp))
    for s, (b0, b1, lo, hi) in enumerate(ranges):
        c = hi - lo
        rows[s, :c] = brows_global[lo:hi] - b0
        cols[s, :c] = bsr.block_col_idx[lo:hi]
        blocks[s, :c] = bsr.blocks[lo:hi]

    return ShardedBSR(
        block_rows=jnp.asarray(rows),
        block_cols=jnp.asarray(cols),
        blocks=jnp.asarray(blocks),
        shape=csr.shape,
        rows_per_shard=rows_per_shard,
        nnz=csr.nnz,
    )
