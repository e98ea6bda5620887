"""Distributed sparse-attention pipeline over a (data, model) mesh.

Sharding layout (the "training step" shape of this framework):
  - X (k, n): columns sharded over ``data`` (pure DP — zero communication),
    replicated over ``model``.
  - W_K/W_Q/W_V and the mask: block rows sharded over ``model`` (TP/SP
    analogue — each device owns a contiguous row range of the sequence).
  - K/Q/V = W @ X: computed locally, rows live on their model shard.
  - SDDMM S = mask ⊙ (Q Kᵀ): Q rows are local; K is all-gathered over the
    model axis (ICI collective — the long-context halo of SURVEY §5).
  - Y = S @ V: V all-gathered likewise; output rows stay model-sharded.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from spgrid.formats.csr import CSRMatrix
from spgrid.dist.partition import ShardedBSR, partition_bsr
from spgrid.dist.spmm import _local_spmm
from spgrid.ops.pallas.sddmm import _bsr_sddmm


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DistSparseAttention:
    wk: ShardedBSR
    wq: ShardedBSR
    wv: ShardedBSR
    mask: ShardedBSR

    def tree_flatten(self):
        return (self.wk, self.wq, self.wv, self.mask), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_csr(cls, wk: CSRMatrix, wq: CSRMatrix, wv: CSRMatrix,
                 mask: CSRMatrix, num_shards: int, bm: int = 8,
                 bk: int = 128) -> "DistSparseAttention":
        return cls(
            wk=partition_bsr(wk, num_shards, bm=bm, bk=bk),
            wq=partition_bsr(wq, num_shards, bm=bm, bk=bk),
            wv=partition_bsr(wv, num_shards, bm=bm, bk=bk),
            mask=partition_bsr(mask, num_shards, bm=bm, bk=bk),
        )

    @property
    def flops_per_col(self) -> float:
        return 2.0 * (self.wk.nnz + self.wq.nnz + self.wv.nnz
                      + 2 * self.mask.nnz)


def _sddmm_local_xla(rows, cols, mask_blocks, q, k, mb_local):
    """Local-shard SDDMM: q rows local (block rows), k rows global
    (block cols). Batched einsum analogue of ops.attention._sddmm_bsr_xla."""
    nb, bm, bk = mask_blocks.shape
    mbq = mb_local + 1
    mbk = -(-k.shape[0] // bk)
    qp = jnp.pad(q, ((0, mbq * bm - q.shape[0]), (0, 0))).reshape(mbq, bm, -1)
    kp = jnp.pad(k, ((0, mbk * bk - k.shape[0]), (0, 0))).reshape(mbk, bk, -1)
    qg = jnp.take(qp, rows, axis=0, fill_value=0)
    kg = jnp.take(kp, cols, axis=0, fill_value=0)
    dots = jnp.einsum("bid,bjd->bij", qg, kg,
                      preferred_element_type=jnp.float32)
    return dots * mask_blocks.astype(jnp.float32)


def make_dist_pipeline_step(
    mesh: Mesh,
    attn: DistSparseAttention,
    *,
    model_axis: str = "model",
    data_axis: Optional[str] = "data",
    use_pallas: bool = False,
    interpret: Optional[bool] = None,
):
    """Jitted distributed pipeline step: x (k, n) -> y (m_padded, n)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    w_mb = attn.wk.rows_per_shard // attn.wk.bm
    w_m = attn.wk.rows_per_shard
    mk_mb = attn.mask.rows_per_shard // attn.mask.bm
    mk_m = attn.mask.rows_per_shard

    xcols = P(data_axis) if data_axis else P()
    wspec = (P(model_axis),) * 3

    def local_fn(wkr, wkc, wkb, wqr, wqc, wqb, wvr, wvc, wvb,
                 mr, mc, mb_, x):
        wkr, wkc, wkb = wkr[0], wkc[0], wkb[0]
        wqr, wqc, wqb = wqr[0], wqc[0], wqb[0]
        wvr, wvc, wvb = wvr[0], wvc[0], wvb[0]
        mr, mc, mb_blocks = mr[0], mc[0], mb_[0]

        k_loc = _local_spmm(wkr, wkc, wkb, x, w_mb, w_m, use_pallas, interpret)
        q_loc = _local_spmm(wqr, wqc, wqb, x, w_mb, w_m, use_pallas, interpret)
        v_loc = _local_spmm(wvr, wvc, wvb, x, w_mb, w_m, use_pallas, interpret)

        # ICI halo: sequence rows of K and V gathered across the model axis.
        k_full = jax.lax.all_gather(k_loc, model_axis, axis=0, tiled=True)
        v_full = jax.lax.all_gather(v_loc, model_axis, axis=0, tiled=True)

        if use_pallas:
            d_tile = min(256, -(-q_loc.shape[1] // 128) * 128)
            s_blocks = _bsr_sddmm(mr, mc, mb_blocks, q_loc, k_full,
                                  d_tile=d_tile, interpret=interpret)
        else:
            s_blocks = _sddmm_local_xla(mr, mc, mb_blocks, q_loc, k_full,
                                        mk_mb)
        if data_axis is not None:
            # The SDDMM contraction dim is the dense width n, which is
            # data-sharded: each data shard holds a partial dot — reduce
            # over ICI (row-parallel contraction, Megatron-style).
            s_blocks = jax.lax.psum(s_blocks, data_axis)
        s_blocks = s_blocks.astype(x.dtype)
        y_loc = _local_spmm(mr, mc, s_blocks, v_full, mk_mb, mk_m,
                            use_pallas, interpret)
        return y_loc

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(*wspec, *wspec, *wspec, *wspec, P(None, *xcols)),
        out_specs=P(model_axis, *xcols),
        check_vma=False,
    )

    @jax.jit
    def step(x):
        a = attn
        return fn(a.wk.block_rows, a.wk.block_cols, a.wk.blocks,
                  a.wq.block_rows, a.wq.block_cols, a.wq.blocks,
                  a.wv.block_rows, a.wv.block_cols, a.wv.blocks,
                  a.mask.block_rows, a.mask.block_cols, a.mask.blocks,
                  x)

    return step
