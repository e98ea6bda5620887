"""Pallas TPU kernel: block-sparse SDDMM (masked Q @ K^T).

The reference computes SDDMM one masked element at a time
(``sddmm_taco_naive.cpp:98-140``: ``B[p] += O[m,:]·D[k,:]; B[p] *= A[p]``).
On TPU the mask is stored block-sparse (DeviceBSR over the mask) and each
nonzero (bm x bk) mask block becomes one MXU matmul:

  out_block[b] = mask_block[b] ⊙ (Q[block_row[b]] @ K[block_col[b]]^T)

Q and K row-panels are DMA'd by scalar-prefetched block coordinates; the
contraction (head/width) dimension is tiled with accumulation so large d
stays within VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spgrid.ops.layouts import DeviceBSR


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(rows_ref, cols_ref, mask_ref, q_ref, kt_ref, out_ref):
    # kt is K^T, so the step is a native (bm, dt) @ (dt, bk) MXU matmul —
    # contracting dim 1 of both operands instead would force a per-step
    # K-tile transpose relayout (measured 8x slower).
    dt = pl.program_id(1)

    @pl.when(dt == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc = jnp.dot(q_ref[:], kt_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] += acc[None]

    @pl.when(dt == pl.num_programs(1) - 1)
    def _():
        out_ref[:] *= mask_ref[:].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("d_tile", "interpret"))
def _bsr_sddmm(block_rows, block_cols, mask_blocks, q, k, *, d_tile, interpret):
    nb, bm, bk = mask_blocks.shape
    mq, d = q.shape
    mk, _ = k.shape
    d_pad = _round_up(d, d_tile)
    mq_pad = _round_up(mq, bm) + bm      # +1 sacrificial row-panel for padding
    mk_pad = _round_up(mk, bk)
    q = jnp.pad(q, ((0, mq_pad - mq), (0, d_pad - d)))
    kt = jnp.pad(k, ((0, mk_pad - mk), (0, d_pad - d))).T  # (d_pad, mk_pad)
    num_d_tiles = d_pad // d_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, num_d_tiles),
        in_specs=[
            pl.BlockSpec((1, bm, bk), lambda b, dt, rows, cols: (b, 0, 0)),
            pl.BlockSpec((bm, d_tile), lambda b, dt, rows, cols: (rows[b], dt)),
            pl.BlockSpec((d_tile, bk), lambda b, dt, rows, cols: (dt, cols[b])),
        ],
        out_specs=pl.BlockSpec(
            (1, bm, bk), lambda b, dt, rows, cols: (b, 0, 0)
        ),
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, bm, bk), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * bm * bk * d_pad,
            bytes_accessed=mask_blocks.size * mask_blocks.dtype.itemsize
            + nb * (bm + bk) * d_pad * q.dtype.itemsize
            + nb * bm * bk * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(block_rows, block_cols, mask_blocks, q, kt)
    return out.astype(q.dtype)


def bsr_sddmm(mask: DeviceBSR, q: jax.Array, k: jax.Array, *,
              d_tile: int = 256, interpret: bool | None = None) -> jax.Array:
    """Block values of mask ⊙ (Q @ K^T); output aligned with mask.blocks.

    Padding mask blocks (block_row = mb) read the sacrificial zero panel of
    Q and produce zero blocks.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d_tile = min(d_tile, _round_up(q.shape[1], 128))
    return _bsr_sddmm(mask.block_rows, mask.block_cols, mask.blocks, q, k,
                      d_tile=d_tile, interpret=interpret)
