"""Pallas TPU kernel: fused aligned-slot SpMV (y = A @ x, x vector).

The speed-of-light SpMV design for this hardware, built on three measured
facts (see spgrid.formats.wcoo): scalar gather/scatter are ~1000x off
roofline; the only fast gather is the 128-lane same-shape shuffle; Pallas
grid steps carry ~300ns fixed overhead so work must be batched per step.

  - x lives ENTIRELY in VMEM as x2 (k/128, 128) — for k up to ~20M f32 the
    whole vector fits, so there is NO x traffic during the sweep.
  - y lives entirely in VMEM as y2 (m/128, 128), accumulated in place.
  - A is streamed as aligned slot groups (8, 128): sublane = window within
    the group's 1024-column superwindow, lane = target row within the
    group's 128-row subblock (spgrid.formats.wcoo.csr_to_wcoo_aligned).
    One lane shuffle gathers all 1024 slots' x values; the reduction is a
    sublane sum (lane position == target row); the result accumulates into
    one dynamic row of y2.
  - The grid is over superblocks of GROUPS_PER_STEP groups; slot data is
    DMA'd per superblock by the Pallas pipeline while the inner loop runs.

Per-nnz streamed bytes = 8 / utilization (int32 col + value per slot);
utilization ~0.5 for banded matrices, lower for scattered ones (the
structure-performance coupling the reference methodology studies).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spgrid.formats.wcoo import csr_to_wcoo_aligned, LANE

GROUPS_PER_STEP = 256    # fully unrolled; measured 283us@64 -> 225us@256


def _kernel(gsw_ref, gsub_ref, cols_ref, vals_ref, x2_ref, y2_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        y2_ref[:] = jnp.zeros_like(y2_ref)

    def body(g, _):
        gi = b * GROUPS_PER_STEP + g
        sw = gsw_ref[gi]
        sr = gsub_ref[gi]
        src = x2_ref[pl.ds(sw * 8, 8), :]               # (8, 128) VMEM slice
        # cols stream as int8 (col % 128 < 128): the slot DMA is the
        # kernel's bottleneck at low utilization (empty-body ablation ==
        # full kernel time), so every streamed byte counts (222 -> 187us)
        idx = cols_ref[pl.ds(g * 8, 8), :].astype(jnp.int32)
        v = vals_ref[pl.ds(g * 8, 8), :]
        p = jnp.take_along_axis(src, idx, axis=1) * v   # lane shuffle + FMA
        contrib = jnp.sum(p, axis=0, keepdims=True)     # sublane reduce
        y2_ref[pl.ds(sr, 1), :] += contrib
        return 0

    # Full unroll: Mosaic's rolled scf.for carries ~410ns/iteration of loop
    # overhead, 6.8x the body's cost (measured 1924us -> 283us at 100k^2,
    # 20 nnz/row).  Mosaic only supports unroll=1 or full unroll.
    jax.lax.fori_loop(0, GROUPS_PER_STEP, body, 0, unroll=GROUPS_PER_STEP)


@functools.partial(jax.jit, static_argnames=("m2", "interpret"))
def _spmv(g_sw, g_sub, cols, vals, x2, *, m2, interpret):
    gp = cols.shape[0] // (8 * GROUPS_PER_STEP)
    k2 = x2.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gp,),
        in_specs=[
            pl.BlockSpec((8 * GROUPS_PER_STEP, LANE),
                         lambda b, sw, sub: (b, 0)),
            pl.BlockSpec((8 * GROUPS_PER_STEP, LANE),
                         lambda b, sw, sub: (b, 0)),
            pl.BlockSpec((k2, LANE), lambda b, sw, sub: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m2, LANE), lambda b, sw, sub: (0, 0)),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m2, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * cols.size,
            bytes_accessed=cols.size * 5 + (k2 + m2) * LANE * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(g_sw, g_sub, cols, vals, x2)


@jax.tree_util.register_pytree_node_class
class DeviceWCOOAligned:
    """Device-resident aligned slot groups for the fused SpMV."""

    def tree_flatten(self):
        children = (self.cols, self.values, self.g_sw, self.g_sub)
        aux = (self.shape, self.nnz, self.utilization, self.num_groups,
               self.name)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.cols, obj.values, obj.g_sw, obj.g_sub = children
        (obj.shape, obj.nnz, obj.utilization, obj.num_groups,
         obj.name) = aux
        return obj

    def __init__(self, csr, dtype=None):
        cols, vals, g_sw, g_sub, G, util = csr_to_wcoo_aligned(csr)
        # pad groups to a multiple of GROUPS_PER_STEP; padding groups hit
        # superwindow 0 / subrow 0 with zero values.
        pad = (-G) % GROUPS_PER_STEP
        if pad:
            cols = np.concatenate([cols, np.zeros((pad, 8, LANE), np.int32)])
            vals = np.concatenate([vals, np.zeros((pad, 8, LANE), vals.dtype)])
            g_sw = np.concatenate([g_sw, np.zeros(pad, np.int32)])
            g_sub = np.concatenate([g_sub, np.zeros(pad, np.int32)])
        self.cols = jnp.asarray(cols.reshape(-1, LANE).astype(np.int8))
        self.values = jnp.asarray(vals.reshape(-1, LANE))
        self.g_sw = jnp.asarray(g_sw)
        self.g_sub = jnp.asarray(g_sub)
        self.shape = csr.shape
        self.nnz = csr.nnz
        self.utilization = util
        self.num_groups = G
        self.name = csr.name

    @classmethod
    def from_csr(cls, csr) -> "DeviceWCOOAligned":
        return cls(csr)

    @property
    def mem_footprint(self) -> int:
        return (self.cols.size * self.cols.dtype.itemsize
                + self.values.size * self.values.dtype.itemsize)


def wcoo_spmv(a: DeviceWCOOAligned, x: jax.Array,
              interpret: bool | None = None) -> jax.Array:
    """y = A @ x with the fused aligned kernel; x (k,), returns (m,)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = a.shape[1]
    m = a.shape[0]
    k2 = -(-k // LANE)
    # superwindow padding: x2 sublanes must reach 8*max(sw)+8
    k2 = max(k2, -(-k2 // 8) * 8)
    x2 = jnp.zeros((k2 * LANE,), x.dtype).at[:k].set(x).reshape(k2, LANE)
    m2 = max(-(-m // LANE), 1)
    y2 = _spmv(a.g_sw, a.g_sub, a.cols, a.values, x2, m2=m2,
               interpret=interpret)
    return y2.reshape(-1)[:m].astype(x.dtype)
