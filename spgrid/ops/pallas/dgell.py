"""Pallas TPU kernel: DMA-gather ELL SpMM for scattered hypersparse.

Re-designs the regime the reference covers with MKL inspector-executor
CSR SpMM (benchmark_code/CPU/AMD/spmv_code_bench/spmm_kernel_mkl_ie.cpp:
75-104; 105-328 GFLOPS on amd-64/n=512/mkl_ie_f.csv:2-3) — scattered
column structure on matrices whose dense operand far exceeds VMEM.

Why another scattered kernel (vs gell / scoo):
- gell's XLA row gather falls off a measured ~5x rate cliff once its
  source exceeds ~64MB, and scattered structure cannot be windowed
  under the cliff (the round-3/4 rows: 17-33 GFLOPS for every variant
  on the scat_393k/524k twins, ~8% of the HBM gather ceiling).
- scoo re-sorts by column window so each gather source is small, but
  pays a sorted scatter-add combine that measured below gell.
- Here each nnz's X row is fetched by an explicit per-row HBM->VMEM
  async copy (2KB at n=512): the lower bound is pure random-access HBM
  bandwidth, not XLA's gather implementation.  rb*S copies are in
  flight per grid step (default 256, the concurrency the
  exp_pallas_gather probe measures).

Layout: plain ELL slots (rows padded to ``slots``; heavier rows spill
to a COO tail combined on the XLA side), cols SMEM-blocked per step,
values VMEM-blocked, X left in ANY (HBM).

ROUND-4 STATUS — BLOCKED BY THE TOOLCHAIN, kept for the record: every
TPU compile of this kernel (full fan-out AND the bounded-wave variant)
crashes the remote Mosaic compile helper (HTTP 500, tpu_compile_helper
exit 1), as does the MINIMAL per-row dynamic-offset DMA pattern in
scripts/exp_pallas_gather.py at both G=64 and G=256 — the construct
itself, not its size, is what the toolchain rejects.  Quarantined from
the measurement grid (.newkernel_crashes).  The class analysis moved
on: exp_colchunk_gather.py measured XLA's big-source gather at 240GB/s
round-trip (58.7 Mrow/s on 2KB rows from a 1GB source), so the r3
"64MB cliff" does not bind at study scale and the scattered class is
bound by the gather intermediate round-trip, not the gather rate.
Interpret-mode tests keep the kernel logic alive for a future
toolchain that accepts the DMA pattern.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spgrid.formats.csr import CSRMatrix


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceDGELL:
    """ELL slots + COO tail, blocked for the DMA-gather kernel."""

    cols: jax.Array      # (nb8, rb*S) int32  per-step slot cols, slot-major
    values: jax.Array    # (nb*rb, 128) f32  lane-padded, 0 beyond slots
    tail_rows: jax.Array  # (t,) int32
    tail_cols: jax.Array  # (t,) int32
    tail_vals: jax.Array  # (t,) f32
    shape: Tuple[int, int]
    nnz: int
    slots: int
    rb: int
    name: str

    def tree_flatten(self):
        return ((self.cols, self.values, self.tail_rows, self.tail_cols,
                 self.tail_vals),
                (self.shape, self.nnz, self.slots, self.rb, self.name))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_csr(cls, csr: CSRMatrix, slots: int | None = None,
                 rb: int = 16) -> "DeviceDGELL":
        m, k = csr.shape
        deg = csr.degrees
        if slots is None:
            avg = csr.nnz / max(m, 1)
            slots = max(1, int(np.ceil(avg * 1.25)))
            if deg.size and int(deg.max()) <= slots + 2:
                slots = int(deg.max())
        slots = min(slots, 128)       # values block is lane-padded to 128
        # cap the per-step DMA fan-out (rb*S): bounds both the in-flight
        # copy count and the unrolled program size the Mosaic compiler
        # has to chew (r4: 224-copy steps crashed the remote compiler)
        while rb > 8 and rb * slots > 128:
            rb //= 2
        m_pad = -(-max(m, 1) // rb) * rb
        nb = m_pad // rb

        cols = np.zeros((m_pad, slots), dtype=np.int32)
        vals = np.zeros((m_pad, slots), dtype=np.float32)
        nnz_idx = np.arange(csr.nnz, dtype=np.int64)
        row_of = np.repeat(np.arange(m, dtype=np.int64), deg)
        within = nnz_idx - np.repeat(csr.row_ptr[:-1].astype(np.int64), deg)
        take = within < slots
        cols[row_of[take], within[take]] = \
            csr.col_idx[take].astype(np.int32)
        vals[row_of[take], within[take]] = csr.values[take]
        tail = ~take
        # SMEM blocking: 8 consecutive grid steps per block, one SMEM row
        # per step holding that step's rb*S flattened cols, SLOT-major
        # (j = s*rb + r) so each slot's rb gathered rows land in one
        # contiguous scratch slab (no in-kernel relayout)
        nb8 = -(-nb // 8) * 8
        cols_steps = np.zeros((nb8, rb * slots), dtype=np.int32)
        cols_steps[:nb] = cols.reshape(nb, rb, slots) \
            .transpose(0, 2, 1).reshape(nb, rb * slots)
        # lane-pad values to the native 128-lane tile: every working
        # Mosaic kernel in this repo feeds 128-lane blocks, and the (rb,S)
        # odd-lane block was the prime suspect in the remote-compiler
        # crash; the padding costs m_pad*128*4 bytes of HBM (64-512MB at
        # the grid's sizes) and nothing else
        vals128 = np.zeros((m_pad, 128), dtype=np.float32)
        vals128[:, :slots] = vals
        return cls(
            cols=jnp.asarray(cols_steps),
            values=jnp.asarray(vals128),
            tail_rows=jnp.asarray(row_of[tail].astype(np.int32)),
            tail_cols=jnp.asarray(csr.col_idx[tail].astype(np.int32)),
            tail_vals=jnp.asarray(csr.values[tail].astype(np.float32)),
            shape=csr.shape, nnz=csr.nnz, slots=slots, rb=rb,
            name=csr.name)

    @property
    def mem_footprint(self) -> int:
        return sum(l.size * l.dtype.itemsize for l in (
            self.cols, self.values, self.tail_rows, self.tail_cols,
            self.tail_vals))


def _kernel(cols_ref, vals_ref, x_ref, o_ref, scratch, sems, *, rb, S,
            wave):
    b = pl.program_id(0)
    brow = b % 8

    # Launch the rb*S row fetches in waves of `wave` copies sharing a
    # small semaphore array: the full-fan-out variant (one semaphore per
    # copy, 112+ sems live) crashed the Mosaic compiler (r4); waves keep
    # the copies fully unrolled (a rolled fori_loop costs ~410ns/iter,
    # unusable at ~100 copies/step) while bounding live semaphores.
    def _copy(j):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(cols_ref[brow, j], 1), :],
            scratch.at[pl.ds(j, 1), :],
            sems.at[j % wave],
        )

    total = rb * S
    for w0 in range(0, total, wave):
        wn = min(wave, total - w0)
        for j in range(w0, w0 + wn):
            _copy(j).start()
        for j in range(w0, w0 + wn):
            _copy(j).wait()

    # scratch rows [s*rb, (s+1)*rb) hold x[cols[:, s]] (slot-major):
    # reduce over slots on the VPU
    acc = vals_ref[:, 0][:, None] * scratch[pl.ds(0, rb), :]
    for s in range(1, S):
        acc += vals_ref[:, s][:, None] * scratch[pl.ds(s * rb, rb), :]
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("rb", "S", "wave",
                                             "interpret"))
def _dgell_call(cols, vals, x, *, rb, S, wave, interpret):
    nb = vals.shape[0] // rb
    n = x.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, rb * S), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, 128), lambda b: (b, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((rb, n), lambda b: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((rb * S, n), jnp.float32),
            pltpu.SemaphoreType.DMA((wave,)),
        ],
    )
    kernel = functools.partial(_kernel, rb=rb, S=S, wave=wave)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((vals.shape[0], n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(cols, vals, x)


def dgell_spmm(a: DeviceDGELL, x: jax.Array,
               interpret: bool | None = None) -> jax.Array:
    """SpMM via per-row DMA gathers; X stays in HBM."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, k = a.shape
    n = x.shape[1]
    xf = x.astype(jnp.float32)
    wave = int(os.environ.get("SPGRID_DGELL_WAVE", "16"))
    wave = max(1, min(wave, a.rb * a.slots))
    y = _dgell_call(a.cols, a.values, xf, rb=a.rb, S=a.slots, wave=wave,
                    interpret=interpret)[:m]
    if a.tail_rows.shape[0]:
        gt = jnp.take(xf, a.tail_cols, axis=0,
                      indices_are_sorted=False) * a.tail_vals[:, None]
        y = y.at[a.tail_rows].add(gt)
    return y.astype(x.dtype)
