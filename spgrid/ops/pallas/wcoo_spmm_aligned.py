"""Pallas TPU kernel: aligned-slot hypersparse SpMM, window-sorted.

Successor to the one-hot WCOO SpMM (wcoo_spmm.py), removing its two
bottlenecks, both measured on v5e:

1. the one-hot MXU segmented reduction does 2*ns*W flops per useful slot
   (a 128x flop inflation) — here slot LANE position already equals the
   target row within a 128-row block (spgrid.formats.wcoo
   csr_to_wcoo_aligned), so the reduction is 8 broadcast-FMAs per group,
   pure VPU;
2. the X window was re-DMA'd per chunk (64KB x chunks x n_tiles) — here
   groups are sorted by superwindow inside each row band, every grid step
   consumes a fixed count of same-window groups, and the (ns, 1024)
   superwindow tile is revisit-cached by Pallas, so X traffic collapses to
   (distinct windows per band) tiles; the output slab for the whole band
   stays RESIDENT in VMEM (the band/C-stationary idea of bsr_spmm_cstat).

Per grid step (n_tile, band, s): G_STEP groups x 8 sublane windows, each a
(ns,128) lane shuffle + FMA, accumulated into one dynamic 128-row block of
the resident band slab.

Group padding: window runs are padded to a G_STEP multiple and bands to the
max band length with groups that keep the current window (index 0 for band
padding), zero values, and the sacrificial row block mbb.
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
from spgrid.formats.wcoo import csr_to_wcoo_aligned, LANE

G_STEP = 16          # groups per grid step (unrolled in the kernel)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceWCOOBands:
    """Band-partitioned, window-sorted aligned slot groups."""

    cols: jax.Array      # (T*8, LANE) int32  col % 128 per slot
    values: jax.Array    # (T*8, LANE)        0 for empty slots
    g_sw: jax.Array      # (steps,) int32  superwindow of each step's groups
    g_lb: jax.Array      # (steps, G_STEP) int32  row block local to band;
                         #                        pad -> mbb
    shape: Tuple[int, int]
    nnz: int
    utilization: float
    bands: int
    mbb: int             # 128-row blocks per band
    steps_per_band: int  # T == bands * steps_per_band * G_STEP
    name: str

    def tree_flatten(self):
        return ((self.cols, self.values, self.g_sw, self.g_lb),
                (self.shape, self.nnz, self.utilization, self.bands,
                 self.mbb, self.steps_per_band, self.name))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_csr(cls, csr: CSRMatrix,
                 band_rows: int = 4096) -> "DeviceWCOOBands":
        m, k = csr.shape
        R = min(band_rows, _round_up(max(m, LANE), LANE))
        mbb = R // LANE
        cols_a, vals_a, g_sw, g_sub, G, util = csr_to_wcoo_aligned(csr)
        band = g_sub // mbb
        bands = max(-(-(-(-m // LANE)) // mbb), int(band.max(initial=0)) + 1, 1)
        lb = g_sub - band * mbb
        # sort groups by (band, window, block): window runs become
        # consecutive so the superwindow tile is revisit-cached
        order = np.lexsort((g_sub, g_sw, band))
        band, sw, lb = band[order], g_sw[order], lb[order]
        cols_a, vals_a = cols_a[order], vals_a[order]

        # pad every (band, window) run to a G_STEP multiple, then every
        # band to the max padded band length
        run_id = np.zeros(G, dtype=np.int64)
        if G > 1:
            run_id[1:] = np.cumsum((band[1:] != band[:-1])
                                   | (sw[1:] != sw[:-1]))
        run_len = np.bincount(run_id)
        run_pad = (-run_len) % G_STEP
        band_len = np.zeros(bands, dtype=np.int64)
        np.add.at(band_len, band[np.unique(run_id, return_index=True)[1]],
                  run_len + run_pad)
        gb_max = _round_up(max(int(band_len.max(initial=0)), G_STEP), G_STEP)
        steps_per_band = gb_max // G_STEP

        T = bands * gb_max
        out_cols = np.zeros((T, 8, LANE), np.int32)
        out_vals = np.zeros((T, 8, LANE), vals_a.dtype)
        out_sw = np.zeros(T, np.int32)
        out_lb = np.full(T, mbb, np.int32)       # sacrificial block
        # destination slot of each real group: band offset + within-band
        # position with run padding applied before it
        run_start_band = np.zeros(G, dtype=np.int64)     # run start in band
        pad_before = np.zeros(G, dtype=np.int64)
        pos_in_run = np.zeros(G, dtype=np.int64)
        first_of_run = np.ones(G, dtype=bool)
        if G > 1:
            first_of_run[1:] = run_id[1:] != run_id[:-1]
        run_starts = np.flatnonzero(first_of_run)
        cum_pad = np.concatenate([[0], np.cumsum(run_pad)])
        # pad accumulated within each band only
        run_band = band[run_starts]
        band_first_run = np.searchsorted(run_band, np.arange(bands), "left")
        pad_before_run = cum_pad[:-1] - cum_pad[
            band_first_run[run_band]]
        idx_in_band = np.arange(G) - np.concatenate(
            [[0], np.cumsum(np.bincount(band)[:-1])])[band]
        pos = idx_in_band + pad_before_run[run_id]
        dest = band * gb_max + pos
        out_cols[dest] = cols_a
        out_vals[dest] = vals_a
        out_sw[dest] = sw
        out_lb[dest] = lb
        # padding groups keep their run's window (so the index map never
        # forces a new DMA): forward-fill window ids
        filled = np.zeros(T, dtype=bool)
        filled[dest] = True
        for b in range(bands):
            seg = slice(b * gb_max, (b + 1) * gb_max)
            swseg = out_sw[seg]
            fseg = filled[seg]
            if fseg.any():
                idxs = np.where(fseg, np.arange(gb_max), 0)
                np.maximum.accumulate(idxs, out=idxs)
                out_sw[seg] = swseg[idxs]
        # one window id per STEP (all G_STEP groups of a step share it) —
        # scalar-prefetch SMEM is ~1MB, a per-group array overflows it on
        # ~100k-row matrices; lb rides as an (8, G_STEP) SMEM-blocked input
        step_sw = out_sw.reshape(-1, G_STEP)[:, 0].copy()
        lb2 = out_lb.reshape(-1, G_STEP)
        pad8 = (-lb2.shape[0]) % 8
        if pad8:
            lb2 = np.concatenate(
                [lb2, np.full((pad8, G_STEP), mbb, np.int32)])
        return cls(
            # int8 stream: col % 128 < 128; slot DMA dominates at low
            # utilization (same finding as wcoo_spmv)
            cols=jnp.asarray(out_cols.reshape(-1, LANE).astype(np.int8)),
            values=jnp.asarray(out_vals.reshape(-1, LANE)),
            g_sw=jnp.asarray(step_sw),
            g_lb=jnp.asarray(lb2),
            shape=csr.shape,
            nnz=csr.nnz,
            utilization=util,
            bands=bands,
            mbb=mbb,
            steps_per_band=steps_per_band,
            name=csr.name,
        )

    @property
    def mem_footprint(self) -> int:
        return self.cols.size * self.cols.dtype.itemsize \
            + self.values.size * self.values.dtype.itemsize


def _make_kernel(mbb: int, ns: int):
    def _kernel(gsw_ref, lb_ref, cols_ref, vals_ref, xt_ref, out_ref):
        band = pl.program_id(1)
        s = pl.program_id(2)
        spb = pl.num_programs(2)
        lbrow = (band * spb + s) % 8

        @pl.when(s == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for g in range(G_STEP):
            lb = lb_ref[lbrow, g]
            acc = jnp.zeros((ns, LANE), jnp.float32)
            for srow in range(8):
                r = g * 8 + srow
                src = xt_ref[:, srow * LANE:(srow + 1) * LANE]   # (ns, 128)
                idx = jnp.broadcast_to(
                    cols_ref[pl.ds(r, 1), :].astype(jnp.int32), (ns, LANE))
                gat = jnp.take_along_axis(src, idx, axis=1)
                acc += gat * vals_ref[pl.ds(r, 1), :]
            out_ref[0, 0, lb] += acc
    return _kernel


@functools.partial(jax.jit, static_argnames=("aux", "ns", "interpret"))
def _spmm(g_sw, g_lb, cols, vals, xt, *, aux, ns, interpret):
    (m, _k), bands, mbb, spb = aux
    n_pad, k_pad = xt.shape
    ntiles = n_pad // ns

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles, bands, spb),
        in_specs=[
            pl.BlockSpec(
                (8, G_STEP),
                lambda nt, band, s, sw: ((band * spb + s) // 8, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (G_STEP * 8, LANE),
                lambda nt, band, s, sw: ((band * spb + s), 0),
            ),
            pl.BlockSpec(
                (G_STEP * 8, LANE),
                lambda nt, band, s, sw: ((band * spb + s), 0),
            ),
            pl.BlockSpec(
                (ns, 8 * LANE),
                lambda nt, band, s, sw: (nt, sw[band * spb + s]),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, mbb + 1, ns, LANE),
            lambda nt, band, s, sw: (nt, band, 0, 0, 0),
        ),
    )
    out = pl.pallas_call(
        _make_kernel(mbb, ns),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (ntiles, bands, mbb + 1, ns, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * ntiles * cols.shape[0] * LANE * ns // 8,
            bytes_accessed=cols.size * 5 * ntiles
            + bands * ntiles * k_pad * ns * 4 // 8
            + ntiles * bands * mbb * ns * LANE * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(g_sw, g_lb, cols, vals, xt)  # g_sw scalar-prefetch; g_lb SMEM-blocked
    # out[nt, band, lb, srow, lane] = Y[(band*mbb+lb)*128 + lane, nt*ns + srow]
    y = out[:, :, :mbb].transpose(1, 2, 4, 0, 3)
    return y.reshape(bands * mbb * LANE, n_pad)[:m]


def wcoo_spmm_aligned(a: DeviceWCOOBands, x: jax.Array,
                      interpret: bool | None = None) -> jax.Array:
    """Y = A @ X for hypersparse A (see module doc). X (k, n) -> (m, n)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    k, n = x.shape
    ns = min(LANE, _round_up(n, 8))
    n_pad = _round_up(n, ns)
    k_pad = _round_up(max(k, 8 * LANE), 8 * LANE)
    xt = jnp.zeros((n_pad, k_pad), x.dtype)
    xt = jax.lax.dynamic_update_slice(xt, x.T, (0, 0))
    aux = (a.shape, a.bands, a.mbb, a.steps_per_band)
    y = _spmm(a.g_sw, a.g_lb, a.cols, a.values, xt, aux=aux, ns=ns,
              interpret=interpret)[:, :n].astype(x.dtype)
    return y[:, 0] if squeeze else y
