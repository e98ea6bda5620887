"""Pallas TPU kernel: vertical-panel block-sparse SpMM.

Both per-block BSR kernels (bsr_spmm.py, bsr_spmm_cstat.py) hit the
~300ns/grid-step floor when the block grid is dense: 4096^2 at 50% density
is 1024 steps ~= 335us regardless of traffic.  This kernel fattens the unit
of work to a vertical panel — all rows of a row *band* (R rows) for one
block-column (bk cols) — stored dense and skipped entirely when empty:

  step (band, n_tile, p):  out[R, nt] += panel[R, bk] @ x_tile[bk, nt]

One step is a (2048x128)@(128x512) MXU matmul (~268 MFLOP): compute/DMA
dominate the step overhead by ~5-25x.  The output slab stays resident in
VMEM across a band's panels; the X tile is steered by a scalar-prefetched
block-column index (panels are sorted by column, so consecutive steps with
equal column reuse the tile without re-DMA).

This is the TPU answer for *mid-density and column-structured* sparsity —
the regime the reference serves with MKL-IE/BSR (spmm_kernel_mkl_ie.cpp,
mkl_bsr targets): dense-matmul throughput where the matrix is locally
dense, with whole-panel skipping where it is not.  Hypersparse matrices
should use the WCOO kernels, banded ones DeviceBSR — the dispatch layer's
job (ops.dispatch.select_format / autotune_spmm).

Memory cost: R*bk*4 bytes per nonempty panel — between BSR and dense; the
framework's mem_footprint accounting reports it honestly.
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


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DevicePanels:
    """Nonempty (band, block-col) vertical panels, band-major col-sorted.

    Bands are padded to ``max_p`` panel slots; pad slots repeat the previous
    slot's column (no extra X DMA) and hold zero panels."""

    block_cols: jax.Array    # (bands*max_p,) int32
    panels: jax.Array        # (bands*max_p, R, bk)
    shape: Tuple[int, int]
    nnz: int
    num_panels: int          # true panel count
    band_rows: int           # R
    bands: int
    max_p: int

    def tree_flatten(self):
        return ((self.block_cols, self.panels),
                (self.shape, self.nnz, self.num_panels, self.band_rows,
                 self.bands, self.max_p))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def bk(self) -> int:
        return self.panels.shape[2]

    @classmethod
    def from_csr(cls, csr: CSRMatrix, bk: int = 128,
                 band_rows: int = 2048,
                 max_bytes: int = 4 << 30) -> "DevicePanels":
        m, k = csr.shape
        R = min(band_rows, _round_up(max(m, 8), 8))
        bands = -(-m // R)
        rows = np.repeat(np.arange(m, dtype=np.int64), csr.degrees)
        cols = csr.col_idx.astype(np.int64)
        band = rows // R
        bcol = cols // bk
        key = band * (-(-k // bk)) + bcol
        uniq, inv = np.unique(key, return_inverse=True)
        num_panels = len(uniq)
        # fail fast before allocating: scattered matrices make nearly every
        # (R, bk) panel nonempty and the panels array approaches the dense
        # footprint (observed: 16GB HBM OOM at compile on a 65k^2 matrix)
        est = num_panels * R * bk * csr.values.dtype.itemsize
        if est > max_bytes:
            raise ValueError(
                f"panels would need ~{est/2**30:.1f} GiB "
                f"({num_panels} nonempty (R={R}, bk={bk}) panels); "
                f"matrix too scattered for the panel layout")
        u_band = (uniq // (-(-k // bk))).astype(np.int64)
        u_col = (uniq % (-(-k // bk))).astype(np.int32)
        counts = np.bincount(u_band, minlength=bands)
        max_p = max(int(counts.max(initial=1)), 1)
        starts = np.concatenate([[0], np.cumsum(counts)])
        # slot of panel i (panels already sorted by (band, col) via unique)
        slot = np.arange(num_panels) - starts[u_band] + u_band * max_p

        pcols = np.zeros(bands * max_p, dtype=np.int32)
        panels = np.zeros((bands * max_p, R, bk), dtype=csr.values.dtype)
        pcols[slot] = u_col
        panels[slot[inv], rows % R, cols % bk] = csr.values
        # pad slots repeat the band's last real column
        for b in range(bands):
            s, e = starts[b], starts[b + 1]
            last = int(u_col[e - 1]) if e > s else 0
            pcols[b * max_p + (e - s): (b + 1) * max_p] = last
        return cls(
            block_cols=jnp.asarray(pcols),
            panels=jnp.asarray(panels),
            shape=csr.shape,
            nnz=csr.nnz,
            num_panels=num_panels,
            band_rows=R,
            bands=bands,
            max_p=max_p,
        )


def _kernel(cols_ref, panel_ref, x_ref, out_ref):
    p = pl.program_id(2)

    @pl.when(p == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # cv_panel carries bf16 panels against f32 x: pin DEFAULT precision so
    # an ambient HIGHEST context (the f32 harness) doesn't ask Mosaic for
    # a mixed bf16xf32 multi-pass form it cannot compile ("Bad lhs type");
    # for f32 panels DEFAULT is overridden by the caller's context anyway
    prec = ("default" if panel_ref.dtype == jnp.bfloat16 else None)
    out_ref[:] += jnp.dot(panel_ref[0], x_ref[:],
                          precision=prec,
                          preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("aux", "n_tile", "interpret"))
def _panel_spmm(block_cols, panels, x, *, aux, n_tile, interpret):
    (m, _k), bands, max_p, R = aux
    _, _R, bk = panels.shape
    k, n = x.shape
    n_pad = _round_up(n, n_tile)
    k_pad = _round_up(k, bk)
    if n_pad != n or k_pad != k:
        x = jnp.pad(x, ((0, k_pad - k), (0, n_pad - n)))
    num_n_tiles = n_pad // n_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bands, num_n_tiles, max_p),
        in_specs=[
            pl.BlockSpec(
                (1, R, bk),
                lambda band, nt, p, cols: (band * max_p + p, 0, 0),
            ),
            pl.BlockSpec(
                (bk, n_tile),
                lambda band, nt, p, cols: (cols[band * max_p + p], nt),
            ),
        ],
        out_specs=pl.BlockSpec(
            (R, n_tile),
            lambda band, nt, p, cols: (band, nt),
        ),
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bands * R, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * panels.shape[0] * R * bk * n_pad,
            bytes_accessed=panels.size * panels.dtype.itemsize
            + k_pad * n_pad * x.dtype.itemsize * bands
            + bands * R * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(block_cols, panels, x)
    return out[:m, :n].astype(x.dtype)


def panel_spmm(a: DevicePanels, x: jax.Array, *, n_tile: int = 512,
               interpret: bool | None = None) -> jax.Array:
    """Y = A @ X with A as band-resident vertical panels (see module doc)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_tile = min(n_tile, _round_up(x.shape[1], 128))
    aux = (a.shape, a.bands, a.max_p, a.band_rows)
    return _panel_spmm(a.block_cols, a.panels, x, aux=aux, n_tile=n_tile,
                       interpret=interpret)
