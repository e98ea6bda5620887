"""GELL: gather-based ELL SpMM — the hypersparse workhorse kernel.

Re-designs the reference's inspector-executor CSR SpMM for the regime the
reference runs MKL IE in (spmm_kernel_mkl_ie.cpp:75-104: 5-100 nnz/row,
m = 65k-2M, n = 512, where EPYC MKL-IE lands 105-328 GFLOPS), and doubles
as the SELL-C-sigma SpMM the reference benchmarks standalone
(spmv_code_sell-C-s/spmvbench/spmvbench.c:1-303).

TPU design rationale (all constants measured on v5e, scripts/exp_gather.py):

- The irreducible primitive is a random gather of ~2KB X rows from HBM.
  XLA's row gather runs at ~31 Gelem/s for f32 but ~143-188 Gelem/s for
  16-bit dtypes (4.6-6x faster per element) — so the kernel gathers X in a
  16-bit representation even for f32 inputs.
- f32 accuracy is preserved by a **hi/lo bfloat16 split**: X is expanded
  once per call into ``[bf16(x) | bf16(x - f32(bf16(x)))]`` of shape
  (k, 2n); one wide take moves both halves (2KB rows again, but at the
  16-bit gather rate), and the consumer reconstructs ``hi + lo`` (~2^-17
  relative error, far inside the f32 oracle gate of 1e-4).
- ELL (fixed slots/row) instead of COO+segment-sum: the slot sum is a
  dense reduction XLA fuses, with no scatter. Skewed rows overflow into a
  small COO tail handled by segment_sum.
- Row-chunked unrolled (static python loop, NOT lax.map — measured 18%
  slower from loop overhead) so the gathered intermediate stays bounded
  for m up to millions.

Modes: "split24" (default: 3-way split, error ~2^-25 — f32-exact for the
oracle), "split16" (2-way, ~2^-17 — CV-class), "f32" (exact, slow gather),
"bf16" (CV mode — half traffic, gated against dequantized gold like the
other CV kernels; ref value-compression study lib/bitstream.c).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spgrid.formats.csr import CSRMatrix


@jax.tree_util.register_pytree_node_class
class DeviceGELL:
    """ELL slots (m_pad, S) + COO overflow tail, device-resident.

    Slot width S defaults to ceil(1.25 * avg_nnz_per_row) rounded up so
    >= ~90% of nnz land in slots for mild skew; the rest stream through
    the COO tail (rows sorted, segment-sum).
    """

    def tree_flatten(self):
        return ((self.cols, self.values, self.tail_rows, self.tail_cols,
                 self.tail_vals),
                (self.shape, self.nnz, self.slots, self.mode, self.name))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.cols, obj.values, obj.tail_rows, obj.tail_cols,
         obj.tail_vals) = children
        obj.shape, obj.nnz, obj.slots, obj.mode, obj.name = aux
        return obj

    def __init__(self, csr: CSRMatrix, slots: int | None = None,
                 mode: str = "split24"):
        m, k = csr.shape
        deg = csr.degrees
        if slots is None:
            avg = csr.nnz / max(m, 1)
            slots = max(1, int(np.ceil(avg * 1.25)))
            # don't let mild skew force a tail when a slightly wider ELL
            # would hold everything
            if deg.size and int(deg.max()) <= slots + 2:
                slots = int(deg.max())
        slots = max(1, slots)
        m_pad = -(-max(m, 1) // 8) * 8

        in_slot = np.minimum(deg, slots)
        cols = np.zeros((m_pad, slots), dtype=np.int32)  # pad: row 0, val 0
        vals = np.zeros((m_pad, slots), dtype=np.float32)
        # slot assignment: first `slots` nnz of each row
        nnz_idx = np.arange(csr.nnz, dtype=np.int64)
        row_of = np.repeat(np.arange(m, dtype=np.int64), deg)
        within = nnz_idx - np.repeat(csr.row_ptr[:-1].astype(np.int64), deg)
        take_mask = within < slots
        cols[row_of[take_mask], within[take_mask]] = \
            csr.col_idx[take_mask].astype(np.int32)
        vals[row_of[take_mask], within[take_mask]] = csr.values[take_mask]
        tail = ~take_mask
        self.cols = jnp.asarray(cols)
        self.values = jnp.asarray(vals)
        self.tail_rows = jnp.asarray(row_of[tail].astype(np.int32))
        self.tail_cols = jnp.asarray(csr.col_idx[tail].astype(np.int32))
        self.tail_vals = jnp.asarray(csr.values[tail].astype(np.float32))
        self.shape = csr.shape
        self.nnz = csr.nnz
        self.slots = slots
        self.mode = mode
        self.name = csr.name

    @classmethod
    def from_csr(cls, csr: CSRMatrix, slots: int | None = None,
                 mode: str = "split24") -> "DeviceGELL":
        return cls(csr, slots=slots, mode=mode)

    @property
    def mem_footprint(self) -> int:
        return (self.cols.size * 4 + self.values.size * 4
                + self.tail_rows.size * 12)


def _trunc_bf16(x: jax.Array) -> jax.Array:
    """Truncate f32 to a bf16-representable f32 by mantissa masking.

    Bit-level (not a convert pair) on purpose: the platform compiles with
    --xla_allow_excess_precision=true, which folds f32->bf16->f32 round
    trips to the identity and silently voids a convert-based split
    (observed: split modes degraded to plain-bf16 error).  An integer AND
    cannot be folded.
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000),
                                        jnp.float32)


def _split_planes(x: jax.Array, nplanes: int) -> tuple:
    """(k, n) f32 -> `nplanes` bf16 planes whose sum reconstructs x.

    Truncation split: plane p holds the next 8 mantissa bits.  3 planes
    cover the full 24-bit f32 mantissa => hi+mid+lo == x EXACTLY, so the
    kernel is f32-oracle-exact while every gather runs at the measured
    16-bit element rate (scripts/exp_gather.py: 143-188 vs 31 Gelem/s).
    Planes stay separate (k, n) arrays: gathers of non-power-of-2-width
    concatenated rows fall off XLA's fast gather path (measured 5x).
    """
    planes = []
    r = x
    for _ in range(nplanes - 1):
        p = _trunc_bf16(r)
        planes.append(p.astype(jnp.bfloat16))
        r = r - p                 # exact (aligned operands)
    planes.append(r.astype(jnp.bfloat16))
    return tuple(planes)


_PLANES = {"split16": 2, "split24": 3, "bf16": 1, "f32": 2}


def _chunk_rows(m_pad: int, slots: int, n: int, mode: str,
                budget: int = 3 << 30) -> int:
    """Row-chunk size keeping the gathered intermediate under `budget` B.

    Chunking costs ~1-2ms per extra chunk (measured), so the budget is
    generous: chunk only when the gathered intermediate would strain HBM.
    """
    per_row = max(slots * _PLANES[mode] * n * 2, 1)
    rows = max(budget // per_row, 8)
    rows = min(rows, m_pad)
    return -(-rows // 8) * 8


@functools.partial(jax.jit, static_argnames=("m", "mode"))
def _gell_spmm(cols, vals, trows, tcols, tvals, x, *, m, mode):
    k, n = x.shape
    m_pad, S = cols.shape
    if mode == "split16":
        planes = _split_planes(x, 2)
    elif mode == "split24":
        planes = _split_planes(x, 3)
    elif mode == "bf16":
        planes = (x.astype(jnp.bfloat16),)
    else:
        planes = (x,)

    rb = _chunk_rows(m_pad, S, n, mode)
    nb = -(-m_pad // rb)
    if nb * rb != m_pad:
        pad = nb * rb - m_pad
        cols = jnp.pad(cols, ((0, pad), (0, 0)))
        vals = jnp.pad(vals, ((0, pad), (0, 0)))
    outs = []
    for b in range(nb):                       # static unroll: no map overhead
        cb = jax.lax.dynamic_slice_in_dim(cols, b * rb, rb, 0)
        vb = jax.lax.dynamic_slice_in_dim(vals, b * rb, rb, 0)
        idxb = cb.reshape(-1)
        g32 = sum(jnp.take(p, idxb, axis=0).astype(jnp.float32)
                  for p in planes).reshape(rb, S, n)
        # explicit mul+sum: stays on the VPU in full f32 regardless of the
        # ambient matmul precision (an einsum here could drop to bf16 MXU
        # passes and void the split)
        outs.append(jnp.sum(vb[:, :, None] * g32, axis=1))
    y = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    y = y[:m]
    if trows.shape[0]:
        gt = sum(jnp.take(p, tcols, axis=0).astype(jnp.float32)
                 for p in planes)
        prods = tvals[:, None] * gt
        y = y + jax.ops.segment_sum(prods, trows, num_segments=m + 1,
                                    indices_are_sorted=True)[:m]
    return y.astype(x.dtype)


def gell_spmm(a: DeviceGELL, x: jax.Array) -> jax.Array:
    """Y = A @ X. x may be (k,) or (k, n)."""
    squeeze = x.ndim == 1
    x2 = x[:, None] if squeeze else x
    y = _gell_spmm(a.cols, a.values, a.tail_rows, a.tail_cols, a.tail_vals,
                   x2, m=a.shape[0], mode=a.mode)
    return y[:, 0] if squeeze else y
