"""Pallas TPU kernel: window-row packed SpMV (WROW).

Reference counterpart: the custom CSR SpMV kernel family with its
load-balancing variants (spmv_kernel_csr.cpp:352-460, SURVEY A.3) and
SELL-C-sigma's row-repacking idea (ARM spmv_code_sell-C-s) — here the
"repacking" targets the TPU's 128-lane shuffle instead of SIMD rows.

Third-generation hypersparse SpMV layout, fixing the aligned format's
(wcoo_spmv) measured waste: there a group's sublane is hard-wired to the
window-within-superwindow, so collision *depth layers* are whole extra
(8,128) groups that are almost empty (slot utilization 0.10 on the 100k
banded benchmark, and the slot DMA is the entire kernel time — empty-body
ablation equals the full kernel).

WROW decouples the sublane from the window: a *piece* is one 128-lane row
holding the nnz of one (128-row target block, 128-col window, depth) with
lane == target row; a group stacks ANY 8 pieces of the same target block,
each carrying its own window id.  Pieces pack densely regardless of which
windows are occupied, so utilization ≈ nnz / (128 * pieces), with pieces ≈
(windows touched per block) * (1 + collision rate):

    layout        slots/nnz (100k, 20/row, bw=0.05)
    aligned         ~10x  (depth layers)
    WROW            ~2.4x

Per group: 8 single-row loads of x windows (stacked), one 128-lane gather,
one FMA, a sublane reduce, one y2 row RMW — identical math to wcoo_spmv
but on 4x fewer groups.  Column indices stream as int8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spgrid.formats.csr import CSRMatrix

LANE = 128
GROUPS_PER_STEP = 128      # fully unrolled in the kernel


def csr_to_wrow(csr: CSRMatrix):
    """Pack a CSR matrix into WROW pieces/groups.

    Returns (cols_i8 (P,128), vals (P,128), piece_w (P,), group_sub (G,),
    num_groups, utilization); P == 8*G, pieces padded per target block to a
    multiple of 8 (window 0, zero values)."""
    m, k = csr.shape
    nnz = csr.nnz
    if nnz == 0:
        return (np.zeros((8, LANE), np.int8), np.zeros((8, LANE),
                csr.values.dtype), np.zeros(8, np.int32),
                np.zeros(1, np.int32), 1, 0.0)
    rows = np.repeat(np.arange(m, dtype=np.int64), csr.degrees)
    cols = csr.col_idx.astype(np.int64)
    sub = rows // LANE
    win = cols // LANE
    lane = rows % LANE
    cw = (cols % LANE).astype(np.int8)

    # depth = occurrence index among nnz sharing (sub, win, lane)
    nwin = -(-k // LANE)
    poskey = (sub * nwin + win) * LANE + lane
    order = np.argsort(poskey, kind="stable")
    pk = poskey[order]
    first = np.empty(nnz, dtype=bool)
    first[0] = True
    first[1:] = pk[1:] != pk[:-1]
    start = np.maximum.accumulate(
        np.where(first, np.arange(nnz, dtype=np.int64), 0))
    depth = np.arange(nnz, dtype=np.int64) - start

    # piece id = dense rank of (sub, win, depth)
    pkey = (sub[order] * nwin + win[order]) * (depth.max() + 1) + depth
    uniq, pid = np.unique(pkey, return_inverse=True)
    P0 = len(uniq)
    p_sub = (uniq // (depth.max() + 1) // nwin).astype(np.int64)
    p_win = (uniq // (depth.max() + 1) % nwin).astype(np.int32)

    # pad pieces per target block to a multiple of 8 (group = 8 pieces,
    # all same block)
    counts = np.bincount(p_sub, minlength=int(sub.max()) + 1)
    pad = (-counts) % 8
    tot = counts + pad
    G = int(tot.sum()) // 8
    starts_out = np.concatenate([[0], np.cumsum(tot)])
    starts_in = np.concatenate([[0], np.cumsum(counts)])
    # pieces are already sorted by (sub, win, depth) via unique
    dest = starts_out[p_sub] + (np.arange(P0) - starts_in[p_sub])

    cols_p = np.zeros((G * 8, LANE), np.int8)
    vals_p = np.zeros((G * 8, LANE), csr.values.dtype)
    piece_w = np.zeros(G * 8, np.int32)
    piece_w[dest] = p_win
    cols_p[dest[pid], lane[order]] = cw[order]
    vals_p[dest[pid], lane[order]] = csr.values[order]
    # blocks are laid out contiguously in order: tot[b]//8 groups each
    group_sub = np.repeat(np.arange(len(tot), dtype=np.int32),
                          tot // 8)
    util = nnz / (G * 8 * LANE)
    return cols_p, vals_p, piece_w, group_sub, G, util


@jax.tree_util.register_pytree_node_class
class DeviceWROW:
    """Device-resident WROW pieces (see module doc)."""

    def tree_flatten(self):
        return ((self.cols, self.values, self.piece_w, self.group_sub),
                (self.shape, self.nnz, self.utilization, self.num_groups,
                 self.name))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.cols, obj.values, obj.piece_w, obj.group_sub = children
        (obj.shape, obj.nnz, obj.utilization, obj.num_groups,
         obj.name) = aux
        return obj

    def __init__(self, csr: CSRMatrix):
        cols, vals, pw, gsub, G, util = csr_to_wrow(csr)
        pad = (-G) % GROUPS_PER_STEP
        if pad:
            cols = np.concatenate([cols, np.zeros((pad * 8, LANE), np.int8)])
            vals = np.concatenate(
                [vals, np.zeros((pad * 8, LANE), vals.dtype)])
            pw = np.concatenate([pw, np.zeros(pad * 8, np.int32)])
            gsub = np.concatenate([gsub, np.zeros(pad, np.int32)])
        # SMEM-blocked metadata rides as (8, N) rows of 8 steps (SMEM s32
        # tiling rejects narrow rank-1/-2 blocks); pad steps to 8
        steps = len(gsub) // GROUPS_PER_STEP
        pw2 = pw.reshape(steps, 8 * GROUPS_PER_STEP)
        gs2 = gsub.reshape(steps, GROUPS_PER_STEP)
        pad8 = (-steps) % 8
        if pad8:
            pw2 = np.concatenate(
                [pw2, np.zeros((pad8, pw2.shape[1]), np.int32)])
            gs2 = np.concatenate(
                [gs2, np.zeros((pad8, gs2.shape[1]), np.int32)])
        self.cols = jnp.asarray(cols)
        self.values = jnp.asarray(vals)
        self.piece_w = jnp.asarray(pw2)
        self.group_sub = jnp.asarray(gs2)
        self.shape = csr.shape
        self.nnz = csr.nnz
        self.utilization = util
        self.num_groups = G
        self.name = csr.name

    @classmethod
    def from_csr(cls, csr: CSRMatrix) -> "DeviceWROW":
        return cls(csr)

    @property
    def mem_footprint(self) -> int:
        return (self.cols.size
                + self.values.size * self.values.dtype.itemsize
                + self.piece_w.size * 4 + self.group_sub.size * 4)


def _kernel(pw_ref, gsub_ref, cols_ref, vals_ref, x2_ref, y2_ref):
    # pw/gsub ride as per-step SMEM-blocked inputs (not scalar prefetch —
    # per-piece arrays overflow the ~1MB prefetch SMEM at ~100k rows; no
    # index map needs them)
    b = pl.program_id(0)
    brow = b % 8

    @pl.when(b == 0)
    def _():
        y2_ref[:] = jnp.zeros_like(y2_ref)

    def body(g, _):
        sr = gsub_ref[brow, g]
        src = jnp.concatenate(
            [x2_ref[pl.ds(pw_ref[brow, g * 8 + r], 1), :] for r in range(8)],
            axis=0)                                         # (8, 128)
        idx = cols_ref[pl.ds(g * 8, 8), :].astype(jnp.int32)
        v = vals_ref[pl.ds(g * 8, 8), :]
        p = jnp.take_along_axis(src, idx, axis=1) * v
        y2_ref[pl.ds(sr, 1), :] += jnp.sum(p, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, GROUPS_PER_STEP, body, 0, unroll=GROUPS_PER_STEP)


@functools.partial(jax.jit, static_argnames=("m2", "interpret"))
def _spmv(piece_w, group_sub, cols, vals, x2, *, m2, interpret):
    gp = cols.shape[0] // (8 * GROUPS_PER_STEP)
    k2 = x2.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(gp,),
        in_specs=[
            pl.BlockSpec((8, 8 * GROUPS_PER_STEP), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, GROUPS_PER_STEP), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8 * GROUPS_PER_STEP, LANE), lambda b: (b, 0)),
            pl.BlockSpec((8 * GROUPS_PER_STEP, LANE), lambda b: (b, 0)),
            pl.BlockSpec((k2, LANE), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m2, LANE), lambda b: (0, 0)),
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
    )(piece_w, group_sub, cols, vals, x2)


def _kernel_v2(pw_ref, gsub_ref, cols_ref, vals_ref, x2_ref, y2_ref,
               acc, open_ref):
    """Block-stationary accumulation (round-4 redesign, ROADMAP SpMV).

    v1 pays, per 8-piece group, a sublane reduce plus a read-modify-write
    of a dynamically-indexed y row — and consecutive groups of one target
    block form a serial RMW chain on the same row.  The layout guarantees
    a block's groups are CONTIGUOUS, so an (8, LANE) VMEM accumulator
    carries partials across groups (and across grid steps — scratch
    persists), flushing to y once per TARGET BLOCK (change of sub-row
    detected via an SMEM "open block" cell)."""
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    brow = b % 8

    @pl.when(b == 0)
    def _():
        y2_ref[:] = jnp.zeros_like(y2_ref)
        acc[:] = jnp.zeros_like(acc)
        open_ref[0] = jnp.int32(-1)

    def body(g, _):
        sr = gsub_ref[brow, g]
        opn = open_ref[0]

        @pl.when((sr != opn) & (opn >= 0))
        def _():
            y2_ref[pl.ds(opn, 1), :] += jnp.sum(acc[:], axis=0,
                                                keepdims=True)
            acc[:] = jnp.zeros_like(acc)

        @pl.when(sr != opn)
        def _():
            open_ref[0] = sr

        src = jnp.concatenate(
            [x2_ref[pl.ds(pw_ref[brow, g * 8 + r], 1), :] for r in range(8)],
            axis=0)
        idx = cols_ref[pl.ds(g * 8, 8), :].astype(jnp.int32)
        v = vals_ref[pl.ds(g * 8, 8), :]
        acc[:] += jnp.take_along_axis(src, idx, axis=1) * v
        return 0

    jax.lax.fori_loop(0, GROUPS_PER_STEP, body, 0, unroll=GROUPS_PER_STEP)

    @pl.when(b == nb - 1)
    def _():
        opn = open_ref[0]

        @pl.when(opn >= 0)
        def _():
            y2_ref[pl.ds(opn, 1), :] += jnp.sum(acc[:], axis=0,
                                                keepdims=True)


@functools.partial(jax.jit, static_argnames=("m2", "interpret"))
def _spmv_v2(piece_w, group_sub, cols, vals, x2, *, m2, interpret):
    gp = cols.shape[0] // (8 * GROUPS_PER_STEP)
    k2 = x2.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(gp,),
        in_specs=[
            pl.BlockSpec((8, 8 * GROUPS_PER_STEP), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, GROUPS_PER_STEP), lambda b: (b // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8 * GROUPS_PER_STEP, LANE), lambda b: (b, 0)),
            pl.BlockSpec((8 * GROUPS_PER_STEP, LANE), lambda b: (b, 0)),
            pl.BlockSpec((k2, LANE), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m2, LANE), lambda b: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((8, LANE), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        _kernel_v2,
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
    )(piece_w, group_sub, cols, vals, x2)


def wrow_spmv(a: DeviceWROW, x: jax.Array,
              interpret: bool | None = None,
              variant: str = "v1") -> jax.Array:
    """y = A @ x; x (k,) -> y (m,).

    variant: "v1" (per-group RMW, default) or "v2" (block-stationary
    accumulator).  The r4 A/B (scripts/exp_wrow_v2.py, probes_r3.log)
    measured v2 at 7x slower — v1 is the explicit default; callers that
    want v2 pass it, so benchmark provenance lives in the call site, not
    an env var (ADVICE r4)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, k = a.shape
    k2 = max(-(-k // LANE), 1)
    x2 = jnp.zeros((k2 * LANE,), x.dtype).at[:k].set(x).reshape(k2, LANE)
    m2 = max(-(-m // LANE), 1)
    fn = _spmv_v2 if variant == "v2" else _spmv
    y2 = fn(a.piece_w, a.group_sub, a.cols, a.values, x2, m2=m2,
            interpret=interpret)
    return y2.reshape(-1)[:m].astype(x.dtype)
