"""Pallas TPU kernel: multi-row packed SpMV (WPACK) — wrow generation 4.

Reference counterpart: the merge-based load-balanced SpMV family
(spmv_code_bench/spmv_kernel_merge.cpp:61-65, SURVEY A.3): assign equal
WORK (nnz) per execution unit instead of equal rows, then reduce row
segments locally.

The round-4 wrow ablation (probes_r3.log, ROADMAP "SpMV: layout, not
arithmetic") localized wrow v1's cost exactly: utilization 0.144 — a v1
piece is one (128-row block, 128-col window, depth) with lane hard-wired
to row%128, so at ~20 scattered nnz/row 86% of slot lanes are padding,
while the loop skeleton itself is 10 of the 14.1 ns/group.  WPACK breaks
the lane==row wiring: a piece is any <=128 nnz sharing ONE (128-row
target block, 128-col window), sorted by target row, with lane = packing
order.  The gather stays identical to v1 (8 stacked single-row x-window
loads + one take_along_axis), and the segmented row-reduce is three
vector ops:

    P     = lane-prefix-sum(products)        (7 static shift-adds)
    contrib[r] = P[ends[r]] - (P - p)[starts[r]]   (2 take_along_axis)

ends/starts are per-piece int8 lane maps built at pack time; absent rows
point at (end=0, start=1) so P_incl[0] - P_excl[1] == 0.  contrib comes
out LANE-ALIGNED to the target block's y row, so the accumulate is v1's
unchanged single RMW per group.  Utilization becomes
nnz / (128 * ceil-sum over occupied (block, window)) — 0.5+ on the 100k
benchmark configs vs v1's 0.144, at near-unchanged per-group cost.
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


def pick_wsel(csr: CSRMatrix) -> int:
    """Static window-width multiplier: piece windows are wsel*128 columns.

    Wider windows merge under-filled 128-col runs (the a5/bw-0.3 regimes:
    ~11-16 nnz per (block, 128-window) run would leave pieces ~90% empty)
    at the price of wsel stacked source rows + a select tree per group.
    Chosen so the mean nnz per (block, window) run is >= ~64."""
    m, k = csr.shape
    if csr.nnz == 0:
        return 1
    rows = np.repeat(np.arange(m, dtype=np.int64), csr.degrees)
    key = (rows // LANE) * (-(-k // LANE)) + csr.col_idx // LANE
    c_mean = csr.nnz / max(len(np.unique(key)), 1)
    if c_mean >= 64:
        return 1
    if c_mean >= 32:
        return 2
    return 4


def csr_to_wpack(csr: CSRMatrix, wsel: int | None = None):
    """Pack a CSR matrix into WPACK pieces/groups.

    Returns (cols_i8 (P,128), vals (P,128), ends_i8 (P,128),
    starts_i8 (P,128), sel_i8 (P,128), piece_w (P,), group_sub (G,),
    num_groups, utilization, wsel); P == 8*G, pieces padded per target
    block to a multiple of 8 (window 0, zero values, absent-row maps).
    piece_w holds the piece's BASE x2 row (window * wsel); sel holds the
    per-lane source row offset 0..wsel-1 within the window."""
    m, k = csr.shape
    nnz = csr.nnz
    dt = csr.values.dtype
    if wsel is None:
        wsel = pick_wsel(csr)
    if nnz == 0:
        ends = np.zeros((8, LANE), np.int8)
        starts = np.ones((8, LANE), np.int8)
        return (np.zeros((8, LANE), np.int8), np.zeros((8, LANE), dt),
                ends, starts, np.zeros((8, LANE), np.int8),
                np.zeros(8, np.int32), np.zeros(1, np.int32), 1, 0.0, 1)
    wl = LANE * wsel
    rows = np.repeat(np.arange(m, dtype=np.int64), csr.degrees)
    cols = csr.col_idx.astype(np.int64)
    b = rows // LANE
    w = cols // wl
    order = np.lexsort((cols, rows, w, b))
    b, w, rows, cols = b[order], w[order], rows[order], cols[order]
    vals_s = csr.values[order]
    tr = (rows % LANE).astype(np.int64)
    off = cols % wl
    cw = (off % LANE).astype(np.int8)
    sel = (off // LANE).astype(np.int8)

    # pieces: <=128-nnz chunks of each (b, w) run
    nwin = -(-k // wl)
    bw_key = b * nwin + w
    runs, run_id, run_cnt = np.unique(bw_key, return_inverse=True,
                                      return_counts=True)
    run_start = np.concatenate([[0], np.cumsum(run_cnt)])[:-1]
    rank = np.arange(nnz, dtype=np.int64) - run_start[run_id]
    pieces_per_run = -(-run_cnt // LANE)
    run_piece0 = np.concatenate([[0], np.cumsum(pieces_per_run)])[:-1]
    pid = run_piece0[run_id] + rank // LANE
    lane = (rank % LANE).astype(np.int64)
    P0 = int(pieces_per_run.sum())
    p_b = (runs // nwin)[np.repeat(np.arange(len(runs)), pieces_per_run)]
    p_w = (runs % nwin)[np.repeat(np.arange(len(runs)), pieces_per_run)]

    # pad pieces per target block to a multiple of 8 (group = 8 pieces of
    # one block -> one y-row RMW per group, exactly v1's accumulate)
    counts = np.bincount(p_b, minlength=int(b.max()) + 1)
    tot = counts + (-counts) % 8
    G = int(tot.sum()) // 8
    starts_out = np.concatenate([[0], np.cumsum(tot)])
    starts_in = np.concatenate([[0], np.cumsum(counts)])
    dest = starts_out[p_b] + (np.arange(P0) - starts_in[p_b])

    cols_p = np.zeros((G * 8, LANE), np.int8)
    vals_p = np.zeros((G * 8, LANE), dt)
    ends_p = np.zeros((G * 8, LANE), np.int8)
    starts_p = np.ones((G * 8, LANE), np.int8)
    sel_p = np.zeros((G * 8, LANE), np.int8)
    piece_w = np.zeros(G * 8, np.int32)
    piece_w[dest] = p_w * wsel          # base x2 row of the piece's window
    dpid = dest[pid]
    cols_p[dpid, lane] = cw
    vals_p[dpid, lane] = vals_s
    sel_p[dpid, lane] = sel

    # per-piece row-segment lane maps (lanes sorted by target row)
    first = np.ones(nnz, dtype=bool)
    first[1:] = (dpid[1:] != dpid[:-1]) | (tr[1:] != tr[:-1])
    last = np.ones(nnz, dtype=bool)
    last[:-1] = first[1:]
    starts_p[dpid[first], tr[first]] = lane[first]
    ends_p[dpid[last], tr[last]] = lane[last]

    group_sub = np.repeat(np.arange(len(tot), dtype=np.int32), tot // 8)
    util = nnz / (G * 8 * LANE)
    return (cols_p, vals_p, ends_p, starts_p, sel_p, piece_w, group_sub,
            G, util, wsel)


@jax.tree_util.register_pytree_node_class
class DeviceWPACK:
    """Device-resident WPACK pieces (see module doc)."""

    def tree_flatten(self):
        return ((self.cols, self.values, self.ends, self.starts, self.sel,
                 self.piece_w, self.group_sub),
                (self.shape, self.nnz, self.utilization, self.num_groups,
                 self.wsel, self.name))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.cols, obj.values, obj.ends, obj.starts, obj.sel, obj.piece_w,
         obj.group_sub) = children
        (obj.shape, obj.nnz, obj.utilization, obj.num_groups, obj.wsel,
         obj.name) = aux
        return obj

    def __init__(self, csr: CSRMatrix, wsel: int | None = None):
        (cols, vals, ends, starts, sel, pw, gsub, G, util,
         wsel) = csr_to_wpack(csr, wsel)
        pad = (-G) % GROUPS_PER_STEP
        if pad:
            cols = np.concatenate([cols, np.zeros((pad * 8, LANE), np.int8)])
            vals = np.concatenate(
                [vals, np.zeros((pad * 8, LANE), vals.dtype)])
            ends = np.concatenate([ends, np.zeros((pad * 8, LANE), np.int8)])
            starts = np.concatenate(
                [starts, np.ones((pad * 8, LANE), np.int8)])
            sel = np.concatenate([sel, np.zeros((pad * 8, LANE), np.int8)])
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
        self.ends = jnp.asarray(ends)
        self.starts = jnp.asarray(starts)
        self.sel = jnp.asarray(sel)
        self.piece_w = jnp.asarray(pw2)
        self.group_sub = jnp.asarray(gs2)
        self.shape = csr.shape
        self.nnz = csr.nnz
        self.utilization = util
        self.num_groups = G
        self.wsel = wsel
        self.name = csr.name

    @classmethod
    def from_csr(cls, csr: CSRMatrix,
                 wsel: int | None = None) -> "DeviceWPACK":
        return cls(csr, wsel)

    @property
    def mem_footprint(self) -> int:
        per_slot = 3 + (1 if self.wsel > 1 else 0)
        return (self.cols.size * per_slot
                + self.values.size * self.values.dtype.itemsize
                + self.piece_w.size * 4 + self.group_sub.size * 4)


def _lane_prefix(p, scheme: str):
    """Inclusive lane-prefix sum of (8, 128) via 7 static shift-adds.

    scheme: "pad" (jnp.pad+slice — materializes a copy per step) or
    "roll" (pltpu.roll + precomputed iota mask — lane rotate is the
    measured-cheap lane shuffle, ~137ns per (256,128) tile)."""
    P = p
    if scheme == "roll":
        lanes = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        for sh in (1, 2, 4, 8, 16, 32, 64):
            rolled = pltpu.roll(P, sh, 1)
            P = P + jnp.where(lanes >= sh, rolled, 0.0)
    else:
        for sh in (1, 2, 4, 8, 16, 32, 64):
            P = P + jnp.pad(P, ((0, 0), (sh, 0)))[:, :LANE]
    return P


def _make_kernel(wsel: int, ablate: str = "", prefix: str = "roll"):
    """ablate: "" (full kernel) | "noseg" (skip the segmented reduce —
    WRONG MATH, timing-ablation only) | "nogather" (skip the 2 boundary
    takes, keep the prefix — WRONG MATH, timing-ablation only)."""

    def _kernel(pw_ref, gsub_ref, cols_ref, vals_ref, ends_ref, starts_ref,
                sel_ref, x2_ref, y2_ref):
        b = pl.program_id(0)
        brow = b % 8

        @pl.when(b == 0)
        def _():
            y2_ref[:] = jnp.zeros_like(y2_ref)

        def body(g, _):
            sr = gsub_ref[brow, g]
            idx = cols_ref[pl.ds(g * 8, 8), :].astype(jnp.int32)
            v = vals_ref[pl.ds(g * 8, 8), :]
            if wsel == 1:
                src = jnp.concatenate(
                    [x2_ref[pl.ds(pw_ref[brow, g * 8 + r], 1), :]
                     for r in range(8)], axis=0)            # (8, 128)
                p = jnp.take_along_axis(src, idx, axis=1) * v
            else:
                # wsel stacked source rows per piece + per-lane row select
                sel = sel_ref[pl.ds(g * 8, 8), :].astype(jnp.int32)
                p = jnp.zeros((8, LANE), jnp.float32)
                for r in range(wsel):
                    src_r = jnp.concatenate(
                        [x2_ref[pl.ds(pw_ref[brow, g * 8 + q] + r, 1), :]
                         for q in range(8)], axis=0)
                    t = jnp.take_along_axis(src_r, idx, axis=1)
                    p = p + jnp.where(sel == r, t, 0.0)
                p = p * v
            if ablate == "noseg":
                contrib = p
            else:
                P = _lane_prefix(p, prefix)
                if ablate == "nogather":
                    contrib = P
                else:
                    Pex = P - p
                    e_idx = ends_ref[pl.ds(g * 8, 8), :].astype(jnp.int32)
                    s_idx = starts_ref[pl.ds(g * 8, 8), :] \
                        .astype(jnp.int32)
                    contrib = jnp.take_along_axis(P, e_idx, axis=1) \
                        - jnp.take_along_axis(Pex, s_idx, axis=1)
            y2_ref[pl.ds(sr, 1), :] += jnp.sum(contrib, axis=0,
                                               keepdims=True)
            return 0

        jax.lax.fori_loop(0, GROUPS_PER_STEP, body, 0,
                          unroll=GROUPS_PER_STEP)

    return _kernel


@functools.partial(jax.jit, static_argnames=("m2", "wsel", "interpret",
                                              "ablate", "prefix"))
def _spmv(piece_w, group_sub, cols, vals, ends, starts, sel, x2, *, m2,
          wsel, interpret, ablate="", prefix="roll"):
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
            pl.BlockSpec((8 * GROUPS_PER_STEP, LANE), lambda b: (b, 0)),
            pl.BlockSpec((8 * GROUPS_PER_STEP, LANE), lambda b: (b, 0)),
            pl.BlockSpec((8 * GROUPS_PER_STEP, LANE), lambda b: (b, 0)),
            pl.BlockSpec((k2, LANE), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m2, LANE), lambda b: (0, 0)),
    )
    return pl.pallas_call(
        _make_kernel(wsel, ablate, prefix),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m2, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * cols.size,
            bytes_accessed=cols.size * 8 + (k2 + m2) * LANE * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(piece_w, group_sub, cols, vals, ends, starts, sel, x2)


def wpack_spmv(a: DeviceWPACK, x: jax.Array,
               interpret: bool | None = None, ablate: str = "",
               prefix: str = "roll") -> jax.Array:
    """y = A @ x; x (k,) -> y (m,).

    ablate/prefix are explicit recorded knobs for the timing ablation
    (scripts/exp_wpack_ablate.py); ablate != "" gives WRONG results by
    design and must never reach a benchmark row."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, k = a.shape
    # x2 rows padded to a multiple of wsel so a piece's base row + wsel-1
    # stays in range
    k2 = max(-(-k // (LANE * a.wsel)) * a.wsel, a.wsel)
    x2 = jnp.zeros((k2 * LANE,), x.dtype).at[:k].set(x).reshape(k2, LANE)
    m2 = max(-(-m // LANE), 1)
    y2 = _spmv(a.piece_w, a.group_sub, a.cols, a.values, a.ends, a.starts,
               a.sel, x2, m2=m2, wsel=a.wsel, interpret=interpret,
               ablate=ablate, prefix=prefix)
    return y2.reshape(-1)[:m].astype(x.dtype)
