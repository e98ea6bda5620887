"""Structural feature extraction over CSR matrices.

Reimplements the feature taxonomy of
``lib/storage_formats/csr_util/csr_util_gen.c`` (SURVEY A.1) with vectorized
numpy.  Exact semantics reproduced:

- ``degree_row[i] = row_ptr[i+1] - row_ptr[i]``; column degrees
  (csr_util_gen.c:287-301)
- bandwidth ``bw[i] = col_max - col_min`` within the row; scatter
  ``sc[i] = degree/bw if bw>0 else 0`` (:307-310)
- num_neighbours: per nnz, count of other same-row nnz within column window
  ``window_size=1``, counted symmetrically on both elements (:459-490, :722)
- cross_row_similarity: per non-empty row, fraction of its nnz that have an
  nnz in the *next non-empty* row within +-window; averaged over non-empty
  rows (:553-611)
- cross_row_neighbours: same scan, counting all matches per nnz (:495-545)
- column groups: gap-bounded runs of consecutive columns, ``max_gap_size=0``
  (:340-457, :755-760)
- twin-parameter emission: bw normalized by n, skew = (max-avg)/avg
  (:963-980)
"""

from __future__ import annotations

import dataclasses

import numpy as np

from spgrid.formats.csr import CSRMatrix


def row_degrees(csr: CSRMatrix) -> np.ndarray:
    return np.diff(csr.row_ptr)


def col_degrees(csr: CSRMatrix) -> np.ndarray:
    out = np.zeros(csr.k, dtype=np.int64)
    np.add.at(out, csr.col_idx, 1)
    return out


def row_bandwidths(csr: CSRMatrix) -> np.ndarray:
    """bw[i] = col_max - col_min per row (0 for rows with <=1 nnz)."""
    d = row_degrees(csr)
    bw = np.zeros(csr.m, dtype=np.int64)
    nz = d > 0
    if nz.any():
        cmax = np.maximum.reduceat(csr.col_idx, csr.row_ptr[:-1][nz])
        cmin = np.minimum.reduceat(csr.col_idx, csr.row_ptr[:-1][nz])
        bw[nz] = cmax - cmin
    return bw


def row_scatters(csr: CSRMatrix) -> np.ndarray:
    """sc[i] = degree[i]/bw[i] if bw>0 else 0 (csr_util_gen.c:307-310)."""
    d = row_degrees(csr).astype(np.float64)
    bw = row_bandwidths(csr).astype(np.float64)
    return np.divide(d, bw, out=np.zeros_like(d), where=bw > 0)


def _sorted_csr(csr: CSRMatrix) -> CSRMatrix:
    col = csr.col_idx
    rp = csr.row_ptr
    # Fast check: within-row ascending?
    if len(col) > 1:
        rows = np.repeat(np.arange(csr.m), np.diff(rp))
        same_row = rows[1:] == rows[:-1]
        if (col[1:][same_row] <= col[:-1][same_row]).any():
            return csr.sort_columns()
    return csr


def num_neighbours(csr: CSRMatrix, window: int = 1) -> np.ndarray:
    """Per-nnz count of other same-row nnz within +-window columns.

    With window=1 and unique sorted columns the count per nnz is
    (next_col - col <= window) + (col - prev_col <= window), i.e. in {0,1,2},
    matching the symmetric double-count of csr_util_gen.c:459-490.
    """
    csr = _sorted_csr(csr)
    col = csr.col_idx.astype(np.int64)
    n = len(col)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    rows = np.repeat(np.arange(csr.m), np.diff(csr.row_ptr))
    counts = np.zeros(n, dtype=np.int64)
    if window == 1:
        fwd = np.zeros(n, dtype=bool)
        fwd[:-1] = (rows[1:] == rows[:-1]) & (col[1:] - col[:-1] <= window)
        counts += fwd
        counts[1:] += fwd[:-1]
    else:
        # General window: for each nnz, count same-row nnz in [c-w, c+w]\{self}
        key = rows * np.int64(csr.k + 2 * window + 2) + col
        lo = np.searchsorted(key, rows * np.int64(csr.k + 2 * window + 2) + col - window)
        hi = np.searchsorted(key, rows * np.int64(csr.k + 2 * window + 2) + col + window,
                             side="right")
        counts = hi - lo - 1
    return counts


def avg_num_neighbours(csr: CSRMatrix, window: int = 1) -> float:
    c = num_neighbours(csr, window)
    return float(c.mean()) if len(c) else 0.0


def cross_row_stats(csr: CSRMatrix, window: int = 1):
    """(cross_row_similarity_avg, cross_row_neighbours_per_nnz).

    similarity: per non-empty row, fraction of its nnz matched (>=1 nnz in
    the next non-empty row within +-window); averaged over non-empty rows
    that HAVE a next non-empty row (csr_util_gen.c:553-611).
    neighbours: total matches per nnz (:495-545).
    """
    csr = _sorted_csr(csr)
    d = row_degrees(csr)
    nonempty = np.flatnonzero(d > 0)
    if len(nonempty) < 2:
        return 0.0, 0.0
    col = csr.col_idx.astype(np.int64)
    rp = csr.row_ptr.astype(np.int64)

    # next non-empty row for each non-empty row (except the last)
    src_rows = nonempty[:-1]
    dst_rows = nonempty[1:]

    # Map each nnz of a src row to its dst row's segment via a combined key.
    stride = np.int64(csr.k + 2 * window + 2)
    key = np.repeat(np.arange(csr.m, dtype=np.int64), d) * stride + col

    src_deg = d[src_rows]
    nnz_src_rows = np.repeat(src_rows, src_deg)
    nnz_dst_rows = np.repeat(dst_rows, src_deg)
    # columns of all nnz that belong to src rows:
    take = np.concatenate(
        [np.arange(rp[r], rp[r + 1]) for r in src_rows]
    ) if len(src_rows) else np.zeros(0, dtype=np.int64)
    c = col[take]

    q_lo = nnz_dst_rows * stride + c - window
    q_hi = nnz_dst_rows * stride + c + window
    lo = np.searchsorted(key, q_lo, side="left")
    hi = np.searchsorted(key, q_hi, side="right")
    matches = hi - lo                       # cross_row_neighbours per nnz
    matched = matches > 0

    # per-src-row fraction matched
    seg_ends = np.cumsum(src_deg)
    seg_starts = seg_ends - src_deg
    frac = np.add.reduceat(matched.astype(np.float64), seg_starts) / src_deg
    similarity = float(frac.mean())
    neigh = float(matches.mean()) if len(matches) else 0.0
    return similarity, neigh


def cross_row_similarity(csr: CSRMatrix, window: int = 1) -> float:
    return cross_row_stats(csr, window)[0]


def ngroups(csr: CSRMatrix, max_gap: int = 0):
    """Column grouping: runs of columns with gap <= max_gap
    (csr_util_gen.c:340-457 with max_gap_size=0 → consecutive runs).

    Returns (total_groups, avg_groups_per_nonempty_row, avg_group_size).
    """
    csr = _sorted_csr(csr)
    d = row_degrees(csr)
    nnz = csr.nnz
    if nnz == 0:
        return 0, 0.0, 0.0
    col = csr.col_idx.astype(np.int64)
    rows = np.repeat(np.arange(csr.m), d)
    new_group = np.ones(nnz, dtype=bool)
    same_row = rows[1:] == rows[:-1]
    new_group[1:] = ~same_row | (col[1:] - col[:-1] > max_gap + 1)
    total = int(new_group.sum())
    ne = int((d > 0).sum())
    return total, total / ne, nnz / total


@dataclasses.dataclass
class MatrixFeatures:
    """The feature vector carried through benchmark CSVs
    (spmv_bench.cpp:484-545 artificial-matrix schema)."""

    name: str
    m: int
    n: int
    nnz: int
    density: float
    mem_footprint: float          # MB, spmv_kernel.h:24 formula
    mem_range: str
    avg_nnz_per_row: float
    std_nnz_per_row: float
    min_nnz_per_row: int
    max_nnz_per_row: int
    avg_bw: float                 # mean row bandwidth (columns)
    std_bw: float
    avg_bw_scaled: float          # normalized by n (twin emission :963-980)
    std_bw_scaled: float
    avg_sc: float                 # scatter = degree/bw
    std_sc: float
    avg_sc_scaled: float
    std_sc_scaled: float
    skew: float                   # (max-avg)/avg
    avg_num_neighbours: float
    cross_row_similarity: float
    # r5 extension beyond the A.1 set: mean |row col-center - diagonal|,
    # normalized by n.  Row-local bandwidth (avg_bw) says nothing about
    # where the band SITS: narrow rows that wander across a wide diagonal
    # range occupy ~one 128^2 block each, and the bsr occupancy model
    # (costmodel._bsr_occupied_blocks) mispredicted them 15x (the
    # art_118387 bsr-vs-gell dispatch miss).  Defaults 0 so records
    # reconstructed from pre-r5 CSV rows keep the old behavior.
    avg_dd_scaled: float = 0.0

    def as_row(self) -> dict:
        return dataclasses.asdict(self)


_MEM_RANGES = [
    (4, "[4-32]"), (32, "[32-128]"), (128, "[128-512]"),
    (512, "[512-2048]"), (2048, "[2048-inf]"),
]


def _mem_range(mb: float) -> str:
    label = "[0-4]"
    for lo, lab in _MEM_RANGES:
        if mb >= lo:
            label = lab
    return label


def matrix_features(csr: CSRMatrix, name: str | None = None) -> MatrixFeatures:
    """Full structural feature report (``csr_matrix_features``,
    csr_util_gen.c:620-997)."""
    d = row_degrees(csr).astype(np.float64)
    bw = row_bandwidths(csr).astype(np.float64)
    sc = row_scatters(csr)
    avg_d = float(d.mean()) if csr.m else 0.0
    mb = csr.mem_footprint / (1 << 20)
    crs, _ = cross_row_stats(csr)
    n = max(csr.k, 1)
    return MatrixFeatures(
        name=name or csr.name,
        m=csr.m,
        n=csr.k,
        nnz=csr.nnz,
        density=csr.nnz / max(csr.m * csr.k, 1),
        mem_footprint=mb,
        mem_range=_mem_range(mb),
        avg_nnz_per_row=avg_d,
        std_nnz_per_row=float(d.std()),
        min_nnz_per_row=int(d.min()) if csr.m else 0,
        max_nnz_per_row=int(d.max()) if csr.m else 0,
        avg_bw=float(bw.mean()),
        std_bw=float(bw.std()),
        avg_bw_scaled=float(bw.mean()) / n,
        std_bw_scaled=float(bw.std()) / n,
        avg_sc=float(sc.mean()),
        std_sc=float(sc.std()),
        avg_sc_scaled=float(sc.mean()) / n,
        std_sc_scaled=float(sc.std()) / n,
        skew=(float(d.max()) - avg_d) / avg_d if avg_d > 0 else 0.0,
        avg_num_neighbours=avg_num_neighbours(csr),
        cross_row_similarity=crs,
        avg_dd_scaled=_avg_diag_dev(csr) / n,
    )


def _avg_diag_dev(csr: CSRMatrix) -> float:
    """Mean |row col-center - row * k/m| over non-empty rows (see
    MatrixFeatures.avg_dd_scaled)."""
    if csr.m == 0 or csr.nnz == 0:
        return 0.0
    d = np.diff(csr.row_ptr).astype(np.float64)
    sums = np.add.reduceat(csr.col_idx.astype(np.float64),
                           np.minimum(csr.row_ptr[:-1], csr.nnz - 1))
    sums[d == 0] = 0.0
    nz = d > 0
    centers = sums[nz] / d[nz]
    diag = np.arange(csr.m, dtype=np.float64)[nz] * (csr.k / max(csr.m, 1))
    return float(np.abs(centers - diag).mean())


def twin_params(csr: CSRMatrix, name: str | None = None, seed: int = 14) -> str:
    """Emit the 11-field generator parameter line for this matrix's twin —
    exactly the ``csr_matrix_features_validation`` print format
    (csr_util_gen.c:963-980): bw normalized by n, skew=(max-avg)/avg."""
    f = matrix_features(csr, name)
    return (
        f"{f.m} {f.n} {f.avg_nnz_per_row:.4f} {f.std_nnz_per_row:.4f} "
        f"normal random {f.avg_bw_scaled:.4f} {f.skew:.4f} "
        f"{f.avg_num_neighbours:.4f} {f.cross_row_similarity:.4f} {seed}"
        + (f" {f.name}" if f.name else "")
    )


# ---------------------------------------------------------------------------
# Histograms (ref: csr_util_gen.c:2065-2247 — degree/bandwidth/etc. histogram
# printers used for the paper's distribution plots)
# ---------------------------------------------------------------------------

def _histogram(values: np.ndarray, num_bins: int, log_scale: bool):
    values = np.asarray(values, dtype=np.float64)
    if len(values) == 0:
        return np.zeros(num_bins, dtype=np.int64), np.zeros(num_bins + 1)
    if log_scale:
        lo = max(float(values.min()), 0.0)
        hi = float(values.max())
        edges = np.unique(np.concatenate(
            [[lo], np.geomspace(max(lo, 0.5), max(hi, 1.0), num_bins)]))
        if len(edges) < 2:
            edges = np.array([lo, hi + 1.0])
        counts, edges = np.histogram(values, bins=edges)
        return counts, edges
    counts, edges = np.histogram(values, bins=num_bins)
    return counts, edges


def degree_histogram(csr: CSRMatrix, num_bins: int = 64,
                     log_scale: bool = True):
    """Histogram of nnz-per-row (counts, bin_edges)."""
    return _histogram(row_degrees(csr), num_bins, log_scale)


def bandwidth_histogram(csr: CSRMatrix, num_bins: int = 64,
                        log_scale: bool = True):
    """Histogram of per-row bandwidths (counts, bin_edges)."""
    return _histogram(row_bandwidths(csr), num_bins, log_scale)


def scatter_histogram(csr: CSRMatrix, num_bins: int = 64):
    """Histogram of per-row scatter = degree/bw (linear bins in [0,1])."""
    sc = row_scatters(csr)
    counts, edges = np.histogram(sc, bins=num_bins, range=(0.0, 1.0))
    return counts, edges
