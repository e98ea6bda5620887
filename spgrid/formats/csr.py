"""Host-side CSR / COO containers and converters.

Reimplements the data layer of ``lib/storage_formats/csr`` and
``lib/aux/csr_converter_double.h`` (COO→CSR used at
``spmv_code_bench/spmv_bench.cpp:823``) as numpy containers.  These live on
the host; device layouts (ELL / SELL-C-sigma / BSR / padded CSR) are built
from them by the sibling modules.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


IDX_DTYPE = np.int32  # reference builds with INT_T=int32_t (make.sh:39-121)


@dataclasses.dataclass
class CSRMatrix:
    """Compressed sparse row matrix (host, numpy).

    ``mem_footprint`` follows spmv_kernel.h:24:
    ``nnz*(sizeof(val)+sizeof(idx)) + (m+1)*sizeof(idx)``.
    """

    row_ptr: np.ndarray   # (m+1,) int32
    col_idx: np.ndarray   # (nnz,)  int32
    values: np.ndarray    # (nnz,)  float
    shape: Tuple[int, int]
    name: str = "csr"

    def __post_init__(self):
        self.row_ptr = np.ascontiguousarray(self.row_ptr, dtype=IDX_DTYPE)
        self.col_idx = np.ascontiguousarray(self.col_idx, dtype=IDX_DTYPE)
        self.values = np.ascontiguousarray(self.values)
        m = self.shape[0]
        assert self.row_ptr.shape == (m + 1,), (self.row_ptr.shape, m)
        assert self.row_ptr[-1] == len(self.col_idx) == len(self.values)

    @property
    def m(self) -> int:
        return self.shape[0]

    @property
    def k(self) -> int:
        return self.shape[1]

    @property
    def nnz(self) -> int:
        return int(self.row_ptr[-1])

    @property
    def degrees(self) -> np.ndarray:
        return np.diff(self.row_ptr)

    @property
    def mem_footprint(self) -> int:
        vb = self.values.dtype.itemsize
        ib = self.col_idx.dtype.itemsize
        return self.nnz * (vb + ib) + (self.m + 1) * ib

    def sort_columns(self) -> "CSRMatrix":
        """Sort column indices within each row (ref: validation_matrices/
        sort-mtx.cpp — some kernels require sorted columns)."""
        col = self.col_idx.copy()
        val = self.values.copy()
        d = self.degrees
        # argsort within rows via a composite key (row-major order is kept).
        order = np.lexsort((col, np.repeat(np.arange(self.m), d)))
        return CSRMatrix(self.row_ptr, col[order], val[order], self.shape, self.name)

    def to_dense(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=self.values.dtype)
        rows = np.repeat(np.arange(self.m), self.degrees)
        out[rows, self.col_idx] = self.values
        return out

    def astype(self, dtype) -> "CSRMatrix":
        return CSRMatrix(self.row_ptr, self.col_idx,
                         self.values.astype(dtype), self.shape, self.name)


@dataclasses.dataclass
class COOMatrix:
    """Coordinate-format matrix (host, numpy) — the ``Matrix_Market`` analogue
    (lib/storage_formats/matrix_market/matrix_market.c:249 mtx_read output)."""

    rows: np.ndarray
    cols: np.ndarray
    values: np.ndarray
    shape: Tuple[int, int]
    name: str = "coo"

    def __post_init__(self):
        self.rows = np.ascontiguousarray(self.rows, dtype=IDX_DTYPE)
        self.cols = np.ascontiguousarray(self.cols, dtype=IDX_DTYPE)
        self.values = np.ascontiguousarray(self.values)

    @property
    def nnz(self) -> int:
        return len(self.values)


def coo_to_csr(coo: COOMatrix, *, sum_duplicates: bool = True,
               sort_cols: bool = True) -> CSRMatrix:
    """COO → CSR: sort by (row, col), optional duplicate folding, rowptr build.

    Mirrors ``coo_to_csr`` of lib/aux/csr_converter_double.h (sort + prefix
    rowptr) with numpy vectorization.
    """
    m, k = coo.shape
    if sort_cols:
        order = np.lexsort((coo.cols, coo.rows))
    else:
        order = np.argsort(coo.rows, kind="stable")
    rows = coo.rows[order]
    cols = coo.cols[order]
    vals = coo.values[order]
    if sum_duplicates and len(rows):
        key = rows.astype(np.int64) * k + cols
        uniq, inv = np.unique(key, return_inverse=True)
        if len(uniq) != len(rows):
            summed = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(summed, inv, vals.astype(np.float64))
            vals = summed.astype(vals.dtype)
            rows = (uniq // k).astype(IDX_DTYPE)
            cols = (uniq % k).astype(IDX_DTYPE)
    row_ptr = np.zeros(m + 1, dtype=np.int64)
    np.add.at(row_ptr, rows + 1, 1)
    row_ptr = np.cumsum(row_ptr)
    return CSRMatrix(row_ptr.astype(IDX_DTYPE), cols, vals, coo.shape, coo.name)


def csr_to_coo(csr: CSRMatrix) -> COOMatrix:
    rows = np.repeat(np.arange(csr.m, dtype=IDX_DTYPE), csr.degrees)
    return COOMatrix(rows, csr.col_idx.copy(), csr.values.copy(), csr.shape, csr.name)


def dense_to_csr(a: np.ndarray, name: str = "dense") -> CSRMatrix:
    rows, cols = np.nonzero(a)
    return coo_to_csr(
        COOMatrix(rows, cols, a[rows, cols], a.shape, name), sum_duplicates=False
    )


def random_csr(m: int, k: int, density: float, seed: int = 0,
               dtype=np.float32) -> CSRMatrix:
    """Uniform-random test matrix (for unit tests; the structured generator
    lives in spgrid.gen)."""
    rng = np.random.default_rng(seed)
    nnz = max(1, int(round(m * k * density)))
    flat = rng.choice(m * k, size=min(nnz, m * k), replace=False)
    rows = (flat // k).astype(IDX_DTYPE)
    cols = (flat % k).astype(IDX_DTYPE)
    vals = rng.standard_normal(len(flat)).astype(dtype)
    return coo_to_csr(COOMatrix(rows, cols, vals, (m, k), "random"),
                      sum_duplicates=False)
