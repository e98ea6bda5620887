"""DLMC .smtx reader — CSR-native text format of the pruned-transformer
dataset.

Format (ref ``lib/storage_formats/dlcm_matrices/dlcm_matrix.h:29-57``
``smtx_read`` → struct {m, k, nnz, R, C, V}):
  line 1: "m, k, nnz"   (comma separated)
  line 2: m+1 row-pointer ints
  line 3: nnz column indices
No values are stored (the dataset is pruning masks); the reference fills
them synthetically — here deterministically seeded uniform [0.5, 1.5) by
default, or a constant.
"""

from __future__ import annotations

import gzip
import numpy as np

from spgrid.formats.csr import CSRMatrix, IDX_DTYPE


def read_smtx(path: str, dtype=np.float32, value_fill: str = "random",
              seed: int = 14, use_native: bool = True) -> CSRMatrix:
    if use_native and not str(path).endswith(".gz"):
        from spgrid.io import native
        from spgrid.io.mtx import _basename
        try:
            csr = native.read_smtx_native(path, dtype, name=_basename(path))
        except ValueError:
            csr = None
        if csr is not None:
            if value_fill == "random":
                rng = np.random.default_rng(seed)
                csr.values = (rng.random(csr.nnz) + 0.5).astype(dtype)
            else:
                csr.values = np.full(csr.nnz, float(value_fill), dtype=dtype)
            return csr
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rt") as f:
        head = f.readline().replace(",", " ").split()
        m, k, nnz = int(head[0]), int(head[1]), int(head[2])
        row_ptr = np.array(f.readline().split(), dtype=np.int64)
        col_idx = np.array(f.readline().split(), dtype=IDX_DTYPE) \
            if nnz else np.zeros(0, dtype=IDX_DTYPE)
    if len(row_ptr) != m + 1:
        raise ValueError(f"{path}: row_ptr length {len(row_ptr)} != m+1={m + 1}")
    if row_ptr[-1] != nnz or len(col_idx) != nnz:
        raise ValueError(f"{path}: nnz mismatch ({row_ptr[-1]} vs {nnz} vs "
                         f"{len(col_idx)})")
    if value_fill == "random":
        rng = np.random.default_rng(seed)
        vals = (rng.random(nnz) + 0.5).astype(dtype)
    else:
        vals = np.full(nnz, float(value_fill), dtype=dtype)
    from spgrid.io.mtx import _basename
    return CSRMatrix(row_ptr.astype(IDX_DTYPE), col_idx, vals, (m, k),
                     name=_basename(path))


def write_smtx(path: str, csr: CSRMatrix) -> None:
    with open(path, "w") as f:
        f.write(f"{csr.m}, {csr.k}, {csr.nnz}\n")
        f.write(" ".join(str(int(v)) for v in csr.row_ptr) + "\n")
        f.write(" ".join(str(int(v)) for v in csr.col_idx) + "\n")
