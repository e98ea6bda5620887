"""Matrix IO: .mtx / .smtx readers (native C++ fast path + numpy fallback).

Ref: lib/storage_formats/{matrix_market,dlcm_matrices,openfoam}.
"""

from __future__ import annotations

import numpy as np

from spgrid.io.mtx import read_mtx, read_mtx_coo, write_mtx
from spgrid.io.smtx import read_smtx, write_smtx


def read_matrix(path: str, dtype="float32", **kw):
    """Dispatch on extension, like the reference driver's loader chain
    (spmv_bench.cpp:667-724: smtx_read / mtx_read / openfoam)."""
    p = str(path)
    base = p[:-3] if p.endswith(".gz") else p
    if base.endswith(".smtx"):
        return read_smtx(path, dtype=np.dtype(dtype), **kw)
    if base.endswith(".mtx"):
        return read_mtx(path, dtype=np.dtype(dtype), **kw)
    raise ValueError(f"unrecognized matrix file type: {path}")


from spgrid.io.datasets import (  # noqa: E402
    VALIDATION_MATRICES,
    fetch_validation_matrix,
    load_validation_matrix,
    validation_names,
)

__all__ = ["read_matrix", "read_mtx", "read_mtx_coo", "write_mtx",
           "read_smtx", "write_smtx", "VALIDATION_MATRICES",
           "fetch_validation_matrix", "load_validation_matrix",
           "validation_names"]
