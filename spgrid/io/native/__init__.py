"""ctypes loader for the native host library (build-on-demand).

The reference's data layer is native C (lib/storage_formats, lib/parallel_io,
lib/aux/csr_converter); this module builds and binds the C++ equivalent.
Falls back silently (returns None) when no compiler is available — the
numpy readers in spgrid.io remain the behavioral reference.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "spgrid_native.cpp")
_SO = os.path.join(_HERE, "libspgrid_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


class SgBsr(ctypes.Structure):
    _fields_ = [
        ("mb", ctypes.c_int64),
        ("kb", ctypes.c_int64),
        ("nb", ctypes.c_int64),
        ("bm", ctypes.c_int32),
        ("bk", ctypes.c_int32),
        ("block_row_ptr", ctypes.POINTER(ctypes.c_int32)),
        ("block_cols", ctypes.POINTER(ctypes.c_int32)),
        ("blocks", ctypes.POINTER(ctypes.c_float)),
    ]


class SgCsr(ctypes.Structure):
    _fields_ = [
        ("m", ctypes.c_int64),
        ("k", ctypes.c_int64),
        ("nnz", ctypes.c_int64),
        ("row_ptr", ctypes.POINTER(ctypes.c_int32)),
        ("col_idx", ctypes.POINTER(ctypes.c_int32)),
        ("values", ctypes.POINTER(ctypes.c_double)),
        ("field", ctypes.c_int32),
        ("symmetry", ctypes.c_int32),
        ("error", ctypes.c_char * 256),
    ]


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", _SRC, "-o", _SO,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=240)
        return res.returncode == 0 and os.path.exists(_SO)
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.sg_read_mtx.restype = ctypes.POINTER(SgCsr)
        lib.sg_read_mtx.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                    ctypes.c_double]
        lib.sg_read_smtx.restype = ctypes.POINTER(SgCsr)
        lib.sg_read_smtx.argtypes = [ctypes.c_char_p]
        lib.sg_free.argtypes = [ctypes.POINTER(SgCsr)]
        lib.sg_features.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
        ]
        # newer symbols may be absent from a stale prebuilt .so — degrade
        # to the numpy fallback instead of raising out of get_lib()
        if hasattr(lib, "sg_csr_to_bsr_f32"):
            lib.sg_csr_to_bsr_f32.restype = ctypes.POINTER(SgBsr)
            lib.sg_csr_to_bsr_f32.argtypes = [
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32, ctypes.c_int32,
            ]
            lib.sg_bsr_free.argtypes = [ctypes.POINTER(SgBsr)]
        _lib = lib
        return _lib


def csr_from_native(res, dtype, name):
    """Copy an SgCsr result into a host CSRMatrix and free the native side."""
    import numpy as np
    from spgrid.formats.csr import CSRMatrix

    r = res.contents
    err = bytes(r.error).split(b"\0", 1)[0]
    if err:
        msg = err.decode()
        get_lib().sg_free(res)
        raise ValueError(msg)
    m, k, nnz = r.m, r.k, r.nnz
    row_ptr = np.ctypeslib.as_array(r.row_ptr, shape=(m + 1,)).copy()
    col_idx = np.ctypeslib.as_array(r.col_idx, shape=(max(nnz, 1),))[:nnz].copy()
    values = np.ctypeslib.as_array(r.values, shape=(max(nnz, 1),))[:nnz] \
        .astype(dtype)
    get_lib().sg_free(res)
    return CSRMatrix(row_ptr, col_idx, values, (int(m), int(k)), name)


def read_mtx_native(path: str, expand_symmetry: bool = True,
                    pattern_dummy_value: float = 1.0, dtype="float32",
                    name: str = ""):
    lib = get_lib()
    if lib is None:
        return None
    res = lib.sg_read_mtx(str(path).encode(), int(expand_symmetry),
                          float(pattern_dummy_value))
    return csr_from_native(res, dtype, name)


def read_smtx_native(path: str, dtype="float32", name: str = ""):
    lib = get_lib()
    if lib is None:
        return None
    res = lib.sg_read_smtx(str(path).encode())
    return csr_from_native(res, dtype, name)


def features_native(csr):
    """12-element feature vector via the native extractor, or None."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros(12, dtype=np.float64)
    rp = np.ascontiguousarray(csr.row_ptr, dtype=np.int32)
    ci = np.ascontiguousarray(csr.col_idx, dtype=np.int32)
    lib.sg_features(
        csr.m, csr.k,
        rp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ci.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def csr_to_bsr_native(csr, bm: int, bk: int):
    """Native parallel CSR->BSR block build; returns
    (block_row_ptr, block_cols, blocks) numpy arrays or None.

    f32 values only (the device kernels' dtype); callers fall back to the
    numpy builder for other dtypes."""
    import numpy as np

    lib = get_lib()
    if lib is None or not hasattr(lib, "sg_csr_to_bsr_f32") \
            or csr.values.dtype != np.float32:
        return None
    rp = np.ascontiguousarray(csr.row_ptr, dtype=np.int32)
    ci = np.ascontiguousarray(csr.col_idx, dtype=np.int32)
    vv = np.ascontiguousarray(csr.values, dtype=np.float32)
    res = lib.sg_csr_to_bsr_f32(
        csr.m, csr.k,
        rp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ci.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(bm), int(bk))
    if not res:
        return None
    r = res.contents
    mb, nb = int(r.mb), int(r.nb)
    brp = np.ctypeslib.as_array(r.block_row_ptr, shape=(mb + 1,)).copy()
    bci = np.ctypeslib.as_array(r.block_cols, shape=(max(nb, 1),))[:nb].copy()
    blocks = np.ctypeslib.as_array(
        r.blocks, shape=(max(nb, 1), bm, bk))[:nb].copy()
    lib.sg_bsr_free(res)
    return brp, bci, blocks
