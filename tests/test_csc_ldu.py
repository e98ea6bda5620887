"""CSC and LDU formats + kernels vs dense gold."""

import numpy as np
import jax.numpy as jnp
import pytest

from spgrid.formats import (
    CSRMatrix, random_csr, csr_to_csc, csc_to_csr, csr_to_ldu, ldu_to_csr,
)
from spgrid.ops import DeviceCSC, DeviceLDU, spmm_csc, spmv_csc, spmv_ldu, \
    spmm_ldu


def _sym_pattern_csr(n=64, seed=3, dtype=np.float32):
    """Square matrix with symmetric pattern, asymmetric values, full diag."""
    rng = np.random.default_rng(seed)
    a = (rng.random((n, n)) < 0.08).astype(dtype)
    pat = np.triu(a, 1)
    dense = pat * rng.standard_normal((n, n)).astype(dtype)
    dense = dense + (pat.T * rng.standard_normal((n, n)).astype(dtype))
    dense[np.arange(n), np.arange(n)] = rng.standard_normal(n).astype(dtype)
    from spgrid.formats import dense_to_csr
    return dense_to_csr(dense, name="sym"), dense


def test_csc_roundtrip():
    csr = random_csr(50, 70, 0.1, seed=1)
    csc = csr_to_csc(csr)
    assert csc.nnz == csr.nnz
    np.testing.assert_allclose(csc.to_dense(), csr.to_dense())
    back = csc_to_csr(csc)
    np.testing.assert_array_equal(back.row_ptr, csr.row_ptr)
    np.testing.assert_array_equal(back.col_idx, csr.col_idx)
    np.testing.assert_allclose(back.values, csr.values)


def test_csc_footprint():
    csr = random_csr(50, 70, 0.1, seed=1)
    csc = csr_to_csc(csr)
    assert csc.mem_footprint == csc.nnz * 8 + (csc.k + 1) * 4


def test_spmm_csc_matches_dense():
    csr = random_csr(60, 80, 0.07, seed=2)
    x = np.random.default_rng(0).random((80, 16), dtype=np.float64) \
        .astype(np.float32)
    dev = DeviceCSC.from_csr(csr)
    y = np.asarray(spmm_csc(dev, jnp.asarray(x)))
    np.testing.assert_allclose(y, csr.to_dense() @ x, rtol=1e-5, atol=1e-5)


def test_spmv_csc_matches_dense():
    csr = random_csr(60, 80, 0.07, seed=4)
    x = np.random.default_rng(1).random(80).astype(np.float32)
    y = np.asarray(spmv_csc(DeviceCSC.from_csr(csr), jnp.asarray(x)))
    np.testing.assert_allclose(y, csr.to_dense() @ x, rtol=1e-5, atol=1e-5)


def test_ldu_roundtrip():
    csr, dense = _sym_pattern_csr()
    ldu = csr_to_ldu(csr)
    assert ldu.nnz == csr.nnz
    back = ldu_to_csr(ldu)
    np.testing.assert_allclose(back.to_dense(), dense, rtol=1e-6)


def test_ldu_rejects_asymmetric_pattern():
    dense = np.zeros((4, 4), dtype=np.float32)
    dense[0, 2] = 1.0  # no (2, 0) partner
    dense[np.arange(4), np.arange(4)] = 1.0
    from spgrid.formats import dense_to_csr
    with pytest.raises(ValueError):
        csr_to_ldu(dense_to_csr(dense))


def test_spmv_ldu_matches_dense():
    csr, dense = _sym_pattern_csr(n=96, seed=7)
    dev = DeviceLDU.from_ldu(csr_to_ldu(csr))
    x = np.random.default_rng(2).standard_normal(96).astype(np.float32)
    y = np.asarray(spmv_ldu(dev, jnp.asarray(x)))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=1e-4)


def test_spmm_ldu_matches_dense():
    csr, dense = _sym_pattern_csr(n=48, seed=9)
    dev = DeviceLDU.from_ldu(csr_to_ldu(csr))
    x = np.random.default_rng(3).standard_normal((48, 8)).astype(np.float32)
    y = np.asarray(spmm_ldu(dev, jnp.asarray(x)))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=1e-4)


def test_dispatch_csc_ldu():
    from spgrid.ops.dispatch import build, spmm_fn
    csr, dense = _sym_pattern_csr(n=32, seed=11)
    x = np.random.default_rng(4).standard_normal((32, 4)).astype(np.float32)
    for fmt in ("csc", "ldu"):
        a = build(csr, fmt)
        y = np.asarray(spmm_fn(fmt)(a, jnp.asarray(x)))[:32]
        np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=1e-4)


def test_openfoam_ldu_reader(tmp_path):
    d = tmp_path / "mesh"
    d.mkdir()
    (d / "owner").write_text("4 ( 0 0 1 2 )")
    (d / "neighbour").write_text("4 ( 1 2 3 3 )")
    from spgrid.io.openfoam import read_openfoam_ldu, read_openfoam_matrix_dir
    ldu = read_openfoam_ldu(str(d))
    assert ldu.n_cells == 4 and ldu.n_faces == 4
    csr = read_openfoam_matrix_dir(str(d))
    np.testing.assert_allclose(ldu_to_csr(ldu).to_dense(), csr.to_dense())
