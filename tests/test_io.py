import gzip
import numpy as np
import pytest

from spgrid.formats import random_csr, dense_to_csr
from spgrid.io import read_mtx, read_smtx, write_mtx, write_smtx, read_matrix
from spgrid.io.mtx import read_mtx_coo


def test_mtx_roundtrip(tmp_path):
    csr = random_csr(40, 30, density=0.1, seed=3)
    p = str(tmp_path / "a.mtx")
    write_mtx(p, csr)
    back = read_mtx(p, use_native=False)
    np.testing.assert_allclose(back.to_dense(), csr.to_dense(), rtol=1e-6)
    assert back.shape == (40, 30)


def test_mtx_native_matches_numpy(tmp_path):
    csr = random_csr(60, 60, density=0.08, seed=4)
    p = str(tmp_path / "b.mtx")
    write_mtx(p, csr)
    py = read_mtx(p, use_native=False)
    nat = read_mtx(p, use_native=True)
    np.testing.assert_array_equal(nat.row_ptr, py.row_ptr)
    np.testing.assert_array_equal(nat.col_idx, py.col_idx)
    np.testing.assert_allclose(nat.values, py.values, rtol=1e-6)


def test_mtx_symmetric_expansion(tmp_path):
    p = str(tmp_path / "sym.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("3 3 3\n1 1 2.0\n2 1 3.0\n3 2 4.0\n")
    for use_native in (False, True):
        csr = read_mtx(p, use_native=use_native)
        d = csr.to_dense()
        np.testing.assert_allclose(
            d, [[2, 3, 0], [3, 0, 4], [0, 4, 0]], err_msg=str(use_native))


def test_mtx_pattern(tmp_path):
    p = str(tmp_path / "pat.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write("2 2 2\n1 2\n2 1\n")
    for use_native in (False, True):
        csr = read_mtx(p, pattern_dummy_value=7.0, use_native=use_native)
        np.testing.assert_allclose(csr.to_dense(), [[0, 7], [7, 0]])


def test_mtx_gz(tmp_path):
    csr = random_csr(20, 20, density=0.2, seed=5)
    p = str(tmp_path / "c.mtx")
    write_mtx(p, csr)
    gz = p + ".gz"
    with open(p, "rb") as fi, gzip.open(gz, "wb") as fo:
        fo.write(fi.read())
    back = read_mtx(gz)
    np.testing.assert_allclose(back.to_dense(), csr.to_dense(), rtol=1e-6)


def test_smtx_roundtrip(tmp_path):
    csr = random_csr(25, 35, density=0.1, seed=6)
    p = str(tmp_path / "d.smtx")
    write_smtx(p, csr)
    for use_native in (False, True):
        back = read_smtx(p, value_fill="1.0", use_native=use_native)
        np.testing.assert_array_equal(back.row_ptr, csr.row_ptr)
        np.testing.assert_array_equal(back.col_idx, csr.col_idx)
        assert (back.values == 1.0).all()


def test_smtx_random_fill_deterministic(tmp_path):
    csr = random_csr(25, 35, density=0.1, seed=6)
    p = str(tmp_path / "e.smtx")
    write_smtx(p, csr)
    a = read_smtx(p, seed=14)
    b = read_smtx(p, seed=14)
    np.testing.assert_array_equal(a.values, b.values)


def test_read_matrix_dispatch(tmp_path):
    csr = random_csr(10, 10, density=0.3, seed=7)
    pm = str(tmp_path / "f.mtx")
    ps = str(tmp_path / "g.smtx")
    write_mtx(pm, csr)
    write_smtx(ps, csr)
    assert read_matrix(pm).shape == (10, 10)
    assert read_matrix(ps).shape == (10, 10)
    with pytest.raises(ValueError):
        read_matrix(str(tmp_path / "x.unknown"))


def test_native_features_match_python():
    from spgrid.io.native import features_native
    from spgrid.features import matrix_features
    csr = random_csr(200, 150, density=0.05, seed=8).sort_columns()
    out = features_native(csr)
    if out is None:
        pytest.skip("native lib unavailable")
    f = matrix_features(csr)
    assert out[0] == pytest.approx(f.avg_nnz_per_row, rel=1e-9)
    assert out[3] == pytest.approx(f.max_nnz_per_row)
    assert out[4] == pytest.approx(f.avg_bw, rel=1e-9)
    assert out[8] == pytest.approx(f.avg_num_neighbours, rel=1e-9)
    assert out[9] == pytest.approx(f.cross_row_similarity, rel=1e-9)


def test_csr_to_bsr_native_matches_numpy():
    from spgrid.formats import random_csr
    from spgrid.formats.bsr import csr_to_bsr
    from spgrid.io.native import get_lib, csr_to_bsr_native

    if get_lib() is None:
        import shutil
        if shutil.which("g++"):
            raise AssertionError(
                "native library failed to BUILD despite g++ present — "
                "fallback would silently mask the breakage")
        import pytest
        pytest.skip("no native toolchain")
    csr = random_csr(500, 700, 0.02, seed=9)
    nat = csr_to_bsr_native(csr, 8, 128)
    assert nat is not None, "native path unexpectedly unavailable"
    b = csr_to_bsr(csr, bm=8, bk=128, use_native=False)
    np.testing.assert_array_equal(nat[0], b.block_row_ptr)
    np.testing.assert_array_equal(nat[1], b.block_col_idx)
    np.testing.assert_array_equal(nat[2], b.blocks)


def test_read_mtx_array_format(tmp_path):
    import numpy as np
    from spgrid.io.mtx import read_mtx

    # general dense array, column-major values
    a = np.array([[1.0, 0.0], [2.0, 3.0], [0.0, 4.0]])
    p = tmp_path / "arr.mtx"
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix array real general\n")
        f.write("3 2\n")
        for j in range(2):
            for i in range(3):
                f.write(f"{a[i, j]}\n")
    csr = read_mtx(str(p), use_native=False)
    assert np.allclose(csr.to_dense(), a)

    # symmetric array: lower triangle column-major
    s = np.array([[2.0, 5.0], [5.0, 7.0]])
    p2 = tmp_path / "sym.mtx"
    with open(p2, "w") as f:
        f.write("%%MatrixMarket matrix array real symmetric\n")
        f.write("2 2\n")
        f.write("2.0\n5.0\n7.0\n")
    csr2 = read_mtx(str(p2), use_native=False)
    assert np.allclose(csr2.to_dense(), s)
