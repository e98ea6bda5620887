import numpy as np
import pytest

from spgrid.formats import dense_to_csr, random_csr
from spgrid.features import (
    row_degrees, col_degrees, row_bandwidths, row_scatters,
    num_neighbours, avg_num_neighbours, cross_row_stats, ngroups,
    matrix_features, twin_params,
)


def make(dense):
    return dense_to_csr(np.asarray(dense, dtype=np.float32))


def test_degrees_and_bandwidth():
    csr = make([
        [1, 0, 1, 0, 1],   # cols 0,2,4: deg 3, bw 4
        [0, 0, 0, 0, 0],   # empty
        [0, 1, 1, 0, 0],   # cols 1,2: deg 2, bw 1
    ])
    np.testing.assert_array_equal(row_degrees(csr), [3, 0, 2])
    np.testing.assert_array_equal(row_bandwidths(csr), [4, 0, 1])
    np.testing.assert_array_equal(col_degrees(csr), [1, 1, 2, 0, 1])
    np.testing.assert_allclose(row_scatters(csr), [3 / 4, 0, 2])


def test_num_neighbours_window1():
    # Row 0: cols 0,1,2 -> counts 1,2,1 ; row 1: cols 0,4 -> 0,0
    csr = make([
        [1, 1, 1, 0, 0],
        [1, 0, 0, 0, 1],
    ])
    np.testing.assert_array_equal(num_neighbours(csr), [1, 2, 1, 0, 0])
    assert avg_num_neighbours(csr) == pytest.approx(4 / 5)


def test_cross_row_similarity_simple():
    # Row0 cols {0,2}; row1 (next non-empty) cols {1}: col0 matches (|1-0|<=1),
    # col2 matches (|1-2|<=1) -> frac 1.0. Row1->row2 cols {4}: no match -> 0.
    csr = make([
        [1, 0, 1, 0, 0],
        [0, 1, 0, 0, 0],
        [0, 0, 0, 0, 1],
    ])
    sim, neigh = cross_row_stats(csr)
    assert sim == pytest.approx((1.0 + 0.0) / 2)


def test_cross_row_similarity_skips_empty_rows():
    csr = make([
        [1, 0, 0],
        [0, 0, 0],   # empty row is skipped: next non-empty of row0 is row2
        [1, 0, 0],
    ])
    sim, _ = cross_row_stats(csr)
    assert sim == pytest.approx(1.0)


def test_ngroups_consecutive_runs():
    csr = make([
        [1, 1, 0, 1, 1],   # 2 groups
        [1, 0, 1, 0, 1],   # 3 groups
    ])
    total, per_row, avg_size = ngroups(csr, max_gap=0)
    assert total == 5
    assert per_row == pytest.approx(2.5)
    assert avg_size == pytest.approx(7 / 5)


def test_matrix_features_fields():
    csr = random_csr(200, 200, density=0.02, seed=11)
    f = matrix_features(csr)
    assert f.nnz == csr.nnz
    assert f.density == pytest.approx(csr.nnz / 200 / 200)
    assert 0 <= f.avg_bw_scaled <= 1
    assert f.skew >= 0
    d = row_degrees(csr)
    assert f.skew == pytest.approx((d.max() - d.mean()) / d.mean())


def test_twin_params_format():
    csr = random_csr(100, 100, density=0.05, seed=1)
    line = twin_params(csr, name="t")
    parts = line.split()
    assert len(parts) == 12
    assert parts[0] == "100" and parts[4] == "normal" and parts[5] == "random"
    assert parts[10] == "14"


def test_avg_diag_dev_feature():
    """r5 diagonal-wander feature: 0 for a perfect diagonal, large for
    narrow rows placed far off-diagonal; robust to empty rows."""
    import numpy as np
    from spgrid.formats.csr import CSRMatrix, dense_to_csr
    from spgrid.features.structural import matrix_features, _avg_diag_dev
    eye = dense_to_csr(np.eye(64, dtype=np.float32))
    assert _avg_diag_dev(eye) == 0.0
    # all nnz in the last column: mean |63 - i| over i=0..63
    d = np.zeros((64, 64), np.float32)
    d[:, 63] = 1.0
    far = dense_to_csr(d)
    assert _avg_diag_dev(far) == np.abs(63 - np.arange(64)).mean()
    # trailing + interior empty rows
    row_ptr = np.array([0, 1, 1, 2, 2, 2], np.int32)
    csr = CSRMatrix(row_ptr, np.array([0, 4], np.int32),
                    np.ones(2, np.float32), (5, 5))
    f = matrix_features(csr)
    assert 0.0 <= f.avg_dd_scaled <= 1.0
    # empty matrix
    empty = CSRMatrix(np.zeros(6, np.int32), np.zeros(0, np.int32),
                      np.zeros(0, np.float32), (5, 5))
    assert _avg_diag_dev(empty) == 0.0
