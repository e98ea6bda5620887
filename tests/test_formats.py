import numpy as np
import pytest

from spgrid.formats import (
    CSRMatrix, COOMatrix, coo_to_csr, csr_to_coo, dense_to_csr, random_csr,
    csr_to_ell, ell_to_csr, csr_to_sell, sell_to_dense, csr_to_bsr, bsr_to_csr,
    balance_iterations, balance_prefix_sums, balance_mixed, merge_path_blocks,
)


@pytest.fixture
def csr():
    return random_csr(100, 80, density=0.05, seed=7)


def test_coo_csr_roundtrip(csr):
    coo = csr_to_coo(csr)
    back = coo_to_csr(coo)
    np.testing.assert_array_equal(back.row_ptr, csr.row_ptr)
    np.testing.assert_array_equal(back.col_idx, csr.col_idx)
    np.testing.assert_array_equal(back.values, csr.values)


def test_coo_to_csr_sums_duplicates():
    coo = COOMatrix(
        rows=np.array([0, 0, 1]), cols=np.array([1, 1, 0]),
        values=np.array([2.0, 3.0, 1.0], dtype=np.float32), shape=(2, 2),
    )
    csr = coo_to_csr(coo)
    assert csr.nnz == 2
    dense = csr.to_dense()
    np.testing.assert_allclose(dense, [[0, 5], [1, 0]])


def test_dense_roundtrip(csr):
    dense = csr.to_dense()
    back = dense_to_csr(dense)
    np.testing.assert_allclose(back.to_dense(), dense)


def test_mem_footprint_formula(csr):
    # nnz*(4+4) + (m+1)*4  (spmv_kernel.h:24 with f32/int32)
    assert csr.mem_footprint == csr.nnz * 8 + (csr.m + 1) * 4


def test_sort_columns():
    coo = COOMatrix(
        rows=np.array([0, 0, 0]), cols=np.array([5, 2, 9]),
        values=np.array([1.0, 2.0, 3.0], dtype=np.float32), shape=(1, 10),
    )
    csr = coo_to_csr(coo, sort_cols=False).sort_columns()
    np.testing.assert_array_equal(csr.col_idx, [2, 5, 9])
    np.testing.assert_allclose(csr.values, [2.0, 1.0, 3.0])


def test_ell_roundtrip(csr):
    ell = csr_to_ell(csr, pad_multiple=4)
    assert ell.width % 4 == 0
    np.testing.assert_allclose(ell_to_csr(ell).to_dense(), csr.to_dense())


def test_sell_roundtrip():
    # Skewed degrees exercise the bucketing.
    rng = np.random.default_rng(0)
    m, k = 200, 150
    dense = np.zeros((m, k), dtype=np.float32)
    for i in range(m):
        d = 1 + rng.integers(0, 5) if i % 50 else 100  # a few long rows
        cols = rng.choice(k, size=min(d, k), replace=False)
        dense[i, cols] = rng.standard_normal(len(cols))
    csr = dense_to_csr(dense)
    sell = csr_to_sell(csr, C=8, sigma=64)
    np.testing.assert_allclose(sell_to_dense(sell), dense)
    # sigma-sorting should keep padding well below plain ELL
    ell_padded = m * csr.degrees.max()
    assert sum(b.cols.size for b in sell.buckets) < ell_padded


def test_bsr_roundtrip(csr):
    bsr = csr_to_bsr(csr, bm=8, bk=16)
    np.testing.assert_allclose(bsr_to_csr(bsr).to_dense(), csr.to_dense())
    assert bsr.nnz == csr.nnz


def test_balance_iterations():
    b = balance_iterations(10, 3)
    np.testing.assert_array_equal(b, [0, 4, 7, 10])


def test_balance_prefix_sums_balances_nnz():
    # One huge row then uniform rows.
    row_ptr = np.array([0, 1000, 1001, 1002, 1003, 1004])
    b = balance_prefix_sums(row_ptr, 2)
    assert b[0] == 0 and b[-1] == 5
    assert (np.diff(b) >= 0).all()
    # First part should stop right after the huge row.
    assert b[1] == 1


def test_balance_mixed_monotone():
    row_ptr = np.cumsum([0] + [3] * 100)
    b = balance_mixed(row_ptr, 7)
    assert b[0] == 0 and b[-1] == 100
    assert (np.diff(b) >= 0).all()


def test_merge_path_blocks():
    row_ptr = np.array([0, 3, 3, 10, 12])
    first_row, nb = merge_path_blocks(row_ptr, block_nnz=4)
    assert nb == 3
    # block starts at nnz 0,4,8 -> rows 0,2,2
    np.testing.assert_array_equal(first_row, [0, 2, 2])


def test_spmm_sell_matches_gold():
    import jax.numpy as jnp
    from spgrid.gen.artificial import artificial_matrix_generation
    from spgrid.ops import dispatch

    csr = artificial_matrix_generation(900, 900, 7, 25.0, "gamma", seed=4,
                                       placement="random", bw=0.6)
    x = np.random.default_rng(0).standard_normal((900, 32)).astype(np.float32)
    a = dispatch.build(csr, "sell")
    y = np.asarray(dispatch.spmm_fn("sell")(a, jnp.asarray(x)), np.float64)
    rows = np.repeat(np.arange(csr.m), csr.degrees)
    gold = np.zeros((csr.m, 32))
    np.add.at(gold, rows, csr.values[:, None].astype(np.float64)
              * x.astype(np.float64)[csr.col_idx])
    assert np.allclose(y, gold, atol=1e-3, rtol=1e-4)
