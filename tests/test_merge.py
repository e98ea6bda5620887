"""Merge-path SpMM tests (SURVEY A.3 / spmv_kernel_csr.cpp:68-110)."""
import jax.numpy as jnp
import numpy as np

from spgrid.core.metrics import error_metrics
from spgrid.gen.artificial import artificial_matrix_generation
from spgrid.formats.csr import CSRMatrix
from spgrid.ops.merge import DeviceMerge, merge_spmm


def _gold(csr, x):
    rows = np.repeat(np.arange(csr.m), csr.degrees)
    out = np.zeros((csr.m, x.shape[1]), np.float64)
    np.add.at(out, rows,
              csr.values[:, None].astype(np.float64)
              * x.astype(np.float64)[csr.col_idx])
    return out


def test_merge_extreme_skew():
    # one monster row + singletons: equal-nnz blocks stay balanced
    m = 500
    deg = np.ones(m, np.int64)
    deg[7] = 4000
    row_ptr = np.concatenate([[0], np.cumsum(deg)])
    rng = np.random.default_rng(0)
    col = rng.integers(0, m, int(deg.sum()))
    val = rng.standard_normal(int(deg.sum())).astype(np.float32)
    csr = CSRMatrix(row_ptr, col, val, (m, m), "monster")
    x = rng.standard_normal((m, 32)).astype(np.float32)
    a = DeviceMerge.from_csr(csr, block_nnz=256)
    assert a.cols.shape[0] >= int(deg.sum()) // 256
    y = np.asarray(merge_spmm(a, jnp.asarray(x)), np.float64)
    em = error_metrics(_gold(csr, x), y, epsilon=1e-4)
    assert em.mape < 5e-5, em.mape


def test_merge_matches_generated():
    csr = artificial_matrix_generation(1500, 1500, 10, 50.0, "gamma",
                                       seed=5, placement="random", bw=0.8)
    x = np.random.default_rng(1).standard_normal((1500, 64)) \
        .astype(np.float32)
    y = np.asarray(merge_spmm(DeviceMerge.from_csr(csr), jnp.asarray(x)),
                   np.float64)
    em = error_metrics(_gold(csr, x), y, epsilon=1e-4)
    assert em.mape < 5e-5


def test_merge_rowcap_cut():
    # many empty rows force early cuts (block row span > 128)
    m = 3000
    deg = np.zeros(m, np.int64)
    deg[::37] = 2
    row_ptr = np.concatenate([[0], np.cumsum(deg)])
    rng = np.random.default_rng(2)
    col = rng.integers(0, m, int(deg.sum()))
    val = rng.standard_normal(int(deg.sum())).astype(np.float32)
    csr = CSRMatrix(row_ptr, col, val, (m, m), "sparse_rows")
    x = rng.standard_normal((m, 8)).astype(np.float32)
    y = np.asarray(merge_spmm(DeviceMerge.from_csr(csr), jnp.asarray(x)),
                   np.float64)
    em = error_metrics(_gold(csr, x), y, epsilon=1e-4)
    assert em.mape < 5e-5


def test_merge_via_dispatch():
    from spgrid.ops import dispatch
    csr = artificial_matrix_generation(800, 800, 6, 2.0, "normal", seed=9,
                                       placement="random", bw=0.3)
    a = dispatch.build(csr, "merge")
    fn = dispatch.spmm_fn("merge")
    x = np.random.default_rng(3).standard_normal((800, 16)) \
        .astype(np.float32)
    y = np.asarray(fn(a, jnp.asarray(x)), np.float64)
    em = error_metrics(_gold(csr, x), y, epsilon=1e-4)
    assert em.mape < 5e-5


def test_merge_chunked_scan_matches_single_shot(monkeypatch):
    """r5: giant-m merge scans over block chunks (the single-shot gathered
    intermediate was 8.6GB at 1M rows — OOM on the giant grid row).
    Forcing a tiny chunk budget must keep the result exact."""
    import numpy as np
    import jax.numpy as jnp
    import spgrid.ops.merge as merge_mod
    from spgrid.core.metrics import gold_spmm, error_metrics
    from spgrid.formats import random_csr
    csr = random_csr(3000, 3000, density=0.01, seed=5)
    csr.values = np.abs(csr.values) + 0.1
    a = merge_mod.DeviceMerge.from_csr(csr, block_nnz=64)
    x = np.random.default_rng(2).random((3000, 16), np.float32) + 0.5
    gold = gold_spmm(csr.row_ptr, csr.col_idx, csr.values, x)
    y1 = np.asarray(merge_mod.merge_spmm(a, jnp.asarray(x)))
    monkeypatch.setattr(merge_mod, "_CHUNK_BYTES", 1 << 12)   # ~4 blocks
    merge_mod._merge_spmm.clear_cache()
    y2 = np.asarray(merge_mod.merge_spmm(a, jnp.asarray(x)))
    monkeypatch.setattr(merge_mod, "_CHUNK_BYTES", 1 << 28)
    merge_mod._merge_spmm.clear_cache()
    assert error_metrics(gold, y1, epsilon=1e-4).passed
    assert error_metrics(gold, y2, epsilon=1e-4).passed
    np.testing.assert_allclose(y1, y2, rtol=1e-6, atol=1e-6)
