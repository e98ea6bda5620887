import numpy as np
import pytest

from spgrid.core.metrics import error_metrics, kahan_sum, gold_spmm
from spgrid.formats import random_csr


def test_kahan_sum_beats_naive():
    # Classic catastrophic case: large + many tiny values.
    vals = np.array([1e16] + [1.0] * 1000 + [-1e16], dtype=np.float64)
    assert kahan_sum(vals) == pytest.approx(1000.0)


def test_error_metrics_identical():
    a = np.random.default_rng(0).standard_normal(100)
    m = error_metrics(a, a.copy(), epsilon=1e-10)
    assert m.passed
    assert m.mae == 0.0 and m.max_ae == 0.0 and m.mse == 0.0
    assert m.mape == 0.0 and m.smape == 0.0


def test_error_metrics_gate_fails_on_large_error():
    a = np.ones(10)
    f = a * 1.001
    m = error_metrics(a, f, epsilon=1e-7)
    assert not m.passed
    assert m.max_rel_diff == pytest.approx(1e-3, rel=1e-6)
    assert m.mape == pytest.approx(1e-3, rel=1e-6)


def test_error_metrics_small_absolute_ok():
    # Where |gold| <= eps the gate uses absolute difference.
    a = np.zeros(10)
    f = np.full(10, 1e-9)
    m = error_metrics(a, f, epsilon=1e-7)
    assert m.passed


def test_gold_spmm_matches_dense():
    csr = random_csr(50, 40, density=0.1, seed=3, dtype=np.float64)
    x = np.random.default_rng(1).standard_normal((40, 8))
    gold = gold_spmm(csr.row_ptr, csr.col_idx, csr.values, x)
    np.testing.assert_allclose(gold, csr.to_dense() @ x, rtol=1e-12)


def test_gold_spmm_vector():
    csr = random_csr(30, 30, density=0.2, seed=4, dtype=np.float64)
    x = np.random.default_rng(2).standard_normal(30)
    gold = gold_spmm(csr.row_ptr, csr.col_idx, csr.values, x)
    assert gold.shape == (30,)
    np.testing.assert_allclose(gold, csr.to_dense() @ x, rtol=1e-12)
