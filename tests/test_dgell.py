"""DMA-gather ELL kernel (ops/pallas/dgell.py): interpret-mode oracle."""
import numpy as np
import jax.numpy as jnp

from spgrid.formats import random_csr
from spgrid.ops.pallas.dgell import DeviceDGELL, dgell_spmm
from spgrid.core.metrics import gold_spmm_fast


def _check(csr, n=16, **kw):
    a = DeviceDGELL.from_csr(csr, **kw)
    rng = np.random.default_rng(0)
    x = (rng.random((csr.k, n)) + 0.5).astype(np.float32)
    y = np.asarray(dgell_spmm(a, jnp.asarray(x), interpret=True), np.float64)
    gold = gold_spmm_fast(csr.row_ptr, csr.col_idx, csr.values,
                          np.asarray(x, np.float64))
    # f32 kernel vs f64 gold: relative where gold is of term magnitude,
    # absolute at cancellation-prone elements (values carry signs)
    err = np.abs(y - gold)
    big = np.abs(gold) > 1e-2
    assert (err[big] / np.abs(gold[big])).max(initial=0) < 1e-4
    assert err.max() < 1e-4
    return a


def test_dgell_basic():
    csr = random_csr(200, 180, 0.03, seed=11)
    a = _check(csr)
    assert a.values.shape[0] % a.rb == 0


def test_dgell_tail_spill():
    # skewed degrees: heavy rows spill to the COO tail
    m = k = 160
    rng = np.random.default_rng(3)
    rows = [rng.choice(k, size=3, replace=False) for _ in range(m)]
    rows[7] = np.arange(64)          # deg 64 >> slots
    rows[100] = np.arange(40)
    ptr = np.zeros(m + 1, np.int64)
    cols = []
    for i, r in enumerate(rows):
        cols.append(np.sort(r))
        ptr[i + 1] = ptr[i] + len(r)
    cols = np.concatenate(cols).astype(np.int32)
    vals = (rng.random(len(cols)) + 0.5).astype(np.float32)
    from spgrid.formats import CSRMatrix
    csr = CSRMatrix(ptr, cols, vals, (m, k))
    a = _check(csr)
    assert a.tail_rows.shape[0] > 0


def test_dgell_nonmultiple_rows():
    csr = random_csr(203, 111, 0.05, seed=12)
    _check(csr)


def test_dgell_dispatch_registered():
    from spgrid.ops import dispatch
    assert "dgell" in dispatch.FORMATS
    csr = random_csr(96, 96, 0.04, seed=13)
    a = dispatch.build(csr, "dgell")
    fn = dispatch.spmm_fn("dgell")
    x = np.ones((96, 8), np.float32)
    y = np.asarray(fn(a, jnp.asarray(x)), np.float64)
    gold = gold_spmm_fast(csr.row_ptr, csr.col_idx, csr.values,
                          np.asarray(x, np.float64))
    assert np.abs(y - gold).max() < 1e-4


def test_dgell_fanout_cap():
    # rb shrinks so rb*slots stays near the measured DMA concurrency
    csr = random_csr(400, 400, 0.1, seed=14)   # avg deg ~40 -> slots ~50
    a = DeviceDGELL.from_csr(csr)
    assert a.rb * a.slots <= 512
    _check(csr)
