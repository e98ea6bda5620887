import numpy as np
import pytest
import jax.numpy as jnp

from spgrid.core.metrics import error_metrics, gold_spmm_fast
from spgrid.formats import random_csr
from spgrid.formats.wcoo import csr_to_wcoo
from spgrid.gen import artificial_matrix_generation
from spgrid.ops.pallas.wcoo_spmm import DeviceWCOO, wcoo_spmm


def check(gold, test, eps=1e-4):
    m = error_metrics(gold, np.asarray(test), epsilon=eps)
    assert m.passed, f"max_rel_diff={m.max_rel_diff}"


def test_wcoo_pack_roundtrip():
    csr = artificial_matrix_generation(300, 400, 8, 3, seed=14, bw=0.3)
    w = csr_to_wcoo(csr, W=64, R=128)
    # every nnz appears exactly once: rebuild dense
    W = 64
    dense = np.zeros((w.num_rowblocks * 128, ((400 + 63) // 64) * 64),
                     dtype=np.float32)
    vals2 = w.values.reshape(-1, W)
    rl2 = w.row_local.reshape(-1, W)
    cw2 = w.cols_in_window.reshape(-1, W)
    for c in range(w.num_chunks):
        rb, win, sub = (w.chunk_rowblock[c], w.chunk_window[c],
                        w.chunk_sub[c])
        nz = vals2[c] != 0
        r = rb * 128 + sub * W + rl2[c][nz]
        cc = win * 64 + cw2[c][nz]
        dense[r, cc] += vals2[c][nz]
    np.testing.assert_allclose(dense[:300, :400], csr.to_dense())
    assert 0 < w.utilization <= 1
    # chunks of one rowblock are consecutive
    rbs = w.chunk_rowblock
    firsts = np.flatnonzero(w.chunk_first)
    assert (np.diff(rbs)[np.diff(rbs) != 0] > 0).all() or len(rbs) == 1


@pytest.mark.parametrize("shape,W,R", [((300, 400), 64, 128),
                                       ((257, 130), 128, 256),
                                       ((64, 64), 32, 64)])
def test_wcoo_spmm_matches_gold(shape, W, R):
    m, k = shape
    csr = artificial_matrix_generation(m, k, 6, 2, seed=14, bw=0.5)
    x = (np.random.default_rng(0).random((k, 48)) + 0.5).astype(np.float32)
    gold = gold_spmm_fast(csr.row_ptr, csr.col_idx, csr.values, x)
    a = DeviceWCOO.from_csr(csr, R=R, W=W)
    y = wcoo_spmm(a, jnp.asarray(x), interpret=True)
    check(gold, y)


def test_wcoo_spmv():
    csr = artificial_matrix_generation(200, 300, 10, 3, seed=14, bw=0.2)
    x = (np.random.default_rng(0).random(300) + 0.5).astype(np.float32)
    gold = gold_spmm_fast(csr.row_ptr, csr.col_idx, csr.values, x)
    a = DeviceWCOO.from_csr(csr, R=128, W=128)
    y = wcoo_spmm(a, jnp.asarray(x), interpret=True)
    assert y.shape == (200,)
    check(gold, y)


def test_wcoo_empty_rows_and_duplicated_windows():
    # rows spanning many windows + empty rows
    dense = np.zeros((40, 256), dtype=np.float32)
    dense[0, [0, 100, 200, 255]] = [1, 2, 3, 4]
    dense[39, [5, 130]] = [7, 8]
    from spgrid.formats import dense_to_csr
    csr = dense_to_csr(dense)
    x = (np.random.default_rng(1).random((256, 16)) + 0.5).astype(np.float32)
    gold = dense.astype(np.float64) @ x
    a = DeviceWCOO.from_csr(csr, R=64, W=32)
    y = wcoo_spmm(a, jnp.asarray(x), interpret=True)
    check(gold, y)


def test_wcoo_aligned_spmv():
    from spgrid.ops.pallas.wcoo_spmv import DeviceWCOOAligned, wcoo_spmv
    csr = artificial_matrix_generation(500, 700, 10, 3, seed=14, bw=0.4)
    x = (np.random.default_rng(0).random(700) + 0.5).astype(np.float32)
    gold = gold_spmm_fast(csr.row_ptr, csr.col_idx, csr.values, x)
    a = DeviceWCOOAligned.from_csr(csr)
    y = wcoo_spmv(a, jnp.asarray(x), interpret=True)
    assert y.shape == (500,)
    check(gold, y)
    assert 0 < a.utilization <= 1


def test_wcoo_aligned_spmv_collisions():
    # dense-ish row forces depth layers (same row, same window collisions)
    from spgrid.ops.pallas.wcoo_spmv import DeviceWCOOAligned, wcoo_spmv
    dense = np.zeros((200, 300), dtype=np.float32)
    dense[7, :250] = np.arange(250) * 0.01 + 0.1   # 250 nnz in one row
    dense[100, [0, 1, 2]] = [1, 2, 3]
    from spgrid.formats import dense_to_csr
    csr = dense_to_csr(dense)
    x = (np.random.default_rng(1).random(300) + 0.5).astype(np.float32)
    gold = dense.astype(np.float64) @ x
    a = DeviceWCOOAligned.from_csr(csr)
    y = wcoo_spmv(a, jnp.asarray(x), interpret=True)
    check(gold, y)


def test_wrow_spmv():
    from spgrid.ops import DeviceWROW, wrow_spmv

    for m, k, d, seed in ((300, 500, 0.02, 1), (260, 130, 0.08, 2)):
        csr = random_csr(m, k, d, seed=seed)
        dev = DeviceWROW.from_csr(csr)
        x = np.random.default_rng(0).random(k).astype(np.float32)
        y = np.asarray(wrow_spmv(dev, jnp.asarray(x)))
        np.testing.assert_allclose(y, csr.to_dense() @ x, rtol=1e-4,
                                   atol=1e-5)


def test_wrow_empty_and_duplicate_structure():
    from spgrid.ops import DeviceWROW, wrow_spmv
    from spgrid.formats import dense_to_csr

    dense = np.zeros((200, 200), dtype=np.float32)
    dense[0, :150] = 1.0          # long row spanning two windows
    dense[199, 0] = 2.0           # far row
    csr = dense_to_csr(dense)
    dev = DeviceWROW.from_csr(csr)
    x = np.random.default_rng(1).random(200).astype(np.float32)
    y = np.asarray(wrow_spmv(dev, jnp.asarray(x)))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=1e-5)


def test_wrow_spmv_v2_matches_v1():
    # r4 block-stationary variant (ops/pallas/wrow_spmv.py::_kernel_v2):
    # same layout, accumulator carried across groups/steps, flushed per
    # target block — must agree with v1 and the dense gold exactly
    from spgrid.ops import DeviceWROW, wrow_spmv

    for m, k, d, seed in ((300, 500, 0.02, 1), (260, 130, 0.08, 2),
                          (64, 64, 0.2, 3)):
        csr = random_csr(m, k, d, seed=seed)
        dev = DeviceWROW.from_csr(csr)
        x = np.random.default_rng(0).random(k).astype(np.float32)
        y1 = np.asarray(wrow_spmv(dev, jnp.asarray(x), variant="v1"))
        y2 = np.asarray(wrow_spmv(dev, jnp.asarray(x), variant="v2"))
        np.testing.assert_allclose(y2, csr.to_dense() @ x, rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(y2, y1, rtol=1e-5, atol=1e-6)
