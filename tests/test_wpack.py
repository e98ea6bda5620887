"""Multi-row packed SpMV (ops/pallas/wpack_spmv.py) — gen-4 wrow layout.

Reference counterpart: the merge-based load-balanced SpMV family
(spmv_kernel_merge.cpp:61-65, A.3)."""
import numpy as np
import jax.numpy as jnp

from spgrid.core.metrics import gold_spmm, error_metrics
from spgrid.formats import random_csr
from spgrid.gen import artificial_matrix_generation
from spgrid.ops.pallas.wpack_spmv import (
    DeviceWPACK, wpack_spmv, csr_to_wpack, LANE,
)
from spgrid.ops.pallas.wrow_spmv import DeviceWROW


def _pos(csr):
    csr.values = np.abs(csr.values) + 0.1
    return csr


def _check(csr, eps=1e-4):
    x = np.random.default_rng(5).random(csr.k).astype(np.float32) + 0.5
    a = DeviceWPACK.from_csr(csr)
    y = wpack_spmv(a, jnp.asarray(x), interpret=True)
    gold = gold_spmm(csr.row_ptr, csr.col_idx, csr.values, x)
    m = error_metrics(gold, np.asarray(y), epsilon=eps)
    assert m.passed, f"max_rel_diff={m.max_rel_diff} util={a.utilization}"
    return a


def test_wpack_banded():
    csr = _pos(artificial_matrix_generation(
        1024, 1024, 20, 6, "normal", seed=14, placement="diagonal",
        bw=0.05, skew=0))
    _check(csr)


def test_wpack_scattered():
    csr = _pos(artificial_matrix_generation(
        1024, 1024, 8, 2.5, "normal", seed=14, placement="random", bw=0.9,
        skew=0))
    _check(csr)


def test_wpack_skewed():
    csr = _pos(artificial_matrix_generation(
        1024, 1024, 6, 2, "gamma", seed=14, placement="random", bw=0.9,
        skew=100))
    _check(csr)


def test_wpack_random_rect():
    csr = _pos(random_csr(700, 900, density=0.01, seed=3))
    _check(csr)


def test_wpack_single_and_empty_rows():
    # rows 0 and 2 empty; row 1 has 1 nnz; row 3 spans two windows
    row_ptr = np.array([0, 0, 1, 1, 4], np.int32)
    col_idx = np.array([7, 3, 130, 258], np.int32)
    values = np.array([2.0, 1.0, 3.0, 4.0], np.float32)
    from spgrid.formats.csr import CSRMatrix
    csr = CSRMatrix(row_ptr, col_idx, values, (4, 300))
    _check(csr)


def test_wpack_utilization_beats_wrow_on_scattered():
    """The layout's whole point: pieces pack nnz of MULTIPLE rows, so slot
    utilization must beat wrow's lane==row wiring on scattered structure
    (the r4 ablation: wrow util 0.144 at 20/row scattered)."""
    csr = _pos(artificial_matrix_generation(
        8192, 8192, 20, 6, "normal", seed=14, placement="random", bw=0.05,
        skew=0))
    wp = DeviceWPACK.from_csr(csr)
    wr = DeviceWROW.from_csr(csr)
    assert wp.utilization > 1.5 * wr.utilization, \
        (wp.utilization, wr.utilization)


def test_wpack_pack_invariants():
    csr = _pos(random_csr(600, 600, density=0.02, seed=9))
    (cols, vals, ends, starts, sel, pw, gsub, G, util,
     wsel) = csr_to_wpack(csr)
    assert cols.shape == vals.shape == ends.shape == starts.shape
    assert cols.shape[0] == 8 * G
    assert len(gsub) == G
    # piece base rows and selects stay inside the padded x2
    assert pw.max() + wsel - 1 <= -(-csr.k // (LANE * wsel)) * wsel - 1
    assert sel.max() <= wsel - 1
    assert gsub.max() <= -(-csr.m // LANE) - 1
    # values survive the packing exactly once
    assert np.isclose(vals.sum(), csr.values.sum(), rtol=1e-5)


def test_wpack_wide_windows():
    """wsel>1: under-filled 128-col runs merge into 2x/4x windows with a
    per-lane source-row select — both forced widths must stay exact."""
    csr = _pos(artificial_matrix_generation(
        4096, 4096, 5, 1.7, "normal", seed=14, placement="random", bw=0.9,
        skew=0))
    from spgrid.ops.pallas.wpack_spmv import pick_wsel, csr_to_wpack
    assert pick_wsel(csr) > 1    # sparse wide band: 128-col runs underfill
    x = np.random.default_rng(5).random(csr.k).astype(np.float32) + 0.5
    gold = gold_spmm(csr.row_ptr, csr.col_idx, csr.values, x)
    utils = {}
    for wsel in (2, 4):          # wsel=1 covered by the other tests
        a = DeviceWPACK.from_csr(csr, wsel=wsel)
        y = wpack_spmv(a, jnp.asarray(x), interpret=True)
        m = error_metrics(gold, np.asarray(y), epsilon=1e-4)
        assert m.passed, f"wsel={wsel} max_rel_diff={m.max_rel_diff}"
        utils[wsel] = a.utilization
    utils[1] = csr_to_wpack(csr, 1)[8]   # pack-only (no kernel run)
    assert utils[4] > utils[1]   # wider windows pack the sparse runs


def test_wpack_registered_in_dispatch():
    from spgrid.ops import dispatch
    assert "wpack_spmv" in dispatch.FORMATS
    csr = _pos(random_csr(300, 300, density=0.02, seed=4))
    a = dispatch.build(csr, "wpack_spmv")
    fn = dispatch.spmm_fn("wpack_spmv")
    x = np.random.default_rng(1).random((300, 1)).astype(np.float32)
    y = fn(a, jnp.asarray(x))
    gold = gold_spmm(csr.row_ptr, csr.col_idx, csr.values, x)
    assert error_metrics(gold, np.asarray(y), epsilon=1e-4).passed
    # SpMM misuse is rejected loudly (it would silently drop columns)
    import pytest
    with pytest.raises(ValueError):
        fn(a, jnp.asarray(np.zeros((300, 4), np.float32)))
