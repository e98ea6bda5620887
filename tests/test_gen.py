import numpy as np
import pytest

from spgrid.gen import (
    artificial_matrix_generation, GenParams, create_mask, band_and_random,
    band_and_decay, synthetic_dataset, validation_twins, rows_for_footprint_mb,
)
from spgrid.features import matrix_features


def gen(**kw):
    defaults = dict(
        nr_rows=4000, nr_cols=4000, avg_nnz_per_row=10, std_nnz_per_row=3,
        distribution="normal", seed=14, placement="random", bw=0.1,
        skew=0.0, avg_num_neighbours=0.05, cross_row_similarity=0.05,
    )
    defaults.update(kw)
    return artificial_matrix_generation(**defaults)


def test_deterministic():
    a = gen()
    b = gen()
    np.testing.assert_array_equal(a.col_idx, b.col_idx)
    np.testing.assert_array_equal(a.values, b.values)
    c = gen(seed=15)
    assert not (len(c.col_idx) == len(a.col_idx)
                and np.array_equal(c.col_idx, a.col_idx))


def test_avg_nnz_target():
    csr = gen()
    f = matrix_features(csr)
    assert f.avg_nnz_per_row == pytest.approx(10, rel=0.15)
    assert f.std_nnz_per_row == pytest.approx(3, rel=0.4)


def test_bandwidth_target():
    for bw in (0.05, 0.3, 0.6):
        f = matrix_features(gen(bw=bw, avg_nnz_per_row=20, std_nnz_per_row=2))
        assert f.avg_bw_scaled == pytest.approx(bw, rel=0.30), bw


def test_skew_target():
    f = matrix_features(gen(skew=100, avg_nnz_per_row=5, std_nnz_per_row=1))
    assert f.skew == pytest.approx(100, rel=0.3)
    # max row is ~ avg*(1+skew)
    assert f.max_nnz_per_row == pytest.approx(5 * 101, rel=0.2)


def test_neighbours_target():
    for t in (0.05, 0.95, 1.9):
        f = matrix_features(gen(avg_num_neighbours=t, avg_nnz_per_row=20,
                                std_nnz_per_row=2, bw=0.3))
        assert f.avg_num_neighbours == pytest.approx(t, abs=0.25), t


def test_cross_row_similarity_target():
    for q in (0.05, 0.5, 0.95):
        f = matrix_features(gen(cross_row_similarity=q, avg_nnz_per_row=20,
                                std_nnz_per_row=2, bw=0.3))
        assert f.cross_row_similarity == pytest.approx(q, abs=0.2), q


def test_gamma_distribution():
    csr = gen(distribution="gamma", avg_nnz_per_row=8, std_nnz_per_row=6)
    f = matrix_features(csr)
    assert f.avg_nnz_per_row == pytest.approx(8, rel=0.3)
    # gamma with std ~ avg is right-skewed: max >> avg
    assert f.max_nnz_per_row > 2 * f.avg_nnz_per_row


def test_placements():
    for placement in ("random", "diagonal", "simple"):
        csr = gen(placement=placement)
        assert csr.nnz > 0
    # 'simple' packs consecutively: high neighbour count
    f = matrix_features(gen(placement="simple", avg_num_neighbours=1.9))
    assert f.avg_num_neighbours > 1.0


def test_param_line_roundtrip():
    line = "65535 65535 5 1.6667 normal random 0.05 0 0.05 0.05 14"
    p = GenParams.from_line(line)
    assert p.to_line() == line
    csr = artificial_matrix_generation(**p.kwargs())
    assert csr.shape == (65535, 65535)
    f = matrix_features(csr)
    assert f.avg_nnz_per_row == pytest.approx(5, rel=0.2)


def test_synthetic_dataset_grid():
    params = synthetic_dataset(
        mem_ranges_mb=((4, 32),), matrices_per_mem_range=1,
        avg_nnz_per_row_list=(5,), avg_bw_list=(0.05, 0.3),
        skew_list=(0,), neigh_list=(0.05,), crs_list=(0.05,),
    )
    assert len(params) == 2
    assert params[0].nr_rows == rows_for_footprint_mb(4, 5)


def test_validation_twins():
    f = matrix_features(gen())
    twins = validation_twins(f, num_samples=4)
    assert len(twins) > 10
    assert all(t.distribution == "normal" for t in twins)


def test_mask_band_and_random():
    m = band_and_random(256, sparsity=0.9, band_size=4, seed=14)
    nnz = int(m.sum())
    assert nnz == pytest.approx(0.1 * 256 * 256, rel=0.01)
    # band present
    assert m.diagonal().all()
    # deterministic
    m2 = band_and_random(256, sparsity=0.9, band_size=4, seed=14)
    np.testing.assert_array_equal(m, m2)


def test_mask_band_and_decay_concentrates_near_diagonal():
    m = band_and_decay(256, sparsity=0.9, band_size=4, seed=14)
    i, j = np.nonzero(m)
    d = np.abs(i - j)
    off = d[d >= 4]
    # decay: most off-band mass close to the band
    assert np.median(off) < 64


def test_create_mask_csr():
    csr = create_mask("band_and_random", 128, sparsity=0.5, seed=14)
    assert csr.shape == (128, 128)
    assert (csr.values == 1.0).all()


def test_calibrate_nnz_trims_overshoot():
    """r5 (VERDICT r4 item 8): the twin study measured a systematic
    +15-18% avg-nnz overshoot; calibrate_nnz trims the generated matrix
    to round(m*avg) while the default stays byte-stable."""
    from spgrid.gen import artificial_matrix_generation
    kw = dict(nr_rows=20000, nr_cols=20000, avg_nnz_per_row=5.60788,
              std_nnz_per_row=4.39216, distribution="normal", seed=14,
              placement="random", bw=0.3, skew=0,
              avg_num_neighbours=0.8, cross_row_similarity=0.63)
    base = artificial_matrix_generation(**kw)
    cal = artificial_matrix_generation(**kw, calibrate_nnz=True)
    target = round(20000 * 5.60788)
    assert base.nnz > target * 1.05          # the bias being fixed
    assert abs(cal.nnz - target) <= target * 0.021
    # calibration must not disturb the default path
    again = artificial_matrix_generation(**kw)
    assert again.nnz == base.nnz
