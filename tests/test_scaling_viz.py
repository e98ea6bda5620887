import numpy as np
import pytest

from spgrid.dist import scaling_study
from spgrid.features import value_features, kmeans_1d
from spgrid.gen import artificial_matrix_generation
from spgrid.formats import random_csr


def test_scaling_study_weak():
    def matrix_for(d):
        return artificial_matrix_generation(256 * d, 256, 8, 2, seed=14,
                                            bw=0.5, name=f"w{d}")
    pts = scaling_study(matrix_for, device_counts=(1, 2, 4), n=32,
                        mode="weak", min_time_s=0.05)
    assert len(pts) == 3
    assert pts[0].efficiency == pytest.approx(1.0)
    assert all(p.nnz_per_s > 0 for p in pts)


def test_scaling_study_strong():
    csr = artificial_matrix_generation(512, 256, 8, 2, seed=14, bw=0.5)
    pts = scaling_study(lambda d: csr, device_counts=(1, 2), n=32,
                        mode="strong", min_time_s=0.05)
    assert pts[0].efficiency == pytest.approx(1.0)
    assert len(pts) == 2


def test_kmeans_1d():
    v = np.concatenate([np.full(50, 1.0), np.full(50, 5.0)])
    centers, labels, inertia = kmeans_1d(v, k=2, seed=1)
    np.testing.assert_allclose(np.sort(centers), [1.0, 5.0])
    assert inertia == pytest.approx(0.0)


def test_value_features():
    csr = random_csr(100, 100, density=0.05, seed=9)
    f = value_features(csr.values)
    assert f.num_values == csr.nnz
    assert 0 < f.unique_fraction <= 1
    assert f.kmeans_rel_error_8 >= 0


def test_viz_plots(tmp_path):
    import pandas as pd
    from spgrid.viz import (plot_gflops_by_matrix, plot_feature_sweep,
                            plot_roofline, plot_scaling, spy)
    df = pd.DataFrame({
        "matrix_name": ["a", "a", "b", "b"],
        "kernel": ["k1", "k2", "k1", "k2"],
        "gflops": [10, 20, 15, 30],
        "gbytes_per_s": [100, 50, 80, 60],
        "skew": [0.1, 0.1, 10, 10],
    })
    assert plot_gflops_by_matrix(df, str(tmp_path / "g.png"))
    assert plot_feature_sweep(df, "skew", str(tmp_path / "f.png"))
    assert plot_roofline(df, str(tmp_path / "r.png"))

    from spgrid.dist.scaling import ScalingPoint
    pts = [ScalingPoint(d, 100, 1000, 0.1 / d, 1000 * d / 0.1, 1.0, 0.9)
           for d in (1, 2, 4)]
    assert plot_scaling(pts, str(tmp_path / "s.png"))

    csr = random_csr(300, 300, density=0.02, seed=10)
    assert spy(csr, str(tmp_path / "spy.png"))


def test_viz_cli(tmp_path):
    from spgrid.bench.schema import BenchRow, CSVWriter
    from spgrid.viz.__main__ import main

    p = tmp_path / "r.csv"
    w = CSVWriter(str(p))
    for i, kern in enumerate(["a", "b"]):
        w.write(BenchRow(matrix_name=f"m{i}", kernel=kern, gflops=10.0 + i,
                         gbytes_per_s=5.0, density=0.1 * (i + 1),
                         avg_nnz_per_row=4.0 + i))
    out = tmp_path / "plots"
    assert main([str(p), "--out-dir", str(out)]) == 0
    assert (out / "gflops_by_matrix.png").exists()
    assert (out / "roofline.png").exists()
    assert (out / "sweep_density.png").exists()


def test_dispatch_accuracy():
    import pandas as pd
    from spgrid.viz.dataset import dispatch_accuracy

    df = pd.DataFrame({
        "matrix_name": ["a"] * 3 + ["b"] * 3,
        "kernel": ["auto", "gell", "dense"] * 2,
        "gflops": [95.0, 100.0, 50.0,      # a: auto within 10% of best
                   40.0, 100.0, 80.0],     # b: auto far below best
        "errors_passed": [1] * 6,
    })
    frac, detail = dispatch_accuracy(df)
    assert frac == 0.5
    assert len(detail) == 2
