import os
import numpy as np
import pytest

from spgrid.formats import random_csr
from spgrid.formats.reorder import (rcm, rcm_order, permute, degree_sort_order,
                                    shuffle_order)
from spgrid.features import matrix_features
from spgrid.core.energy import RaplMeter
from spgrid.gen import artificial_matrix_generation


def test_permute_preserves_content():
    csr = random_csr(50, 50, density=0.1, seed=1)
    perm = shuffle_order(csr, seed=2)
    p = permute(csr, perm)
    # P A P^T with same perm on cols: dense check
    d = csr.to_dense()
    np.testing.assert_allclose(p.to_dense(), d[np.ix_(perm, perm)])


def test_rcm_reduces_bandwidth():
    # random matrix shuffled from a banded one: RCM should recover low bw
    base = artificial_matrix_generation(400, 400, 6, 2, seed=14, bw=0.05)
    shuf = permute(base, shuffle_order(base, seed=3))
    f_shuf = matrix_features(shuf)
    rec = rcm(shuf)
    f_rec = matrix_features(rec)
    assert f_rec.avg_bw < f_shuf.avg_bw * 0.5
    assert rec.nnz == base.nnz


def test_rcm_order_is_permutation():
    csr = random_csr(100, 100, density=0.05, seed=4)
    order = rcm_order(csr)
    assert sorted(order) == list(range(100))


def test_degree_sort():
    csr = random_csr(60, 60, density=0.1, seed=5)
    order = degree_sort_order(csr)
    d = csr.degrees[order]
    assert (np.diff(d) <= 0).all()


def test_rapl_meter_graceful():
    meter = RaplMeter()
    if not meter.available:
        assert meter.paths == []
        return
    meter.start()
    meter.stop()
    assert meter.joules >= 0


def test_openfoam_reader(tmp_path):
    from spgrid.io.openfoam import read_openfoam_matrix_dir
    d = tmp_path / "mesh"
    d.mkdir()
    (d / "owner").write_text("4\n(\n0 0 1 2\n)\n")
    (d / "neighbour").write_text("4\n(\n1 2 2 3\n)\n")
    csr = read_openfoam_matrix_dir(str(d))
    assert csr.shape == (4, 4)
    dd = csr.to_dense()
    assert (np.diag(dd) > 0).all()
    assert dd[0, 1] != 0 and dd[1, 0] != 0  # face 0-1 both directions
    assert dd[2, 3] != 0 and dd[3, 2] != 0


def test_feature_cli(capsys):
    from spgrid.features.__main__ import main
    rc = main(["--generate", "200 200 5 1.6667 normal random 0.05 0 0.05 0.05 14",
               "--twin", "--json"])
    assert rc == 0
    import json
    out = json.loads(capsys.readouterr().out)
    assert out["m"] == 200 and "twin" in out
