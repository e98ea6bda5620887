"""Dataset registry & fetch helpers: SuiteSparse validation set + DLMC.

The reference validates on a 52-matrix SuiteSparse set
(``validation_matrices/get_validation_matrices.sh``) and benchmarks SpMM on
the DLMC pruned-transformer dataset.  This module carries the same matrix
registry, a fetch routine (network-gated: raises a clear error in
zero-egress environments), and cached-load helpers.
"""

from __future__ import annotations

import os
import tarfile
import urllib.request
from typing import List, Optional

SUITESPARSE_URL = "https://suitesparse-collection-website.herokuapp.com/MM"
DLMC_URL = ("https://storage.googleapis.com/sgk-sc2020/dlmc.tar.gz")

# group/name pairs of the reference validation set (get_validation_matrices.sh)
VALIDATION_MATRICES = [
    "Andrianov/mip1",
    "Belcastro/human_gene1",
    "Bodendiek/CurlCurl_2",
    "Boeing/pwtk",
    "Botonakis/thermomech_dK",
    "Bova/rma10",
    "DIMACS10/delaunay_n22",
    "DIMACS10/kron_g500-logn18",
    "DIMACS10/rgg_n_2_17_s0",
    "DNVS/shipsec1",
    "Dziekonski/dielFilterV2real",
    "Fluorem/PR02R",
    "Freescale/circuit5M",
    "GHS_psdef/audikw_1",
    "GHS_psdef/crankseg_2",
    "GHS_psdef/ldoor",
    "GenBank/kmer_V2a",
    "Gleich/wikipedia-20051105",
    "Gupta/gupta3",
    "Hamm/scircuit",
    "JGD_GL7d/GL7d20",
    "Kamvar/Stanford_Berkeley",
    "LAW/eu-2005",
    "LAW/in-2004",
    "MAWI/mawi_201512012345",
    "Mittelmann/rail4284",
    "Muite/Chebyshev4",
    "Oberwolfach/bone010",
    "PARSEC/Ga41As41H72",
    "PARSEC/Si41Ge41H72",
    "QCD/conf5_4-8x8-15",
    "Rajat/rajat30",
    "SNAP/com-Youtube",
    "SNAP/roadNet-TX",
    "SNAP/soc-LiveJournal1",
    "SNAP/sx-stackoverflow",
    "Sandia/ASIC_680k",
    "Simon/appu",
    "Simon/bbmat",
    "Simon/raefsky3",
    "TSOPF/TSOPF_RS_b2383",
    "TSOPF/TSOPF_RS_b300_c3",
    "VLSI/dgreen",
    "VLSI/radiation",
    "Williams/cant",
    "Williams/consph",
    "Williams/cop20k_A",
    "Williams/mac_econ_fwd500",
    "Williams/mc2depi",
    "Williams/pdb1HYS",
    "Williams/webbase-1M",
    "vanHeukelum/cage15",
]


def default_cache_dir() -> str:
    return os.environ.get(
        "SPGRID_DATA", os.path.join(os.path.expanduser("~"), ".spgrid_data"))


def fetch_validation_matrix(name: str, cache_dir: Optional[str] = None) -> str:
    """Download + extract one SuiteSparse matrix; returns the .mtx path.

    ``name`` is "Group/name" or bare "name" (resolved via the registry)."""
    if "/" not in name:
        matches = [e for e in VALIDATION_MATRICES if e.endswith("/" + name)]
        if not matches:
            raise KeyError(f"{name!r} not in the validation registry")
        name = matches[0]
    group, base = name.split("/", 1)
    cache = cache_dir or default_cache_dir()
    os.makedirs(cache, exist_ok=True)
    mtx = os.path.join(cache, base, f"{base}.mtx")
    if os.path.exists(mtx):
        return mtx
    url = f"{SUITESPARSE_URL}/{group}/{base}.tar.gz"
    tgz = os.path.join(cache, f"{base}.tar.gz")
    try:
        urllib.request.urlretrieve(url, tgz)
    except Exception as e:
        raise ConnectionError(
            f"cannot fetch {url} (offline environment?): {e}") from e
    with tarfile.open(tgz) as tf:
        tf.extractall(cache)
    os.unlink(tgz)
    if not os.path.exists(mtx):
        raise FileNotFoundError(f"extracted archive lacks {mtx}")
    return mtx


def load_validation_matrix(name: str, dtype="float32",
                           cache_dir: Optional[str] = None):
    """Fetch (if needed) + parse + sort columns (ref sort-mtx.cpp step)."""
    from spgrid.io import read_mtx

    path = fetch_validation_matrix(name, cache_dir)
    return read_mtx(path, dtype=dtype).sort_columns()


def validation_names() -> List[str]:
    return [e.split("/", 1)[1] for e in VALIDATION_MATRICES]
