"""Parameter-file handling for synthetic datasets.

The reference drives its synthetic datasets from text files of 11-field lines
(``matrix_generation_parameters/synthetic_matrices_medium_dataset.txt``,
line format: ``nr_rows nr_cols avg_nnz std_nnz distribution placement bw skew
neigh cross_row_sim seed``) and generates them with
``create_param_file.py:4-68`` (rows derived from a target CSR memory
footprint) and ``create_validation_twins_param_file.py`` (+-30% feature
sweeps around measured validation-matrix features, SURVEY A.2).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class GenParams:
    """One generator invocation = one 11-field parameter line."""

    nr_rows: int
    nr_cols: int
    avg_nnz_per_row: float
    std_nnz_per_row: float
    distribution: str
    placement: str
    bw: float
    skew: float
    avg_num_neighbours: float
    cross_row_similarity: float
    seed: int

    def to_line(self) -> str:
        def num(x: float) -> str:
            return f"{x:g}"
        return " ".join([
            str(self.nr_rows), str(self.nr_cols),
            num(self.avg_nnz_per_row), num(self.std_nnz_per_row),
            self.distribution, self.placement,
            num(self.bw), num(self.skew),
            num(self.avg_num_neighbours), num(self.cross_row_similarity),
            str(self.seed),
        ])

    @classmethod
    def from_line(cls, line: str) -> "GenParams":
        p = line.split()
        if len(p) < 11:
            raise ValueError(f"expected 11 fields, got {len(p)}: {line!r}")
        return cls(
            nr_rows=int(p[0]), nr_cols=int(p[1]),
            avg_nnz_per_row=float(p[2]), std_nnz_per_row=float(p[3]),
            distribution=p[4], placement=p[5],
            bw=float(p[6]), skew=float(p[7]),
            avg_num_neighbours=float(p[8]), cross_row_similarity=float(p[9]),
            seed=int(float(p[10])),
        )

    def kwargs(self) -> dict:
        return dataclasses.asdict(self)


def read_param_file(path: str) -> List[GenParams]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                out.append(GenParams.from_line(line))
    return out


def write_param_file(path: str, params: Sequence[GenParams]) -> None:
    with open(path, "w") as f:
        for p in params:
            f.write(p.to_line() + "\n")


def rows_for_footprint_mb(mb: float, avg_nnz_per_row: float) -> int:
    """nr_rows = (MB*2^20 - 4) / (12*avg_nnz_per_row + 4)
    (create_param_file.py:24-31: CSR bytes = 12*nnz + 4*(rows+1))."""
    return int(np.floor((mb * (1 << 20) - 4) / (12 * avg_nnz_per_row + 4)))


def synthetic_dataset(
    mem_ranges_mb: Sequence[tuple] = ((4, 32), (32, 512), (512, 2048)),
    matrices_per_mem_range: int = 5,
    avg_nnz_per_row_list: Sequence[float] = (5, 10, 20, 50, 100, 500),
    avg_bw_list: Sequence[float] = (0.05, 0.3, 0.6),
    distribution: str = "normal",
    placement: str = "random",
    skew_list: Sequence[float] = (0, 100, 1000, 10000, 100000),
    neigh_list: Sequence[float] = (0.05, 0.5, 0.95, 1.4, 1.9),
    crs_list: Sequence[float] = (0.05, 0.25, 0.5, 0.75, 0.95),
    seed: int = 14,
) -> List[GenParams]:
    """The full factorial grid of create_param_file.py:4-68 (deduplicated)."""
    seen = set()
    out: List[GenParams] = []
    for lo, hi in mem_ranges_mb:
        step = max(1, (hi - lo) // matrices_per_mem_range)
        sizes = [s - 1 for s in range(lo + 1, hi, step)][:matrices_per_mem_range]
        for size in sizes:
            for avg in avg_nnz_per_row_list:
                std = round(avg / 3, 4)
                rows = rows_for_footprint_mb(size, avg)
                for bw in avg_bw_list:
                    for skew in skew_list:
                        for neigh in neigh_list:
                            for crs in crs_list:
                                p = GenParams(rows, rows, avg, std,
                                              distribution, placement, bw,
                                              skew, neigh, crs, seed)
                                line = p.to_line()
                                if line not in seen:
                                    seen.add(line)
                                    out.append(p)
    return out


def validation_twins(
    features: "MatrixFeatures",
    num_samples: int = 10,
    span: float = 0.3,
    seed: int = 14,
) -> List[GenParams]:
    """Twin sweep: for each of the 7 features, hold the others at the
    measured value and sample the feature at ``num_samples`` points spanning
    +-span (create_validation_twins_param_file.py:119-133:
    ``scaling_list = linspace(0.7, 1.3, 10)``)."""
    base = GenParams(
        nr_rows=features.m, nr_cols=features.n,
        avg_nnz_per_row=round(features.avg_nnz_per_row, 4),
        std_nnz_per_row=round(features.std_nnz_per_row, 4),
        distribution="normal", placement="random",
        bw=round(features.avg_bw_scaled, 4),
        skew=round(features.skew, 4),
        avg_num_neighbours=round(features.avg_num_neighbours, 4),
        cross_row_similarity=round(features.cross_row_similarity, 4),
        seed=seed,
    )
    scales = np.linspace(1.0 - span, 1.0 + span, num_samples)
    seen = set()
    out: List[GenParams] = []

    def add(p: GenParams):
        line = p.to_line()
        if line not in seen:
            seen.add(line)
            out.append(p)

    for s in scales:
        add(dataclasses.replace(base,
                                nr_rows=max(1, int(base.nr_rows * s)),
                                nr_cols=max(1, int(base.nr_cols * s))))
        add(dataclasses.replace(base, avg_nnz_per_row=round(base.avg_nnz_per_row * s, 4)))
        add(dataclasses.replace(base, std_nnz_per_row=round(base.std_nnz_per_row * s, 4)))
        add(dataclasses.replace(base, bw=round(min(base.bw * s, 1.0), 4)))
        add(dataclasses.replace(base, skew=round(base.skew * s, 4)))
        add(dataclasses.replace(base, avg_num_neighbours=round(min(base.avg_num_neighbours * s, 1.99), 4)))
        add(dataclasses.replace(base, cross_row_similarity=round(min(base.cross_row_similarity * s, 1.0), 4)))
    return out
