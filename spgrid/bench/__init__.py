"""Benchmark harness: single runs, sweeps, CSV schema, CLI."""

from spgrid.bench.schema import BenchRow, CSVWriter
from spgrid.bench.harness import run_spmm, run_pipeline, make_x, KERNELS
from spgrid.bench.sweep import run_sweep, iter_matrices

__all__ = ["BenchRow", "CSVWriter", "run_spmm", "run_pipeline", "make_x",
           "KERNELS", "run_sweep", "iter_matrices"]
