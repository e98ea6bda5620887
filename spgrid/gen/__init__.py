"""Matrix & mask generation (ref: artificial-matrix-generator, sddmm_mask.h)."""

from spgrid.gen.artificial import artificial_matrix_generation
from spgrid.gen.masks import (
    band_and_random,
    band_and_decay,
    create_mask,
    default_band_size,
    mask_mem_footprint,
)
from spgrid.gen.params import (
    GenParams,
    read_param_file,
    write_param_file,
    rows_for_footprint_mb,
    synthetic_dataset,
    validation_twins,
)

__all__ = [
    "artificial_matrix_generation",
    "band_and_random", "band_and_decay", "create_mask",
    "default_band_size", "mask_mem_footprint",
    "GenParams", "read_param_file", "write_param_file",
    "rows_for_footprint_mb", "synthetic_dataset", "validation_twins",
]


def generate(params: "GenParams", dtype=None):
    """Generate a matrix from a GenParams line."""
    import numpy as np
    kw = params.kwargs()
    if dtype is not None:
        kw["dtype"] = dtype
    return artificial_matrix_generation(**kw)
