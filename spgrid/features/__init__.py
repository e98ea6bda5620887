"""Structural & value feature extraction (ref: lib/storage_formats/csr_util)."""

from spgrid.features.structural import (
    MatrixFeatures,
    matrix_features,
    twin_params,
    row_degrees,
    col_degrees,
    row_bandwidths,
    row_scatters,
    num_neighbours,
    avg_num_neighbours,
    cross_row_stats,
    cross_row_similarity,
    ngroups,
    degree_histogram,
    bandwidth_histogram,
    scatter_histogram,
)

__all__ = [
    "MatrixFeatures", "matrix_features", "twin_params",
    "row_degrees", "col_degrees", "row_bandwidths", "row_scatters",
    "num_neighbours", "avg_num_neighbours", "cross_row_stats",
    "cross_row_similarity", "ngroups",
    "degree_histogram", "bandwidth_histogram", "scatter_histogram",
]

from spgrid.features.values import ValueFeatures, value_features, kmeans_1d  # noqa: E402

__all__ += ["ValueFeatures", "value_features", "kmeans_1d"]
