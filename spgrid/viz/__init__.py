"""Results analysis & plotting (ref: results_visualization + lib/plot)."""

from spgrid.viz.plots import (
    load_results,
    plot_gflops_by_matrix,
    plot_feature_sweep,
    plot_roofline,
    plot_scaling,
    spy,
)

__all__ = ["load_results", "plot_gflops_by_matrix", "plot_feature_sweep",
           "plot_roofline", "plot_scaling", "spy"]

from spgrid.viz.dataset import merge_result_csvs, to_ml_dataset, twin_ape  # noqa: E402

__all__ += ["merge_result_csvs", "to_ml_dataset", "twin_ape"]
