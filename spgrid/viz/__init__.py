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
