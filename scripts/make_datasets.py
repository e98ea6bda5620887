"""Emit the synthetic dataset parameter files.

Reference counterpart: ``matrix_generation_parameters/create_param_file.py``
and ``create_validation_twins_param_file.py`` — the medium/large factorial
grids (16,190 / 26,730 matrices) and the per-validation-matrix twin sweeps.

    python scripts/make_datasets.py --out matrix_generation_parameters \
        [--medium] [--large] [--twins matrix.mtx ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spgrid.gen.params import (  # noqa: E402
    synthetic_dataset, validation_twins, write_param_file,
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="matrix_generation_parameters")
    ap.add_argument("--medium", action="store_true",
                    help="emit synthetic_matrices_medium_dataset.txt")
    ap.add_argument("--large", action="store_true",
                    help="emit synthetic_matrices_large_dataset.txt")
    ap.add_argument("--twins", nargs="*", default=[],
                    help="matrix files to emit twin parameter sweeps for")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    if args.medium:
        params = synthetic_dataset()
        path = os.path.join(args.out, "synthetic_matrices_medium_dataset.txt")
        write_param_file(path, params)
        print(f"{path}: {len(params)} lines")
    if args.large:
        params = synthetic_dataset(
            mem_ranges_mb=((4, 32), (32, 512), (512, 2048), (2048, 8192)),
            matrices_per_mem_range=8)
        path = os.path.join(args.out, "synthetic_matrices_large_dataset.txt")
        write_param_file(path, params)
        print(f"{path}: {len(params)} lines")
    for mpath in args.twins:
        from spgrid.io import read_matrix
        from spgrid.features import matrix_features
        csr = read_matrix(mpath)
        twins = validation_twins(matrix_features(csr))
        name = os.path.splitext(os.path.basename(mpath))[0]
        path = os.path.join(args.out, f"{name}_twins.txt")
        write_param_file(path, twins)
        print(f"{path}: {len(twins)} lines")
    if not (args.medium or args.large or args.twins):
        print("nothing to do: pass --medium/--large/--twins", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
