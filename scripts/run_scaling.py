"""Scaling study driver: weak+strong curves + plot.

On a dev box this runs on virtual CPU devices (set
XLA_FLAGS=--xla_force_host_platform_device_count=8); on a pod slice it
spans the real chips — same code path (BASELINE.json: nnz/s efficiency at
1 chip / 1 host / N hosts, >=80% weak-scaling at 2+ hosts).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spgrid.dist.scaling import scaling_study  # noqa: E402
from spgrid.gen import artificial_matrix_generation  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "benchmark_results",
                   "scaling")


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = 4096

    def weak(d):
        return artificial_matrix_generation(
            rows * d, rows, 64, 8, "normal", seed=14, placement="random",
            bw=0.2, name=f"weak_{d}")

    def strong(_d):
        return artificial_matrix_generation(
            rows * 4, rows, 64, 8, "normal", seed=14, placement="random",
            bw=0.2, name="strong")

    # comm-volume accounting: halo vs all-gather X movement at 8 devices
    # (time on virtual CPU devices can't prove the advantage — one core
    # under the mesh — so the byte column carries the claim for a pod run)
    with open(os.path.join(OUT, "comm_bytes.csv"), "w") as f:
        f.write("x_partition,num_devices,comm_bytes,device_kind\n")
        for part in ("row_sharded", "halo"):
            pts = scaling_study(weak, device_counts=(8,), n=256,
                                mode="weak", x_partition=part)
            for p in pts:
                f.write(f"{part},{p.num_devices},{p.comm_bytes},"
                        f"{p.device_kind}\n")

    for mode, mk in (("weak", weak), ("strong", strong)):
        pts = scaling_study(mk, device_counts=(1, 2, 4, 8), n=256, mode=mode)
        with open(os.path.join(OUT, f"{mode}.csv"), "w") as f:
            f.write("num_devices,m,nnz,time_s,nnz_per_s,gflops,efficiency,"
                    "comm_bytes,device_kind\n")
            for p in pts:
                f.write(f"{p.num_devices},{p.m},{p.nnz},{p.time_s},"
                        f"{p.nnz_per_s},{p.gflops},{p.efficiency},"
                        f"{p.comm_bytes},{p.device_kind}\n")
            print(mode, [round(p.efficiency, 3) for p in pts])
        try:
            from spgrid.viz import plot_scaling
            plot_scaling(pts, os.path.join(OUT, f"{mode}.png"))
        except Exception as e:
            print(f"plotting failed: {e}")


if __name__ == "__main__":
    main()
