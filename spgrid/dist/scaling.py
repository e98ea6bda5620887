"""Weak/strong scaling harness over mesh sizes.

BASELINE.json mandates nnz/s scaling efficiency measured at 1 chip, 1 host,
and N>=2 hosts with >=80% weak-scaling at 2+ hosts.  This harness runs the
row-partitioned SpMM over increasing mesh sizes and reports efficiency
relative to the single-device run; on a development box it runs on virtual
CPU devices, on a pod it spans real chips/hosts (same code path —
jax.distributed + Mesh over all processes).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from spgrid.core.timing import time_kernel_chained
from spgrid.dist.mesh import make_mesh, available_devices
from spgrid.dist.partition import partition_bsr
from spgrid.dist.spmm import make_dist_spmm
from spgrid.formats.csr import CSRMatrix


@dataclasses.dataclass
class ScalingPoint:
    num_devices: int
    m: int
    nnz: int
    time_s: float
    nnz_per_s: float
    gflops: float
    efficiency: float      # vs the 1-device point (weak: per-device rate)


def scaling_study(
    matrix_for: Callable[[int], CSRMatrix],
    device_counts: Sequence[int] = (1, 2, 4, 8),
    n: int = 512,
    mode: str = "weak",              # 'weak' | 'strong'
    x_partition: str = "replicated",
    use_pallas: bool = False,
    dtype: str = "float32",
    min_time_s: float = 0.3,
    seed: int = 14,
) -> List[ScalingPoint]:
    """Run the distributed SpMM at each device count.

    ``matrix_for(d)`` returns the matrix for a d-device run — for weak
    scaling it should grow rows ~proportionally to d; for strong scaling
    return the same matrix for every d.
    """
    points: List[ScalingPoint] = []
    if not device_counts:
        return points
    base_rate = None
    # One backend for every point: mixing the real chip for d=1 with
    # virtual CPU devices for d>1 would make efficiencies meaningless.
    pool = available_devices(max(device_counts))
    for d in device_counts:
        devices = pool[:d]
        if d > len(devices):
            break
        csr = matrix_for(d).astype(np.dtype(dtype))
        mesh = make_mesh(("data", "model"), shape=(1, d), devices=devices)
        sharded = partition_bsr(csr, d, bm=8, bk=128)
        fn = make_dist_spmm(mesh, sharded, x_partition=x_partition,
                            use_pallas=use_pallas, data_axis="data")
        rng = np.random.default_rng(seed)
        x = jnp.asarray((rng.random((csr.k, n)) + 0.5).astype(dtype))
        x = jax.device_put(x, NamedSharding(mesh, P(None, "data")))
        timed = time_kernel_chained(lambda xc: fn(xc), x,
                                    min_time_s=min_time_s)
        nnz_rate = csr.nnz / timed.time_per_iter_s
        if mode == "weak":
            rate_per_dev = nnz_rate / d
            if base_rate is None:
                base_rate = rate_per_dev
            eff = rate_per_dev / base_rate
        else:
            if base_rate is None:
                base_rate = nnz_rate
            eff = nnz_rate / (base_rate * d)
        points.append(ScalingPoint(
            num_devices=d, m=csr.m, nnz=csr.nnz,
            time_s=timed.time_per_iter_s,
            nnz_per_s=nnz_rate,
            gflops=2.0 * csr.nnz * n / timed.time_per_iter_s / 1e9,
            efficiency=eff,
        ))
    return points
