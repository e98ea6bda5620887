"""Multi-host distributed-SpMM smoke worker.

Run one copy per "host" (process); they federate over the coordinator and
execute the halo-exchange row-partitioned SpMM on a global mesh spanning
all processes — the jax.distributed/DCN path of SURVEY §5 "Distributed
communication backend", testable on CPU with gloo collectives:

    python scripts/multihost_smoke.py <pid> <nproc> <port> [devs_per_proc]

Exit code 0 and a final "MULTIHOST OK" line mean the full pipeline
(federation -> global mesh -> ppermute halo -> correctness vs dense gold)
passed on this process.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    dpp = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    # must run before any backend initializes (don't query devices first);
    # the platform re-update beats plugin sitecustomize overrides
    if os.environ["JAX_PLATFORMS"] == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", dpp)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from spgrid.dist.mesh import init_distributed
    init_distributed(coordinator=f"127.0.0.1:{port}", num_processes=nproc,
                     process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from spgrid.dist.partition import partition_bsr_halo
    from spgrid.dist.spmm import make_dist_spmm
    from spgrid.gen import artificial_matrix_generation
    from spgrid.core.metrics import gold_spmm_fast

    devs = jax.devices()
    S = len(devs)
    assert S == nproc * dpp, (S, nproc, dpp)
    mesh = Mesh(np.asarray(devs), ("model",))

    m = 128 * S
    csr = artificial_matrix_generation(m, m, 16, 4, "normal", seed=14,
                                       placement="random", bw=0.15,
                                       name="mh_band")
    sharded = partition_bsr_halo(csr, S, bm=8, bk=128)
    fn = make_dist_spmm(mesh, sharded, x_partition="halo", data_axis=None)
    x = np.random.default_rng(0).random((m, 64)).astype(np.float32)
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("model", None)))
    from jax.experimental import multihost_utils
    # the output is globally sharded; gather every process's shards
    y = np.asarray(multihost_utils.process_allgather(
        fn(xd), tiled=True))[:m]
    gold = gold_spmm_fast(csr.row_ptr, csr.col_idx, csr.values, x)
    err = float(np.abs(y - gold).max())
    assert err < 1e-3, err
    print(f"MULTIHOST OK proc={pid}/{nproc} devices={S} "
          f"halo=({sharded.halo_left},{sharded.halo_right}) err={err:.2e}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
