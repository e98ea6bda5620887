#!/bin/bash
#SBATCH --job-name=spgrid-sweep
#SBATCH --time=24:00:00
#SBATCH --nodes=1
#SBATCH --output=spgrid-sweep-%j.out
# TPU-pod analogue of the reference's cluster job scripts
# (benchmark_code/CPU/AMD/slurm.sh:1-25, pbs.sh): one independent sweep per
# job; multi-host runs instead launch one process per host with
# jax.distributed (see spgrid.dist.mesh.init_distributed) — set
# SPGRID_COORDINATOR / SPGRID_NUM_PROCESSES / SPGRID_PROCESS_ID from the
# scheduler's env if spanning hosts.

set -e
cd "$(dirname "$0")/.."
exec bash scripts/run_sweep_with_retry.sh
