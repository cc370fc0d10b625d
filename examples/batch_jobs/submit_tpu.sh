#!/bin/bash
# TPU-pod batch submission (role-equivalent of the reference's SLURM
# submit_track.sh). Launches the detect+track batch jobs on every host of a
# TPU slice; jax.distributed joins them into one SPMD program.
#SBATCH --job-name=marex_tpu
#SBATCH --time=01:00:00

set -euo pipefail

export MAREX_INPUT=${MAREX_INPUT:-sst_global_daily.zarr}
export MAREX_PCTL=${MAREX_PCTL:-95}
export MAREX_R_FILL=${MAREX_R_FILL:-12}
export MAREX_T_FILL=${MAREX_T_FILL:-4}
export MAREX_AREA_FILTER=${MAREX_AREA_FILTER:-600}
export MAREX_OVERLAP=${MAREX_OVERLAP:-0.25}
export MAREX_GRID_RES=${MAREX_GRID_RES:-0.25}
export MAREX_QUIET=1

# persistent XLA compile cache shared across stages/rounds
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.xla_cache}

python examples/batch_jobs/run_detect.py
python examples/batch_jobs/run_track.py
