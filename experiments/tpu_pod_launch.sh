#!/usr/bin/env bash
# Launch a multi-host rlx_tpu training run on a TPU pod slice.
# (Counterpart of the reference's SLURM template, experiments/slurm_experiment.sh.)
#
# Usage:
#   TPU_NAME=my-v5e-16 ZONE=us-west4-a ./tpu_pod_launch.sh \
#       --algorithm.name=ppo.tpu --environment.name=locomotion.ant.tpu \
#       --algorithm.total_timesteps=2000000000
#
# Each worker process runs the same command; JAX discovers the pod topology
# automatically on Cloud TPU VMs (jax.distributed.initialize with no
# arguments is implicit there), so no coordinator flags are needed.
set -euo pipefail

TPU_NAME=${TPU_NAME:?set TPU_NAME}
ZONE=${ZONE:?set ZONE}
REPO_DIR=${REPO_DIR:-"~/rlx_tpu"}

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all --command "
  cd $REPO_DIR && \
  python experiments/experiment.py $* \
    --runner.track_tb=True \
    --runner.save_model=True \
    --runner.save_optimizer_state=True
"
