#!/usr/bin/env bash
# SLURM template (parity with the reference's experiments/slurm_experiment.sh),
# for clusters that schedule TPU VM access through SLURM.
#SBATCH --job-name=rlx_tpu
#SBATCH --output=logs/%x_%j.out
#SBATCH --time=24:00:00
#SBATCH --ntasks=1

python experiments/experiment.py \
  --algorithm.name=ppo.tpu \
  --environment.name=locomotion.ant.tpu \
  --runner.mode=train \
  --runner.track_tb=True \
  --runner.save_model=True \
  --runner.save_optimizer_state=True \
  --algorithm.total_timesteps=10000
