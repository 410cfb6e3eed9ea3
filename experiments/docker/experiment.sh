#!/usr/bin/env bash
# Example: PPO on the device-resident Ant at locomotion scale.
exec "$(dirname "$0")/run.sh" \
    --runner.mode=train \
    --algorithm.name=ppo.tpu \
    --environment.name=locomotion.ant.tpu \
    --environment.nr_envs=4096 \
    --runner.track_console=True \
    --runner.save_model=True
