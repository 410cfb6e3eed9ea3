#!/usr/bin/env bash
# Container entrypoint: forward everything to the experiment CLI.
# With no args, print the registered names for discovery.
set -euo pipefail
cd /rlx_tpu_ws/rlx_tpu
if [ "$#" -eq 0 ]; then
    exec python experiments/experiment.py --runner.mode=show_config \
        --algorithm.name=ppo.tpu --environment.name=classic.pendulum.tpu
fi
exec python experiments/experiment.py "$@"
