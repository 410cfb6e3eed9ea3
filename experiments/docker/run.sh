#!/usr/bin/env bash
# Run an experiment in the container on a TPU VM.
# TPU access needs --privileged + host network for libtpu; runs/ is mounted
# so checkpoints and logs land on the host.
set -euo pipefail
mkdir -p runs
docker run --rm -it \
    --privileged --net=host \
    -v "$(pwd)/runs:/rlx_tpu_ws/rlx_tpu/runs" \
    rlx_tpu:latest "$@"
