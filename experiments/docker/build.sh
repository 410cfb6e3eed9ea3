#!/usr/bin/env bash
# Build the rlx_tpu image from the repo root.
set -euo pipefail
cd "$(dirname "$0")/../.."
docker build -f experiments/docker/Dockerfile -t rlx_tpu:latest .
