#!/usr/bin/env bash
# TPU-pod launcher (reference parity: big_vision/run_tpu.sh).
# Run the same command on every TPU VM worker, e.g.:
#   gcloud compute tpus tpu-vm ssh $NAME --worker=all \
#     --command="cd ~/repo && bash run_tpu.sh small_vision_tpu.cli \
#                --config ae_i1k.py:variant=B/4 --workdir gs://..."
#
# Unlike the reference (which builds a venv and pins jax[tpu]<=0.4.26), this
# assumes a working jax[tpu] install and only sets the runtime env.
set -euo pipefail

export TFDS_DATA_DIR="${TFDS_DATA_DIR:-$HOME/tensorflow_datasets}"
export JAX_PLATFORMS="${JAX_PLATFORMS:-}"
# Persistent XLA compile cache — big win on pod restarts.
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"

exec python3 -m "$@"
