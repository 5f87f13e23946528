#!/usr/bin/env bash
# TPU-VM launcher — the TPU-native analogue of the reference's SLURM wrapper
# (code/train_diffusion.sh: 1 node, 1 GPU, 24 h).  Runs the canonical trainer
# on every host of a TPU pod slice via `gcloud compute tpus tpu-vm ssh --worker=all`,
# or locally when no TPU_NAME is set.
#
# Usage:
#   ./scripts/launch_tpu.sh <lr> <epochs> <timesteps> <num_params>
# Env:
#   TPU_NAME   — TPU VM / slice name (omit to run on the local host)
#   ZONE       — GCP zone (required with TPU_NAME)
#   REPO_DIR   — path to this repo on the workers (default: ~/camels-diffusion-model_tpu)

set -euo pipefail

LR="${1:?usage: launch_tpu.sh <lr> <epochs> <timesteps> <num_params>}"
EPOCHS="${2:?}"
TIMESTEPS="${3:?}"
NUM_PARAMS="${4:?}"
REPO_DIR="${REPO_DIR:-\$HOME/camels-diffusion-model_tpu}"

CMD="cd ${REPO_DIR} && python train_diffusion.py ${LR} ${EPOCHS} ${TIMESTEPS} ${NUM_PARAMS}"

if [[ -n "${TPU_NAME:-}" ]]; then
  gcloud compute tpus tpu-vm ssh "${TPU_NAME}" \
    --zone="${ZONE:?set ZONE with TPU_NAME}" \
    --worker=all \
    --command="${CMD}"
else
  eval "${CMD}"
fi
