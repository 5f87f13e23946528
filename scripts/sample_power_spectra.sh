#!/usr/bin/env bash
# Sampling/validation launcher — the TPU analogue of the reference's
# power_spectra.sh SLURM wrapper (code/power_spectra.sh: 1 GPU, sbatch).
# Usage: ./scripts/sample_power_spectra.sh [model_path] [timesteps] [outdir]
set -euo pipefail
REPO_DIR="${REPO_DIR:-$(cd "$(dirname "$0")/.." && pwd)}"
cd "${REPO_DIR}"
python sample_power_spectra.py "$@"
