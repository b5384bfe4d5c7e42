#!/usr/bin/env bash
# Resume one training stage from a checkpoint — the POSIX equivalent of the
# reference's windows_scripts/"Resume Training.bat".
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# outputs (datasets, runs/, .osz) land in the CALLER'S directory

read -rp "Stage (latent / denoiser / style): " STAGE
read -rp "Checkpoint path (e.g. runs/${STAGE:-latent}/last): " CKPT
python -m osu_dreamer_tpu "fit-${STAGE}" --ckpt-path "$CKPT"
