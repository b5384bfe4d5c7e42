#!/usr/bin/env bash
# Full training pipeline: dataset -> 3 stages -> inference artifact — the
# POSIX equivalent of the reference's windows_scripts/"Run Training.bat"
# (which predates its 3-stage split; this runs all of them in order).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# outputs (datasets, runs/, .osz) land in the CALLER'S directory

read -rp "Songs directory (.osz archives / osu! Songs folder; blank = stream the HF corpus): " SONGS
read -rp "Dataset output dir [./data]: " DATA

data_args=(--data-dir "${DATA:-./data}")
[ -n "${SONGS:-}" ] && data_args+=(--songs-dir "$SONGS")
python -m osu_dreamer_tpu generate-data "${data_args[@]}"
python -m osu_dreamer_tpu fit-latent
python -m osu_dreamer_tpu encode-latents --data-dir "${DATA:-./data}"
python -m osu_dreamer_tpu fit-denoiser
python -m osu_dreamer_tpu fit-style
python -m osu_dreamer_tpu export-inference
echo "wrote inference.odt"
