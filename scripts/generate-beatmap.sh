#!/usr/bin/env bash
# Interactive wrapper over `predict` — the POSIX equivalent of the
# reference's windows_scripts/"Generate Beatmap.bat".
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# outputs (datasets, runs/, .osz) land in the CALLER'S directory

read -rp "Model artifact path [inference.odt]: " MODEL
read -rp "Song path (wav/mp3/ogg): " SONG
read -rp "Artist (blank = from audio tags): " ARTIST
read -rp "Title (blank = from audio tags): " TITLE
read -rp "Sample steps [8]: " STEPS
read -rp "Snap hits to 1/N beat grid (0 = off) [4]: " SNAP

args=(predict --model-path "${MODEL:-inference.odt}" --audio-file "$SONG"
      --sample-steps "${STEPS:-8}" --snap-divisor "${SNAP:-4}")
[ -n "${ARTIST:-}" ] && args+=(--artist "$ARTIST")
[ -n "${TITLE:-}" ] && args+=(--title "$TITLE")
python -m osu_dreamer_tpu "${args[@]}"
