#!/usr/bin/env bash
# TensorBoard over every stage's run dir — the POSIX equivalent of the
# reference's windows_scripts/Tensorboard.bat.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# outputs (datasets, runs/, .osz) land in the CALLER'S directory
exec python -m tensorboard.main --logdir runs/ "$@"
