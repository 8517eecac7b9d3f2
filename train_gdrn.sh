#!/usr/bin/env bash
# Train GDRN (reference interface: train_gdrn.sh <config> [opts...])
set -e
CFG=$1
shift || true
python tools/train_gdrn.py --config "$CFG" "$@"
