#!/usr/bin/env bash
# Evaluate GDRN (reference interface: test_gdrn.sh <config> <ckpt> [opts...])
set -e
CFG=$1
CKPT=$2
shift 2 || true
python tools/test_gdrn.py --config "$CFG" --ckpt "$CKPT" "$@"
