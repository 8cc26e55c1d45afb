#!/bin/bash
# Evaluation launcher (reference: launchers/eval.sh). No CUDA device pinning:
# the single JAX process owns the chip(s).
#
# Usage: ./eval.sh <ConfigPath> <CheckPointPath> [Split=validation]
set -e
cd "$(dirname "$0")/.."
if [[ "$2" == "" ]]; then
    echo "Usage: ./eval.sh <ConfigPath> <CheckPointPath> [Split (validation/test)]"
    exit 1
fi
CONFIG_PATH=$1
CKPT_PATH=$2
SPLIT=${3:-validation}
exec python3 scripts/eval.py --config="$CONFIG_PATH" --checkpoint_path="$CKPT_PATH" --split_to_test="$SPLIT"
