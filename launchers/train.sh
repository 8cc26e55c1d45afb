#!/bin/bash
# TPU-native training launcher (reference: launchers/train.sh).
# The reference dispatches between plain train.py and torch.distributed.launch
# by GPU count; here one process drives all local TPU chips through the jax
# data mesh, and multi-host runs pass coordinator/process flags instead.
#
# Usage:
#   ./train.sh <ConfigPath> <EXPERIMENT_NAME> [extra train.py flags...]
# Multi-host example (run once per host):
#   ./train.sh cfg.py exp --coordinator=host0:1234 --num_processes=4 --process_id=$ID
set -e
cd "$(dirname "$0")/.."
if [[ "$2" == "" ]]; then
    echo "Usage: ./train.sh <ConfigPath> <EXPERIMENT_NAME> [extra flags...]"
    exit 1
fi
CONFIG_PATH=$1
EXP_NAME=$2
shift 2
exec python3 scripts/train.py --config="$CONFIG_PATH" --experiment_name="$EXP_NAME" "$@"
