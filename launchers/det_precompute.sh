#!/bin/bash
# Precompute launcher (reference: launchers/det_precompute.sh).
# Usage: ./det_precompute.sh <ConfigPath> <SPLIT(train/test)>
set -e
cd "$(dirname "$0")/.."
if [[ "$2" == "" ]]; then
    echo "Usage: ./det_precompute.sh <ConfigPath> <SPLIT(train/test)>"
    exit 1
fi
CONFIG_PATH=$1
SPLIT=$2
if [ "$SPLIT" == "train" ]; then
    exec python3 scripts/imdb_precompute_3d.py --config="$CONFIG_PATH"
else
    exec python3 scripts/imdb_precompute_test.py --config="$CONFIG_PATH"
fi
