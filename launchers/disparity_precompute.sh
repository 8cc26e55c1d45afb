#!/bin/bash
# Disparity GT precompute launcher (reference: launchers/disparity_precompute.sh).
# Usage: ./disparity_precompute.sh <ConfigPath> <IsUsingPointCloud(true/false)>
set -e
cd "$(dirname "$0")/.."
if [[ "$2" == "" ]]; then
    echo "Usage: ./disparity_precompute.sh <ConfigPath> <IsUsingPointCloud>"
    exit 1
fi
exec python3 scripts/disparity_compute.py --config="$1" --use_point_cloud="$2"
