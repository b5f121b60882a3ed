#!/usr/bin/env bash
# HumanAct12 unconstrained GT motions (modi-struct) -> dataset/HumanAct12Poses/
# (same asset source as the reference's prepare/download_unconstrained_datasets.sh)
set -euo pipefail
mkdir -p dataset/HumanAct12Poses
cd dataset/HumanAct12Poses
gdown "1KqOBTtLFgkvWSZb8ao-wdBMG7sTP3Q7d"
echo "done — override the path with UNCONSTRAINED_DATASET_PATH"
