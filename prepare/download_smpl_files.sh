#!/usr/bin/env bash
# SMPL neutral body model -> body_models/smpl/
# (same asset source as the reference's prepare/download_smpl_files.sh)
set -euo pipefail
mkdir -p body_models
cd body_models
echo "SMPL files will be stored in body_models/smpl/"
gdown "https://drive.google.com/uc?id=1INYlGA76ak_cKGzvpOV2Pe6RkYTlXTW2"
rm -rf smpl
unzip smpl.zip
rm smpl.zip
echo "done — set SMPL_MODEL_PATH=body_models/smpl/SMPL_NEUTRAL.pkl if moved"
