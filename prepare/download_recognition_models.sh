#!/usr/bin/env bash
# Action-recognition classifiers for eval_a2m (humanact12 GRU, uestc STGCN)
set -euo pipefail
mkdir -p assets/actionrecognition
cd assets/actionrecognition
wget "https://raw.githubusercontent.com/EricGuo5513/action-to-motion/master/model_file/action_recognition_model_humanact12.tar" -O humanact12_gru.tar
gdown "https://drive.google.com/uc?id=1bSSD69s1dHY7Uk0RGbGc6p7uhUxSDSBK"
echo "done — override paths with A2M_CLASSIFIER_PATH / UESTC_STGCN_PATH"
