#!/usr/bin/env bash
# GloVe vectors (used by the T2M evaluators, not by the model itself)
set -euo pipefail
gdown --fuzzy "https://drive.google.com/file/d/1cmXKUT31pqd7_XpJAiWEo1K81TMYHA5n/view?usp=sharing"
rm -rf glove
unzip glove.zip
rm glove.zip
echo "done"
