#!/usr/bin/env bash
# MoDi-struct STGCN classifier for the unconstrained metrics branch
set -euo pipefail
mkdir -p assets/actionrecognition
cd assets/actionrecognition
gdown "1xfigimkPxKt3a8zvn_ME_NAR6CyTqneK"
echo "done — override with MODI_STGCN_PATH"
