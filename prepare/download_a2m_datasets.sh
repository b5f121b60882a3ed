#!/usr/bin/env bash
# HumanAct12 poses + UESTC VIBE-estimated poses -> dataset/
set -euo pipefail
mkdir -p dataset
cd dataset
echo "Downloading HumanAct12 poses"
gdown "https://drive.google.com/uc?id=1130gHSvNyJmii7f6pv5aY5IyQIWc3t7R"
tar xfzv HumanAct12Poses.tar.gz
rm HumanAct12Poses.tar.gz
echo "Downloading UESTC poses (VIBE estimates)"
gdown "https://drive.google.com/uc?id=1LE-EmYNzECU8o7A2DmqDKtqDMucnSJsy"
tar xjvf uestc.tar.bz2
rm uestc.tar.bz2
echo "done"
