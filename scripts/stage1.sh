#!/usr/bin/env bash
# Stage 1: ViT fine-tune + mapping MLPs (reference: mapping/train_transformer.py
# then 5x mapping/train_mapping.py then make_files.sh moving pickles around).
# Here: two invocations; checkpoints land where stage 3 reads them — no file
# shuffling needed (the reference's make_files.sh is obsolete by construction).
set -euo pipefail

DATASET="${DATASET:-ChestXRay}"
DATA_DIR="${DATA_DIR:?set DATA_DIR to the dataset root}"
OUT="${OUT:-./models}"

python -m ladine_tpu.cli.train_transformer \
  --dataset "$DATASET" --dataroot "$DATA_DIR" --out "$OUT"

python -m ladine_tpu.cli.train_mapping \
  --dataset "$DATASET" --dataroot "$DATA_DIR" --out "$OUT" \
  --vit_ckpt "$OUT/vit_${DATASET}"
