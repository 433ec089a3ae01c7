#!/usr/bin/env bash
# Stage 1: ViT fine-tune + mapping MLPs (reference: mapping/train_transformer.py
# then 5x mapping/train_mapping.py then make_files.sh moving pickles around).
# Here: two invocations; checkpoints land where stage 3 reads them — no file
# shuffling needed (the reference's make_files.sh is obsolete by construction).
set -euo pipefail

DATASET="${DATASET:-ChestXRay}"
DATA_DIR="${DATA_DIR:?set DATA_DIR to the dataset root}"
OUT="${OUT:-./models}"
NUM_MEMBERS="${NUM_MEMBERS:-5}"
# PER_MLP=1 (default): one mapping MLP per invocation — required for the
# full-size MLPs on a single 16 GB chip (5 concurrent Adam states ~ 37 GB).
# PER_MLP=0 trains all K concurrently (multi-chip or reduced dims).
PER_MLP="${PER_MLP:-1}"

python -m ladine_tpu.cli.train_transformer \
  --dataset "$DATASET" --dataroot "$DATA_DIR" --out "$OUT"

if [[ "$PER_MLP" == "1" ]]; then
  for k in $(seq 0 $((NUM_MEMBERS - 1))); do
    python -m ladine_tpu.cli.train_mapping \
      --dataset "$DATASET" --dataroot "$DATA_DIR" --out "$OUT" \
      --vit_ckpt "$OUT/vit_${DATASET}" \
      --num_members "$NUM_MEMBERS" --mlp_idx "$k"
  done
else
  python -m ladine_tpu.cli.train_mapping \
    --dataset "$DATASET" --dataroot "$DATA_DIR" --out "$OUT" \
    --vit_ckpt "$OUT/vit_${DATASET}" --num_members "$NUM_MEMBERS"
fi
