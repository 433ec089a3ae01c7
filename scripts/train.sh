#!/usr/bin/env bash
# Stage-3 diffusion training (reference: diffusion/training_scripts/train.sh,
# which ran main.py FIVE times, once per member with MLP_IDX=0..4 — run 4
# accidentally dropping --seed). Here all members train concurrently in ONE
# invocation, sharded over the TPU mesh.
set -euo pipefail

DATASET="${DATASET:-ChestXRay}"            # ChestXRay | ISICSkinCancer
DATA_DIR="${DATA_DIR:?set DATA_DIR to the dataset root}"
SEED="${SEED:-4444}"
TMP_NAME="${TMP_NAME:-run0}"
CONFIG="${CONFIG:-}"
GUIDANCE_CKPT="${GUIDANCE_CKPT:-}"

args=(
  --train
  --dataroot "$DATA_DIR"
  --seed "$SEED"
  --exp ./exp --doc "$TMP_NAME"
  --bf16
)
[[ -n "$CONFIG" ]] && args+=(--config "$CONFIG")
[[ -n "$GUIDANCE_CKPT" ]] && args+=(--guidance_ckpt "$GUIDANCE_CKPT")

python -m ladine_tpu.cli.main "${args[@]}"
