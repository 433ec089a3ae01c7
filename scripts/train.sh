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
# stage-1 artifacts (scripts/stage1.sh layout): assembled into the guidance
# in place — the reference's make_files.sh handoff
VIT_CKPT="${VIT_CKPT:-./models/vit_${DATASET}}"
MLP_CKPT_DIR="${MLP_CKPT_DIR:-./models/${DATASET}/MLPs}"

args=(
  --train
  --dataroot "$DATA_DIR"
  --seed "$SEED"
  --exp ./exp --doc "$TMP_NAME"
  --bf16
  # cache the frozen guidance's per-sample output once: required on one
  # 16 GB chip at full dims, faster everywhere (no per-step ViT forward)
  --precompute_guidance
)
# single-chip full dims: train one member per invocation instead
# (MLP_IDX=k, the reference's own train.sh workflow) — add --mlp_idx "$k"
[[ -n "$CONFIG" ]] && args+=(--config "$CONFIG")
if [[ -n "$GUIDANCE_CKPT" ]]; then
  args+=(--guidance_ckpt "$GUIDANCE_CKPT")
elif [[ -d "$VIT_CKPT" && -d "$MLP_CKPT_DIR" ]]; then
  args+=(--vit_ckpt "$VIT_CKPT" --mlp_ckpt_dir "$MLP_CKPT_DIR")
else
  echo "warning: no stage-1 checkpoints at $VIT_CKPT / $MLP_CKPT_DIR and no" \
       "GUIDANCE_CKPT set; training against a randomly-initialized guidance" >&2
fi

python -m ladine_tpu.cli.main "${args[@]}"
