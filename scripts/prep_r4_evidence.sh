#!/bin/bash
# Prepare the round-4 evidence work dir by REUSING the round-3 trained
# artifacts (training/validation splits are byte-identical across the two
# corpora — the generator's rng draws them before the enlarged test split,
# scripts/make_synth_medical.py --test_n) and re-running only the eval rows
# on the 1200-instance test set.
#
#   bash scripts/prep_r4_evidence.sh [R3_WORK] [R4_WORK] [CORPUS]
#   python scripts/run_results.py --work <R4_WORK>      # on the TPU
#
# What is reused (symlinked): stage-1 models, member checkpoints (+ their
# train_complete markers), stage logs (for the RESULTS.md header), and the
# calibration report (fit on the UNCHANGED validation split). What is NOT
# reused: every test-split report (suite/, test_ema, report.json) — those
# must be recomputed on the enlarged split.
set -euo pipefail
R3=${1:-/tmp/r3_results}
R4=${2:-/tmp/r4_results}
CORPUS=${3:-/tmp/r4_synth/synth_ds}

[ -d "$R3/models" ] || { echo "missing $R3/models"; exit 1; }
[ -d "$CORPUS/testing" ] || { echo "missing $CORPUS/testing (generate with make_synth_medical.py --n 250 --test_n 600)"; exit 1; }

mkdir -p "$R4/exp/logs"
ln -sfn "$CORPUS" "$R4/synth_ds"
ln -sfn "$R3/models" "$R4/models"
ln -sfn "$R3/jaxcache" "$R4/jaxcache" 2>/dev/null || true
for f in stage1a.log stage1b.log guid.log; do
  [ -e "$R4/$f" ] || cp "$R3/$f" "$R4/$f" 2>/dev/null || true
done
for k in 0 1 2 3 4; do
  ln -sfn "$R3/exp/logs/member$k" "$R4/exp/logs/member$k"
done
# calibration: fit on the validation split, which is unchanged -> reuse
ln -sfn "$R3/exp/logs/calib" "$R4/exp/logs/calib"
echo "prepared $R4 (models/members/calib reused; suite+test rows will recompute)"
