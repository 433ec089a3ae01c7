#!/bin/bash
# Round-5 chip plan, step 1: the fused Pallas int8 scan-body A/B that six
# VM wipes ate in round 4 (VERDICT r4 "Next" #1). Runs BEFORE the evidence
# suite because it is short (~1.5-2 h healthy) and is the round's top item.
# Produces:
#   /tmp/r5_profile.json    — DDIM-10 B=280 component decomposition +
#                             scan-level int8 vs pallas-int8 A/B
#   /tmp/r5_bench_*.json    — focused bench A/B records (B=70 and B=280);
#                             every record ALSO lands in
#                             evidence/bench_partials.jsonl (flushed), so a
#                             wipe mid-A/B still leaves committed rows once
#                             the watcher syncs (round-4h doctrine, VERDICT
#                             r4 "Next" #9).
# No trailing full battery: the harness driver runs bench.py on the chip at
# round end, and the suite needs the chip after this.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"

echo "[ab] $(date -u +%H:%M:%S) profile decomposition (ddim10 B=280)..."
timeout 2400 python scripts/profile_serving.py --ddim 10 --batch 280 \
  --int8 --pallas_int8 --int8_encode --reps 6 \
  > /tmp/r5_profile.json 2>/tmp/r5_profile.log
tail -1 /tmp/r5_profile.json || true

for cfg in "--ddim 10 --int8 --int8_encode:int8_b70" \
           "--ddim 10 --pallas_int8 --int8_encode:pallas_b70" \
           "--ddim 10 --pallas_int8 --pallas_v2 --int8_encode:pallasv2_b70" \
           "--ddim 10 --int8 --int8_encode --batch 280 --latency 200:int8_b280" \
           "--ddim 10 --pallas_int8 --int8_encode --batch 280:pallas_b280" \
           "--ddim 10 --pallas_int8 --pallas_v2 --int8_encode --batch 280 --latency 200:pallasv2_b280"; do
  flags="${cfg%%:*}"; name="${cfg##*:}"
  echo "[ab] $(date -u +%H:%M:%S) bench $name ($flags)..."
  timeout 1800 python bench.py $flags > "/tmp/r5_bench_$name.json" \
    2>"/tmp/r5_bench_$name.log"
  tail -1 "/tmp/r5_bench_$name.json" || true
done

echo "[ab] done $(date -u +%H:%M:%S)"
