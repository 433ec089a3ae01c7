#!/bin/bash
# Round-4g hardware measurement plan — run AFTER the evidence suite frees
# the chip (ONE client at a time; see docs/OPERATIONS.md). Produces:
#   /tmp/r4g_profile.json   — DDIM-10 B=280 component decomposition +
#                             scan-level int8 vs pallas-int8 A/B
#   /tmp/r4g_bench_*.json   — focused bench A/B records (B=70 and B=280)
#   evidence/bench_battery_r4g.json — the full 6-config battery re-run
# Each step is independently resumable; partial results are still useful.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"

echo "[ab] $(date -u +%H:%M:%S) profile decomposition (ddim10 B=280)..."
timeout 3000 python scripts/profile_serving.py --ddim 10 --batch 280 \
  --int8 --pallas_int8 --int8_encode --reps 6 \
  > /tmp/r4g_profile.json 2>/tmp/r4g_profile.log
tail -1 /tmp/r4g_profile.json || true

for cfg in "--ddim 10 --int8 --int8_encode:int8_b70" \
           "--ddim 10 --pallas_int8 --int8_encode:pallas_b70" \
           "--ddim 10 --pallas_int8 --pallas_v2 --int8_encode:pallasv2_b70" \
           "--ddim 10 --int8 --int8_encode --batch 280:int8_b280" \
           "--ddim 10 --pallas_int8 --int8_encode --batch 280:pallas_b280" \
           "--ddim 10 --pallas_int8 --pallas_v2 --int8_encode --batch 280:pallasv2_b280"; do
  flags="${cfg%%:*}"; name="${cfg##*:}"
  echo "[ab] $(date -u +%H:%M:%S) bench $name ($flags)..."
  timeout 2400 python bench.py $flags > "/tmp/r4g_bench_$name.json" \
    2>"/tmp/r4g_bench_$name.log"
  tail -1 "/tmp/r4g_bench_$name.json" || true
done

echo "[ab] $(date -u +%H:%M:%S) full battery..."
timeout 4800 python bench.py > /tmp/r4g_battery.json 2>/tmp/r4g_battery.log
cp /tmp/r4g_battery.json evidence/bench_battery_r4g.json 2>/dev/null || true
echo "[ab] done $(date -u +%H:%M:%S); battery -> evidence/bench_battery_r4g.json"
