#!/bin/bash
# One-shot round-4 TPU evidence plan — run the moment the tunnel relay is
# back (docs/OPERATIONS.md round-4 timeline). Serializes chip users:
#   1. suite re-run on the 1200-instance test split (reusing round-3
#      checkpoints via prep_r4_evidence.sh) + fp32 cover A/B + int8_enc row
#   2. bench battery (6 configs incl. --int8_encode) with incremental
#      partials and MFU fields
# Artifacts: RESULTS.md (repo), evidence/bench_battery_r4.json + partials.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "[go] probing relay..."
ok=0
for p in 8082 8083 8087; do
  timeout 2 bash -c "echo > /dev/tcp/127.0.0.1/$p" 2>/dev/null && ok=1
done
[ "$ok" = 1 ] || { echo "[go] relay ports closed; aborting"; exit 3; }

bash scripts/prep_r4_evidence.sh
echo "[go] evidence suite (1200-instance split, fp32 cover A/B)..."
python scripts/run_results.py --work /tmp/r4_results 2>&1 | tail -5

echo "[go] bench battery..."
python bench.py > /tmp/r4_bench_out.json 2>/tmp/r4_bench_err.log
rc=$?
cp /tmp/r4_bench_out.json evidence/bench_battery_r4.json 2>/dev/null || true
tail -3 /tmp/r4_bench_err.log
echo "[go] bench rc=$rc; battery JSON -> evidence/bench_battery_r4.json"
