#!/bin/bash
# One-shot round-4 TPU evidence plan — run the moment the tunnel relay is
# back (docs/OPERATIONS.md round-4 timeline). Serializes chip users:
#   1. suite re-run on the 1200-instance test split (reusing round-3
#      checkpoints via prep_r4_evidence.sh) + fp32 cover A/B + int8_enc row
#   2. bench battery (6 configs incl. --int8_encode) with incremental
#      partials and MFU fields
# Deadline-aware: the driver runs its own `python bench.py` at round end,
# and two concurrent chip holders OOM the 16 GB v5e — so every step is
# bounded by `timeout` against a deadline (epoch seconds) read from
# $LADINE_GO_DEADLINE_FILE (default /tmp/r4_deadline; re-read per step so
# it can be bumped while running). If the relay comes back late
# (<150 min of budget), the bench battery runs FIRST: the suite's rows
# persist incrementally and survive a timeout, while a missing bench
# record costs driver-verified evidence.
# Artifacts: RESULTS.md (repo), evidence/bench_battery_r4.json + partials.
set -uo pipefail
cd "$(dirname "$0")/.."

DFILE="${LADINE_GO_DEADLINE_FILE:-/tmp/r4_deadline}"
remaining() {
  local d now
  d=$(cat "$DFILE" 2>/dev/null || echo 0); now=$(date +%s)
  echo $(( d - now ))
}

echo "[go] probing relay..."
ok=0
for p in 8082 8083 8087; do
  timeout 2 bash -c "echo > /dev/tcp/127.0.0.1/$p" 2>/dev/null && ok=1
done
[ "$ok" = 1 ] || { echo "[go] relay ports closed; aborting"; exit 3; }

run_bench() {
  local budget=$1
  [ "$budget" -lt 300 ] && { echo "[go] no budget for bench ($budget s)"; return 1; }
  echo "[go] bench battery (timeout ${budget}s)..."
  timeout "$budget" python bench.py > /tmp/r4_bench_out.json 2>/tmp/r4_bench_err.log
  local rc=$?
  cp /tmp/r4_bench_out.json evidence/bench_battery_r4.json 2>/dev/null || true
  tail -3 /tmp/r4_bench_err.log
  echo "[go] bench rc=$rc; battery JSON -> evidence/bench_battery_r4.json"
}

run_suite() {
  local budget=$1
  [ "$budget" -lt 600 ] && { echo "[go] no budget for suite ($budget s)"; return 1; }
  bash scripts/prep_r4_evidence.sh
  echo "[go] evidence suite (1200-instance split, fp32 cover A/B, timeout ${budget}s)..."
  timeout "$budget" python scripts/run_results.py --work /tmp/r4_results 2>&1 | tail -5
  echo "[go] suite rc=$? (rows persist incrementally in /tmp/r4_results/exp/logs)"
}

rem=$(remaining)
echo "[go] $(date -u +%H:%M:%S) relay up; ${rem}s to deadline ($(cat "$DFILE" 2>/dev/null))"
if [ "$rem" -lt 9000 ]; then
  echo "[go] LATE return: bench first (driver-facing), suite with the rest"
  run_bench $(( rem < 4200 ? rem - 300 : 3900 ))
  run_suite $(remaining)
else
  run_suite $(( rem - 5400 ))   # keep >=90 min for bench
  run_bench $(remaining)
fi
echo "[go] done at $(date -u +%H:%M:%S); $(remaining)s before deadline"
