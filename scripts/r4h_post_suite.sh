#!/bin/bash
# Round-4h post-suite sequence — run AFTER the evidence suite driver
# (scripts/run_results.py, /tmp/r4_suite.pid) exits. One command, resumable,
# deadline-aware: every step is skipped if its output already exists, and no
# NEW chip step starts after DEADLINE_UTC so the harness round-end bench
# (BENCH_r04) gets the chip (docs/OPERATIONS.md round-end contention plan).
#
#   bash scripts/r4h_post_suite.sh [workdir]   # default /tmp/r4_results
#
# Steps:
#   1. resume run_results.py       -> the int8_pallas_v2 row (added at commit
#                                     21707a9, after the in-flight driver
#                                     loaded) + RESULTS.md regeneration
#   2. sync_evidence + commit      -> per-row reports land in git
#   3. r4g_tpu_ab.sh               -> pallas-int8 v1/v2 A/B + full battery
#   4. commit battery/A-B records
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"
W="${1:-/tmp/r4_results}"
DEADLINE_UTC="${DEADLINE_UTC:-1130}"  # HHMM; no new chip step after this

past_deadline() { [ "$(date -u +%H%M)" -ge "$DEADLINE_UTC" ]; }

if [ -f /tmp/r4_suite.pid ] && kill -0 "$(cat /tmp/r4_suite.pid)" 2>/dev/null; then
  echo "[post] suite driver still alive (pid $(cat /tmp/r4_suite.pid)); refusing to contend for the chip" >&2
  exit 3
fi

if ! past_deadline; then
  echo "[post] $(date -u +%H:%M:%S) resume run_results (v2 row + RESULTS.md)..."
  timeout 5400 python scripts/run_results.py --work "$W" \
    > /tmp/r4_post_resume.log 2>&1 || echo "[post] resume rc=$? (partials kept)"
else
  echo "[post] past deadline; skipping run_results resume"
fi

echo "[post] $(date -u +%H:%M:%S) sync evidence..."
python scripts/sync_evidence.py --work "$W" || true
git add -A evidence RESULTS.md 2>/dev/null
git diff --cached --quiet || git commit -m "Evidence: round-4h suite rows (n=1200 re-run under HEAD numerics)" || true

if ! past_deadline && [ ! -f evidence/bench_battery_r4g.json ]; then
  echo "[post] $(date -u +%H:%M:%S) r4g A/B + battery..."
  bash scripts/r4g_tpu_ab.sh || echo "[post] r4g rc=$? (partials in /tmp/r4g_*)"
  for f in /tmp/r4g_bench_*.json /tmp/r4g_profile.json; do
    [ -s "$f" ] && cp "$f" "evidence/$(basename "$f")" || true
  done
  git add -A evidence 2>/dev/null
  git diff --cached --quiet || git commit -m "Evidence: r4g pallas-int8 v1/v2 A/B + battery (one v5e chip)" || true
else
  echo "[post] skipping r4g A/B (deadline or already done)"
fi

echo "[post] done $(date -u +%H:%M:%S); chip is free for the harness bench"
