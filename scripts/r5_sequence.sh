#!/bin/bash
# Round-5 chip sequence — the standard wipe-resilient entry (VERDICT r4
# Next #9, with the r4 ADVICE fixes): launch/resume the evidence suite,
# sync+commit rows as they land, and hand the chip back before the harness
# round-end bench. Every chip step is wrapped in a timeout derived from an
# ABSOLUTE epoch deadline (no HHMM midnight wrap), and the suite pid file
# is derived from the workdir.
#
#   DEADLINE_ISO=2026-08-20T17:05:00Z bash scripts/r5_sequence.sh [workdir]
#
# The suite driver (scripts/run_results.py) is resumable per step and now
# reaps its in-flight child on SIGTERM, so the deadline kill frees the
# accelerator immediately.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"
W="${1:-/tmp/r5_results}"
PIDFILE="${W}.suite.pid"           # derived from workdir (ADVICE r4 #3)
DEADLINE_ISO="${DEADLINE_ISO:?set DEADLINE_ISO, e.g. 2026-08-20T17:05:00Z}"
DEADLINE_EPOCH=$(date -u -d "$DEADLINE_ISO" +%s)   # absolute (ADVICE r4 #2)

remaining() { echo $(( DEADLINE_EPOCH - $(date -u +%s) )); }

sync_commit() {
  python scripts/sync_evidence.py --work "$W" || true
  git add -A evidence RESULTS.md 2>/dev/null
  git diff --cached --quiet || git commit -m "Evidence: round-5 suite rows (HEAD numerics)" || true
}

if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "[r5] suite already running (pid $(cat "$PIDFILE"))" >&2
  exit 3
fi

R=$(remaining)
if [ "$R" -le 300 ]; then
  echo "[r5] <5 min to deadline; syncing only"
  sync_commit
  exit 0
fi

echo "[r5] $(date -u +%H:%M:%S) suite launch/resume, budget ${R}s"
# overall timeout = remaining window (ADVICE r4 #1): a late start can never
# hold the chip past the deadline
timeout "$R" python scripts/run_results.py --work "$W" \
  > "${W}.suite.log" 2>&1 &
echo $! > "$PIDFILE"

# sync+commit landed rows every 10 min while the suite runs
while kill -0 "$(cat "$PIDFILE")" 2>/dev/null; do
  sleep 600
  sync_commit
  R=$(remaining)
  if [ "$R" -le 120 ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    echo "[r5] deadline reached; stopping suite driver by pid"
    kill "$(cat "$PIDFILE")" 2>/dev/null || true
    sleep 10
    break
  fi
done
wait "$(cat "$PIDFILE")" 2>/dev/null
sync_commit
echo "[r5] done $(date -u +%H:%M:%S); chip free for the harness bench"
