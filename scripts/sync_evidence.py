#!/usr/bin/env python
"""Copy evidence-run artifacts from a run_results.py work dir into
``evidence/`` with the repository's canonical names.

Replaces the ad-hoc ``cp`` step between an evidence run finishing on the
chip and the commit: per the operations notes (docs/OPERATIONS.md), /tmp
is wiped on VM restarts and the tunnel relay dies unpredictably, so the
raw per-row reports must land in the repo the moment the suite completes.

    python scripts/sync_evidence.py [--work /tmp/r4_results] [--dry_run]

Copies (only files that exist; prints what it did):
  exp/logs/calib/report.json                -> evidence/report_calib.json
  exp/logs/test_ema/report.json             -> evidence/report_ema.json
  exp/logs/suite/report_<row>.json          -> evidence/report_<row>.json
  exp/logs/suite_fp32/report_cover_fp32.json-> evidence/report_cover_fp32.json
  exp/logs/suite/*.png                      -> evidence/<name>.png
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sync(work: str, dry_run: bool = False) -> list[str]:
    logs = os.path.join(work, "exp", "logs")
    ev = os.path.join(REPO, "evidence")
    pairs: list[tuple[str, str]] = [
        (os.path.join(logs, "calib", "report.json"), "report_calib.json"),
        (os.path.join(logs, "calib_ema", "report.json"),
         "report_calib_ema.json"),
        (os.path.join(logs, "test_ema", "report.json"), "report_ema.json"),
        (os.path.join(logs, "suite_fp32", "report_cover_fp32.json"),
         "report_cover_fp32.json"),
    ]
    for p in sorted(glob.glob(os.path.join(logs, "suite", "report_*.json"))):
        pairs.append((p, os.path.basename(p)))
    for p in sorted(glob.glob(os.path.join(logs, "suite", "*.png"))):
        pairs.append((p, os.path.basename(p)))

    copied, bad = [], []
    for src, name in pairs:
        if not os.path.exists(src):
            continue
        if name.endswith(".json"):
            try:
                with open(src) as f:
                    json.load(f)  # refuse to sync a truncated/partial report
            except ValueError:
                bad.append(src)
                print(f"SKIPPED truncated/invalid JSON: {src}")
                continue
        dst = os.path.join(ev, name)
        if not dry_run:
            shutil.copyfile(src, dst)
        copied.append(name)
        print(f"{'would copy' if dry_run else 'copied'} {src} -> evidence/{name}")
    if not copied and not bad:
        print(f"nothing to sync from {logs}")
    if bad:
        # loud failure AFTER the good files landed: a relay death mid-write
        # must cost that one report, not the sync
        raise RuntimeError(f"invalid report JSON (not synced): {bad}")
    return copied


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work", default="/tmp/r4_results")
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args()
    sync(args.work, args.dry_run)


if __name__ == "__main__":
    main()
