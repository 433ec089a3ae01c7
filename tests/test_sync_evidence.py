"""scripts/sync_evidence.py — the suite-artifact -> evidence/ copier.

The evidence JSONs are judge-facing; the sync must (a) pick up every
report class the suite produces, (b) refuse to copy a truncated JSON
(a relay death mid-write must not replace a good report with garbage),
and (c) be a no-op on an empty work dir.
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from sync_evidence import sync  # noqa: E402


def _work(tmp_path):
    logs = tmp_path / "exp" / "logs"
    (logs / "suite").mkdir(parents=True)
    (logs / "calib").mkdir()
    return tmp_path, logs


def test_sync_copies_all_report_classes(tmp_path, monkeypatch):
    work, logs = _work(tmp_path)
    (logs / "calib" / "report.json").write_text(json.dumps({"ece": 0.1}))
    (logs / "suite" / "report_d50.json").write_text(json.dumps({"acc": 1}))
    (logs / "suite" / "reliability.png").write_bytes(b"\x89PNG")
    fake_ev = tmp_path / "evidence"
    fake_ev.mkdir()
    import sync_evidence

    monkeypatch.setattr(sync_evidence, "REPO", str(tmp_path))
    copied = sync(str(work))
    assert sorted(copied) == [
        "reliability.png", "report_calib.json", "report_d50.json"
    ]
    assert json.load(open(fake_ev / "report_calib.json")) == {"ece": 0.1}


def test_sync_refuses_truncated_json_but_copies_the_rest(tmp_path, monkeypatch):
    work, logs = _work(tmp_path)
    (logs / "suite" / "report_full.json").write_text('{"acc": 1')  # cut off
    (logs / "suite" / "report_noise.json").write_text(json.dumps({"acc": 3}))
    (tmp_path / "evidence").mkdir()
    import sync_evidence

    monkeypatch.setattr(sync_evidence, "REPO", str(tmp_path))
    with pytest.raises(RuntimeError, match="report_full"):
        sync(str(work))
    # the bad report never lands; the good one does (raise AFTER copying)
    assert not os.path.exists(tmp_path / "evidence" / "report_full.json")
    assert os.path.exists(tmp_path / "evidence" / "report_noise.json")


def test_sync_empty_workdir_is_noop(tmp_path, capsys):
    copied = sync(str(tmp_path / "nowhere"))
    assert copied == []
    assert "nothing to sync" in capsys.readouterr().out


def test_dry_run_copies_nothing(tmp_path, monkeypatch):
    work, logs = _work(tmp_path)
    (logs / "suite" / "report_d10.json").write_text(json.dumps({"acc": 2}))
    (tmp_path / "evidence").mkdir()
    import sync_evidence

    monkeypatch.setattr(sync_evidence, "REPO", str(tmp_path))
    copied = sync(str(work), dry_run=True)
    assert copied == ["report_d10.json"]
    assert not os.path.exists(tmp_path / "evidence" / "report_d10.json")
