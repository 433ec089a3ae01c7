"""make_attacks CLI: generate -> consume roundtrip over a real ImageFolder."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_tree(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("atk_ds")
    rng = np.random.default_rng(0)
    for cls_idx, cls in enumerate(["A", "B"]):
        d = root / "testing" / cls
        d.mkdir(parents=True)
        for i in range(4):
            arr = (rng.integers(0, 40, size=(16, 16, 3)) + cls_idx * 150).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


def test_generate_and_consume(tiny_tree, capsys):
    from ladine_tpu.cli.make_attacks import main as make_main
    from ladine_tpu.data import load_attack_split

    rc = make_main([
        "--cpu", "--demo", "--dataroot", tiny_tree, "--attack_name", "FGSM",
        "--epsilon", "0.1", "--image_size", "16", "--batch_size", "4",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["images"] == 8
    assert 0.0 <= out["attack_success_rate"] <= 1.0

    # consume through the reference's attack-folder loader
    ds = load_attack_split(tiny_tree, "FGSM", (16, 16))
    assert len(ds) == 8
    assert ds.classes == ["A", "B"]
    batch = ds.load_indices(range(4))
    assert batch.shape == (4, 16, 16, 3)
    assert batch.min() >= 0.0 and batch.max() <= 1.0


def test_reliability_and_per_member_in_report():
    from ladine_tpu.infer import compute_report

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 50)
    onehot = np.eye(2)[labels]
    samples = (onehot[None] + rng.normal(scale=0.3, size=(6, 50, 2))).astype(np.float32)
    rep = compute_report(samples, labels, 0.2, num_members=3)
    rel = rep["reliability"]
    assert sum(rel["count"]) == 50
    assert len(rep["per_member_mv_accuracy"]) == 3
    for a in rep["per_member_mv_accuracy"]:
        assert 0 <= a <= 100
