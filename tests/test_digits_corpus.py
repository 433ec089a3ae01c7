"""make_digits_corpus: sklearn's real scanned-digits corpus exported to the
MNIST idx wire format must round-trip through the zero-egress MNIST-family
ingestion (data/downloads.py) — the real-data evidence path
(evidence/RESULTS_digits.md)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def digits_root(tmp_path_factory):
    pytest.importorskip("sklearn")
    root = tmp_path_factory.mktemp("digits_root")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_digits_corpus.py"),
         "--out", str(root)],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-1000:]
    return str(root)


def test_idx_roundtrip_and_split(digits_root):
    from ladine_tpu.data import read_idx

    raw = os.path.join(digits_root, "MNIST", "raw")
    tr_x = read_idx(os.path.join(raw, "train-images-idx3-ubyte"))
    tr_y = read_idx(os.path.join(raw, "train-labels-idx1-ubyte"))
    te_x = read_idx(os.path.join(raw, "t10k-images-idx3-ubyte"))
    te_y = read_idx(os.path.join(raw, "t10k-labels-idx1-ubyte"))
    assert tr_x.shape[1:] == (8, 8) and te_x.shape[1:] == (8, 8)
    assert len(tr_x) + len(te_x) == 1797  # the full corpus, nothing dropped
    assert len(tr_x) == len(tr_y) and len(te_x) == len(te_y)
    # class-stratified test split: every class is represented
    assert set(te_y.tolist()) == set(range(10))
    # full uint8 dynamic range (0..16 gray levels rescaled)
    assert tr_x.max() > 200 and tr_x.min() == 0


def test_export_is_deterministic_and_disjoint(digits_root, tmp_path):
    from ladine_tpu.data import read_idx

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_digits_corpus.py"),
         "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0
    for stem in ("train-images-idx3-ubyte", "t10k-labels-idx1-ubyte"):
        a = open(os.path.join(digits_root, "MNIST", "raw", stem), "rb").read()
        b = open(os.path.join(tmp_path, "MNIST", "raw", stem), "rb").read()
        assert a == b  # fixed-seed export: byte-identical
    raw = os.path.join(digits_root, "MNIST", "raw")
    tr = read_idx(os.path.join(raw, "train-images-idx3-ubyte"))
    te = read_idx(os.path.join(raw, "t10k-images-idx3-ubyte"))
    tr_rows = {tr[i].tobytes() for i in range(len(tr))}
    dup = sum(te[i].tobytes() in tr_rows for i in range(len(te)))
    # the corpus has a handful of genuinely identical scans; the SPLIT must
    # not systematically leak (indices are disjoint by construction)
    assert dup <= 5


def test_ingestion_via_mnist_family(digits_root):
    from ladine_tpu.data import load_mnist_family

    train = load_mnist_family("MNIST", digits_root, "train", image_size=(32, 32))
    valid = load_mnist_family("MNIST", digits_root, "valid", image_size=(32, 32))
    test = load_mnist_family("MNIST", digits_root, "test", image_size=(32, 32))
    # 90/10 train/valid carve of the exported train corpus, t10k untouched
    n_train_corpus = len(train) + len(valid)
    assert len(valid) == n_train_corpus // 10
    assert len(test) + n_train_corpus == 1797
    assert train.classes == list(range(10))
    images, labels = next(train.batches(4))
    assert images.shape == (4, 32, 32, 3)
    assert 0.0 <= images.min() and images.max() <= 1.0
    np.testing.assert_array_equal(images[..., 0], images[..., 2])
