"""Zero-egress ingestion for the download-served corpora (MNIST family +
PathMNIST): synthesized standard artifact files (IDX gzip / medmnist npz)
round-trip through data/downloads.py with the reference's transform stacks
(mapping/data/dataset.py:172-263) and route through the Runner's dataset
dispatch by name."""

import gzip
import os
import struct

import numpy as np
import pytest

from ladine_tpu.data import load_mnist_family, read_idx


def write_idx(path, arr, gz=False):
    arr = np.asarray(arr, np.uint8)
    header = struct.pack(">I", 0x0800 | arr.ndim) + struct.pack(
        f">{arr.ndim}I", *arr.shape
    )
    opener = gzip.open if gz else open
    with opener(path + (".gz" if gz else ""), "wb") as f:
        f.write(header + arr.tobytes())


@pytest.fixture(scope="module")
def mnist_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mnist_root")
    rng = np.random.default_rng(0)
    for family, gz in (("MNIST", True), ("FashionMNIST", False)):
        raw = root / family / "raw"
        raw.mkdir(parents=True)
        for stem, n in (("train", 24), ("t10k", 8)):
            imgs = rng.integers(0, 255, (n, 28, 28))
            write_idx(str(raw / f"{stem}-images-idx3-ubyte"), imgs, gz=gz)
            write_idx(str(raw / f"{stem}-labels-idx1-ubyte"),
                      rng.integers(0, 10, (n,)), gz=gz)
    z = {}
    for key, n in (("train", 12), ("val", 6), ("test", 6)):
        z[f"{key}_images"] = rng.integers(0, 255, (n, 28, 28, 3), dtype=np.uint8)
        z[f"{key}_labels"] = rng.integers(0, 9, (n, 1))
    np.savez(root / "pathmnist.npz", **z)
    return str(root)


def test_read_idx_roundtrip(tmp_path):
    arr = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    write_idx(str(tmp_path / "a-idx3-ubyte"), arr)
    np.testing.assert_array_equal(read_idx(str(tmp_path / "a-idx3-ubyte")), arr)
    write_idx(str(tmp_path / "b-idx3-ubyte"), arr, gz=True)
    np.testing.assert_array_equal(read_idx(str(tmp_path / "b-idx3-ubyte")), arr)


def test_mnist_splits_and_transform(mnist_root):
    for name in ("MNIST", "FashionMNIST"):
        train = load_mnist_family(name, mnist_root, "train", image_size=(32, 32))
        test = load_mnist_family(name, mnist_root, "test", image_size=(32, 32))
        valid = load_mnist_family(name, mnist_root, "valid", image_size=(32, 32))
        # disjoint fixed-seed 90/10 carve of the train corpus: selection/
        # calibration must never see training instances OR t10k (ADVICE r3)
        assert len(test) == 8
        assert len(valid) == 24 // 10
        assert len(train) == 24 - len(valid)
        # carve is deterministic and disjoint (fixture images are random
        # bytes, so identical rows only occur for the same source index)
        valid2 = load_mnist_family(name, mnist_root, "valid", image_size=(32, 32))
        np.testing.assert_array_equal(valid.labels, valid2.labels)
        tr_rows = {train.images[i].tobytes() for i in range(len(train))}
        assert all(valid.images[i].tobytes() not in tr_rows
                   for i in range(len(valid)))
        images, labels = next(train.batches(4))
        # grayscale -> 3 channels, resized, [0, 1]
        assert images.shape == (4, 32, 32, 3)
        np.testing.assert_array_equal(images[..., 0], images[..., 1])
        assert 0.0 <= images.min() and images.max() <= 1.0
        assert labels.shape == (4,)


def test_rotated_mnist_reference_quirks(mnist_root):
    """valid = TRAIN corpus under test-strength rotation (dataset.py:258-263);
    rotation is random per epoch."""
    valid = load_mnist_family("RotatedMNIST", mnist_root, "valid", image_size=(32, 32))
    assert len(valid) == 24  # the train corpus, not t10k
    b1, _ = next(valid.batches(4, seed=1))
    b2, _ = next(valid.batches(4, seed=2))
    assert b1.shape == (4, 32, 32, 3)
    assert np.abs(b1 - b2).max() > 1e-3  # different rotations drawn


def test_pathmnist_splits(mnist_root):
    tr = load_mnist_family("PathMNIST", mnist_root, "train", image_size=(32, 32))
    va = load_mnist_family("PathMNIST", mnist_root, "valid", image_size=(32, 32))
    te = load_mnist_family("PathMNIST", mnist_root, "test",
                           preprocess="none", image_size=(32, 32))
    assert (len(tr), len(va), len(te)) == (12, 6, 6)
    images, labels = next(tr.batches(3))
    assert images.shape == (3, 32, 32, 3)
    np.testing.assert_array_equal(images[..., 0], images[..., 1])  # grayscaled
    assert labels.ndim == 1  # squeezed (CustomTargetTransform)
    rgb, _ = next(te.batches(3))
    assert np.abs(rgb[..., 0] - rgb[..., 1]).max() > 1e-3  # 'none' keeps RGB


def test_missing_artifacts_error_names_the_path(tmp_path):
    with pytest.raises(FileNotFoundError, match="network"):
        load_mnist_family("MNIST", str(tmp_path), "train")
    with pytest.raises(FileNotFoundError, match="pathmnist.npz"):
        load_mnist_family("PathMNIST", str(tmp_path), "train")


def test_runner_routes_mnist_family(mnist_root):
    """The dataset-name dispatch serves MNIST-family roots end-to-end
    through Runner.batches (with_indices parity included)."""
    from ladine_tpu.cli.runner import Runner
    from ladine_tpu.config import Config

    cfg = Config()
    cfg.data.dataset = "MNIST"
    cfg.data.dataroot = mnist_root
    cfg.data.num_classes = 10
    cfg.model.image_size, cfg.model.patch_size = 16, 8
    cfg.model.embed_dim, cfg.model.num_heads, cfg.model.vit_depth = 16, 2, 5
    cfg.model.mlp_hidden_dims = [16, 8, 8]
    cfg.model.feature_dim = cfg.model.hidden_dim = 16
    cfg.diffusion.timesteps = 10
    runner = Runner(cfg, log_dir=os.path.join(mnist_root, "logs"))
    images, labels, idx = next(runner.batches("train", 4, with_indices=True))
    assert images.shape == (4, 16, 16, 3)
    assert idx.shape == (4,)
    assert runner.num_batches("train", 4) == 6
