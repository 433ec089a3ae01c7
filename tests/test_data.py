import os

import numpy as np
import pytest

from ladine_tpu.data import (
    Gaussians,
    GaussianMixture1D,
    ImageFolderDataset,
    base_dataset,
    compute_mean_std,
    dataset_split_for,
    load_attack_split,
    load_split,
)


@pytest.fixture(scope="module")
def fake_tree(tmp_path_factory):
    """Build a tiny ImageFolder tree: training/validation/testing x 2 classes."""
    from PIL import Image

    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    counts = {"training": 8, "validation": 4, "testing": 5}
    for split, n in counts.items():
        for cls in ["NORMAL", "TUBERCULOSIS"]:
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.integers(0, 255, size=(30, 40, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"img{i}.png")
    # attack folder
    for cls in ["NORMAL", "TUBERCULOSIS"]:
        d = root / "Test_attacks_FGSM" / cls
        d.mkdir(parents=True)
        arr = rng.integers(0, 255, size=(30, 40, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / "a.png")
    return str(root)


def test_class_discovery_sorted(fake_tree):
    ds = ImageFolderDataset(os.path.join(fake_tree, "training"), image_size=(16, 16))
    assert ds.classes == ["NORMAL", "TUBERCULOSIS"]  # sorted, like torchvision
    assert len(ds) == 16
    assert set(np.asarray(ds.labels)) == {0, 1}


def test_grayscaled_loads(fake_tree):
    ds = ImageFolderDataset(
        os.path.join(fake_tree, "training"), preprocess="grayscaled", image_size=(16, 16)
    )
    batch = ds.load_indices([0, 1, 2])
    assert batch.shape == (3, 16, 16, 3)
    assert batch.min() >= 0.0 and batch.max() <= 1.0
    # grayscale: all three channels equal
    np.testing.assert_array_equal(batch[..., 0], batch[..., 1])


def test_standardized_requires_stats(fake_tree):
    with pytest.raises(ValueError):
        ImageFolderDataset(
            os.path.join(fake_tree, "training"), preprocess="standardized"
        )


def test_load_split_standardized(fake_tree):
    ds = load_split(fake_tree, "ChestXRay", "test", "standardized", image_size=(16, 16))
    batch = ds.load_indices([0])
    # normalized by the pinned ChestXRay stats -> values outside [0,1] expected
    assert batch.min() < 0.0


def test_batches_shapes_and_drop_last(fake_tree):
    ds = ImageFolderDataset(os.path.join(fake_tree, "testing"), image_size=(16, 16))
    assert len(ds) == 10
    batches = list(ds.batches(4, drop_last=True))
    assert len(batches) == 2
    assert all(b[0].shape == (4, 16, 16, 3) for b in batches)
    batches_all = list(ds.batches(4, drop_last=False))
    assert len(batches_all) == 3
    assert batches_all[-1][0].shape[0] == 2
    # labels align with images
    total = np.concatenate([b[1] for b in batches_all])
    np.testing.assert_array_equal(np.sort(total), np.sort(ds.labels))


def test_batches_shuffle_deterministic(fake_tree):
    ds = ImageFolderDataset(os.path.join(fake_tree, "testing"), image_size=(16, 16))
    l1 = np.concatenate([b[1] for b in ds.batches(4, shuffle=True, seed=7)])
    l2 = np.concatenate([b[1] for b in ds.batches(4, shuffle=True, seed=7)])
    l3 = np.concatenate([b[1] for b in ds.batches(4, shuffle=True, seed=8)])
    np.testing.assert_array_equal(l1, l2)
    assert not np.array_equal(l1, l3)


def test_compute_mean_std(fake_tree):
    ds = ImageFolderDataset(os.path.join(fake_tree, "training"), preprocess="raw", image_size=(16, 16))
    mean, std = compute_mean_std(ds)
    assert mean.shape == (3,) and std.shape == (3,)
    # uniform random uint8 -> mean ~0.5; std shrinks below 0.29 because the
    # bilinear downscale averages pixels
    assert 0.4 < mean[0] < 0.6
    assert 0.03 < std[0] < 0.4


def test_attack_split(fake_tree):
    ds = load_attack_split(fake_tree, "FGSM", image_size=(16, 16))
    assert len(ds) == 2
    b = ds.load_indices([0, 1])
    assert b.min() >= 0.0 and b.max() <= 1.0  # raw: no normalization


def test_dataset_name_routing():
    assert base_dataset("ChestXRayAtkPGD") == "ChestXRay"
    assert base_dataset("ISICSkinCancerValidate") == "ISICSkinCancer"
    assert dataset_split_for("ChestXRay") == "test"
    assert dataset_split_for("ChestXRayValidate") == "valid"
    assert dataset_split_for("ISICSkinCancerAtkCW") == "attack"
    with pytest.raises(ValueError):
        base_dataset("CIFAR10x")


def test_gaussians_toy():
    x, y = Gaussians().sample(500)
    assert x.shape == (500, 2) and y.shape == (500,)
    # classes are separated around their means
    assert x[y == 0].mean(0)[0] < 0 < x[y == 1].mean(0)[0]


def test_gmm_posterior():
    gmm = GaussianMixture1D()
    x, y = gmm.sample(1000)
    p = gmm.posterior(x)
    assert p.shape == (1000,)
    # posterior at the symmetric midpoint is 0.5
    assert gmm.posterior(np.array([0.0]))[0] == pytest.approx(0.5, abs=1e-6)
    # predictive accuracy of the Bayes rule is high for separated means
    acc = ((p > 0.5) == (y == 1)).mean()
    assert acc > 0.9


def test_decode_cache_identical_and_populated(fake_tree):
    """cache_decoded='auto' (on, for small splits): batches identical to the
    uncached path, decode happens once, stacked output is a fresh copy."""
    root = os.path.join(fake_tree, "training")
    hot = ImageFolderDataset(root, image_size=(16, 16))        # auto -> cached
    cold = ImageFolderDataset(root, image_size=(16, 16), cache_decoded=False)
    assert hot._decode_cache is not None and cold._decode_cache is None

    a1 = hot.load_indices(range(5))
    a2 = hot.load_indices(range(5))       # served from cache
    b = cold.load_indices(range(5))
    np.testing.assert_array_equal(a1, b)
    np.testing.assert_array_equal(a1, a2)
    assert len(hot._decode_cache) == 5

    # mutating a returned batch must not poison the cache
    a1[:] = -1.0
    np.testing.assert_array_equal(hot.load_indices(range(5)), b)


def test_decode_cache_auto_disables_for_huge_splits(fake_tree):
    ds = ImageFolderDataset(os.path.join(fake_tree, "training"),
                            image_size=(9000, 9000))  # 16 imgs x ~972 MB > 2 GB
    assert ds._decode_cache is None
