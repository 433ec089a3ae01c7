import numpy as np
import pytest

from ladine_tpu.data import (
    ArrayDataset,
    compose,
    normalize,
    random_rotate,
    repeat_channels,
    resize_to,
)


@pytest.fixture
def mnist_like():
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(20, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, size=20)
    return images, labels


def test_array_dataset_basic(mnist_like):
    images, labels = mnist_like
    ds = ArrayDataset(images, labels)
    assert len(ds) == 20
    assert ds.images.shape == (20, 28, 28, 1)  # channel added, scaled
    assert ds.images.max() <= 1.0
    batches = list(ds.batches(8))
    assert [b[0].shape[0] for b in batches] == [8, 8, 4]
    assert list(ds.batches(8, drop_last=True))[-1][0].shape[0] == 8


def test_array_dataset_shuffle_deterministic(mnist_like):
    images, labels = mnist_like
    ds = ArrayDataset(images, labels)
    l1 = np.concatenate([b[1] for b in ds.batches(8, shuffle=True, seed=3)])
    l2 = np.concatenate([b[1] for b in ds.batches(8, shuffle=True, seed=3)])
    np.testing.assert_array_equal(l1, l2)


def test_mnist_family_transform_stack(mnist_like):
    """The reference's RotatedMNIST-for-ViT pipeline (utils.py:131-137):
    rotate -> resize 224 -> repeat 3 channels -> normalize."""
    pytest.importorskip("scipy")
    images, labels = mnist_like
    t = compose(random_rotate(45), resize_to(32, 32), repeat_channels(3),
                normalize((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)))
    ds = ArrayDataset(images, labels, transform=t)
    batch, labs = next(iter(ds.batches(4)))
    assert batch.shape == (4, 32, 32, 3)
    assert batch.min() >= -1.0 - 1e-5 and batch.max() <= 1.0 + 1e-5


def test_array_dataset_feeds_trainer(mnist_like):
    """ArrayDataset plugs into the same trainer surface as ImageFolder."""
    import jax
    import jax.numpy as jnp

    from ladine_tpu.models import ViT
    from ladine_tpu.train import create_vit_state, make_optimizer, make_vit_train_step

    images, labels = mnist_like
    ds = ArrayDataset(images, labels % 2, transform=repeat_channels(3))
    vit = ViT(num_classes=2, img_size=28, patch_size=7, embed_dim=16, depth=1, num_heads=2)
    tx = make_optimizer("AdamW", 1e-3)
    state = create_vit_state(vit, jax.random.PRNGKey(0), tx, image_size=28)
    step = jax.jit(make_vit_train_step(vit, tx))
    for b_images, b_labels in ds.batches(10):
        state, loss, acc = step(state, jnp.asarray(b_images), jnp.asarray(b_labels))
    assert np.isfinite(float(loss))
