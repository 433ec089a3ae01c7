import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.ops.corruptions import (
    add_noise,
    adjust_brightness,
    adjust_contrast,
    apply_corruptions,
    down_up_sample,
    random_cover,
    random_crop_and_resize,
)


@pytest.fixture
def images():
    return jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))


def test_add_noise_statistics(images):
    out = add_noise(images, 0.1, jax.random.PRNGKey(1))
    diff = np.asarray(out - images)
    assert np.std(diff) == pytest.approx(0.1, rel=0.1)
    assert np.mean(diff) == pytest.approx(0.0, abs=0.01)


def test_down_up_sample_smooths(images):
    out = down_up_sample(images, 4)
    assert out.shape == images.shape
    # low-pass: variance strictly drops for random input
    assert float(jnp.var(out)) < float(jnp.var(images))
    # identity at k=1
    out1 = down_up_sample(images, 1)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(images), atol=1e-6)


def test_down_up_matches_torch_interpolate(images):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = torch.tensor(np.asarray(images)).permute(0, 3, 1, 2)
    d = F.interpolate(x, size=(8, 8), mode="bilinear", align_corners=False)
    u = F.interpolate(d, size=(32, 32), mode="bilinear", align_corners=False)
    theirs = u.permute(0, 2, 3, 1).numpy()
    ours = np.asarray(down_up_sample(images, 4))
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_brightness(images):
    out = adjust_brightness(images, 0.3)
    np.testing.assert_allclose(
        np.asarray(out), np.clip(np.asarray(images) + 0.3, 0, 1), atol=1e-6
    )
    assert float(out.max()) <= 1.0


def test_contrast(images):
    out = adjust_contrast(images, 0.5)
    x = np.asarray(images)
    m = x.mean(axis=(1, 2, 3), keepdims=True)
    np.testing.assert_allclose(np.asarray(out), np.clip(m + (x - m) * 0.5, 0, 1), atol=1e-6)
    # k=1 is identity (images already in [0,1])
    np.testing.assert_allclose(np.asarray(adjust_contrast(images, 1.0)), np.asarray(images), atol=1e-6)


def test_random_cover_area_and_nonoverlap(images):
    k, n = 0.05, 3
    out = random_cover(images, k, n, jax.random.PRNGKey(2))
    side = int((k * 32 * 32) ** 0.5)
    zeroed = np.all(np.asarray(out) == 0, axis=-1).sum(axis=(1, 2))
    # non-overlapping squares -> exactly n * side^2 zeroed pixels (random
    # input has no exact zeros elsewhere, prob ~0)
    np.testing.assert_array_equal(zeroed, n * side * side)


def test_random_cover_noop(images):
    out = random_cover(images, 0.0, 0, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(images))


def test_random_crop_and_resize(images):
    out = random_crop_and_resize(images, 0.3, jax.random.PRNGKey(4))
    assert out.shape == images.shape
    assert not np.allclose(np.asarray(out), np.asarray(images))
    assert np.isfinite(np.asarray(out)).all()


def test_apply_corruptions_order_and_identity(images):
    # all disabled -> identity
    out = apply_corruptions(images, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(images))
    # enabled stages compose
    out2 = apply_corruptions(
        images, jax.random.PRNGKey(5), noise_std=0.05, brightness=0.1, contrast=0.9
    )
    manual = add_noise(images, 0.05, jax.random.split(jax.random.PRNGKey(5), 3)[0])
    manual = adjust_brightness(manual, 0.1)
    manual = adjust_contrast(manual, 0.9)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(manual), atol=1e-6)


def test_apply_corruptions_jits(images):
    import functools

    f = jax.jit(
        functools.partial(apply_corruptions, noise_std=0.05, low_resolution=2, crop=0.1)
    )
    out = f(images, jax.random.PRNGKey(6))
    assert out.shape == images.shape
