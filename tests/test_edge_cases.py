"""Edge cases and cross-cutting sanity properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.attacks import make_attack
from ladine_tpu.config import Config
from ladine_tpu.metrics import accuracy_topk, convert_to_prob, ece
from ladine_tpu.ops import DiffusionSchedule, q_sample
from ladine_tpu.ops.corruptions import random_cover


@pytest.fixture(scope="module")
def linear_model():
    w = jax.random.normal(jax.random.PRNGKey(0), (8 * 8 * 3, 2)) * 0.5

    def logits_fn(x):
        return x.reshape(x.shape[0], -1) @ w

    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 8, 3))
    labels = jnp.argmax(logits_fn(x), -1)
    return logits_fn, x, labels


def test_iterative_attacks_at_least_as_strong_as_fgsm(linear_model):
    """PGD and APGD-CE are iterative refinements of FGSM — at equal epsilon
    their success rates must not be lower (on an easy linear target)."""
    logits_fn, x, labels = linear_model
    eps = 0.02  # small enough that FGSM doesn't already fool everything
    _, s_fgsm = make_attack("FGSM", eps, logits_fn)(x, labels, jax.random.PRNGKey(0))
    _, s_pgd = make_attack("PGD", eps, logits_fn)(x, labels, jax.random.PRNGKey(0))
    _, s_apgd = make_attack("AUTOPGD", eps, logits_fn)(x, labels, jax.random.PRNGKey(0))
    assert float(s_pgd.mean()) >= float(s_fgsm.mean())
    assert float(s_apgd.mean()) >= float(s_fgsm.mean())


def test_convert_to_prob_temperature_extremes():
    logits = jnp.array([[0.9, 0.2]])
    # T -> 0: hard one-hot at the nearest-to-1 coordinate
    hard = np.asarray(convert_to_prob(logits, 1e-4))
    np.testing.assert_allclose(hard, [[1.0, 0.0]], atol=1e-6)
    # T -> inf: uniform
    soft = np.asarray(convert_to_prob(logits, 1e6))
    np.testing.assert_allclose(soft, [[0.5, 0.5]], atol=1e-4)


def test_ece_single_bin():
    probs = jnp.array([[0.55, 0.45]] * 10)
    labels = jnp.zeros(10, dtype=jnp.int32)
    # all in one bin: ECE = |acc - conf| = |1.0 - 0.55|
    assert float(ece(probs, labels)) == pytest.approx(0.45, abs=1e-6)


def test_accuracy_topk_k_exceeds_classes():
    out = jnp.array([[0.9, 0.1], [0.2, 0.8]])
    target = jnp.array([1, 1])
    (t5,) = accuracy_topk(out, target, (5,))  # maxk clamps to num_classes
    assert float(t5) == pytest.approx(100.0)


def test_random_cover_saturated():
    """Degenerate case: large k*n so candidates collide — must still return a
    valid image (falls back to overlapping placement, never hangs)."""
    images = jnp.ones((1, 16, 16, 3))
    out = random_cover(images, 0.25, 4, jax.random.PRNGKey(0))
    arr = np.asarray(out)
    assert arr.shape == images.shape
    assert ((arr == 0) | (arr == 1)).all()
    assert (arr == 0).mean() > 0.3  # a lot of area covered


def test_q_sample_broadcasting():
    sched = DiffusionSchedule.create("linear", 10, 1e-4, 0.02)
    y0 = jnp.ones((4, 2))
    m = jnp.zeros((4, 2))
    noise = jnp.zeros((4, 2))
    # scalar t broadcasts over the batch
    out_scalar = q_sample(y0, m, sched, jnp.asarray(3), noise)
    out_batched = q_sample(y0, m, sched, jnp.full((4,), 3), noise)
    np.testing.assert_allclose(np.asarray(out_scalar), np.asarray(out_batched), rtol=1e-6)


def test_config_unknown_sections_ignored():
    cfg = Config.from_dict({"data": {"dataset": "ISICSkinCancer"},
                            "bogus_section": {"x": 1},
                            "model": {"unknown_field": 42, "feature_dim": 128}})
    assert cfg.data.dataset == "ISICSkinCancer"
    assert cfg.model.feature_dim == 128
    assert not hasattr(cfg, "bogus_section")


def test_config_label_min_max_tuple():
    cfg = Config.from_dict({"data": {"label_min_max": [0.01, 0.99]}})
    assert cfg.data.label_min_max == (0.01, 0.99)
