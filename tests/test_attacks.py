import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.attacks import apply_attack, make_attack
from ladine_tpu.attacks.autopgd import _checkpoints


@pytest.fixture(scope="module")
def linear_model():
    """A weak linear 'classifier' on 8x8x3 images: easy to fool, fast."""
    w = jax.random.normal(jax.random.PRNGKey(0), (8 * 8 * 3, 2)) * 0.5

    def logits_fn(x):
        return x.reshape(x.shape[0], -1) @ w

    x = jax.random.uniform(jax.random.PRNGKey(1), (6, 8, 8, 3))
    labels = jnp.argmax(logits_fn(x), -1)  # correctly classified by construction
    return logits_fn, x, labels


@pytest.mark.parametrize("name", ["FGSM", "PGD", "BIM", "LinfBIM", "L2PGD", "AUTOPGD"])
def test_attack_fools_linear_model(linear_model, name):
    logits_fn, x, labels = linear_model
    eps = 0.5 if name in ("L2PGD", "BIM") else 0.1
    attack = make_attack(name, eps, logits_fn)
    adv, success = attack(x, labels, jax.random.PRNGKey(2))
    assert adv.shape == x.shape
    assert float(adv.min()) >= 0.0 and float(adv.max()) <= 1.0
    # a linear model with eps=0.1 Linf budget should be mostly fooled
    assert np.asarray(success).mean() >= 0.5


def test_fgsm_respects_epsilon(linear_model):
    logits_fn, x, labels = linear_model
    adv, _ = make_attack("FGSM", 0.03, logits_fn)(x, labels, jax.random.PRNGKey(0))
    assert float(jnp.abs(adv - x).max()) <= 0.03 + 1e-6


def test_pgd_respects_epsilon(linear_model):
    logits_fn, x, labels = linear_model
    adv, _ = make_attack("PGD", 0.05, logits_fn)(x, labels, jax.random.PRNGKey(0))
    assert float(jnp.abs(adv - x).max()) <= 0.05 + 1e-6


def test_l2pgd_respects_epsilon(linear_model):
    logits_fn, x, labels = linear_model
    adv, _ = make_attack("L2PGD", 0.5, logits_fn)(x, labels, jax.random.PRNGKey(0))
    norms = jnp.sqrt(jnp.sum((adv - x) ** 2, axis=(1, 2, 3)))
    assert float(norms.max()) <= 0.5 + 1e-5


def test_autopgd_respects_epsilon(linear_model):
    logits_fn, x, labels = linear_model
    adv, _ = make_attack("AUTOPGD", 0.05, logits_fn)(x, labels, jax.random.PRNGKey(0))
    assert float(jnp.abs(adv - x).max()) <= 0.05 + 1e-6


def test_cw_fools_and_stays_close(linear_model):
    logits_fn, x, labels = linear_model
    attack = make_attack("CW", 0.0, logits_fn)  # eps <= 0: unclipped minimizer
    adv, success = attack(x, labels, jax.random.PRNGKey(0))
    assert np.asarray(success).mean() >= 0.5
    # CW minimizes L2: fooled samples should be close to the originals
    l2 = np.sqrt(np.sum(np.asarray(adv - x) ** 2, axis=(1, 2, 3)))
    assert l2[np.asarray(success)].max() < 5.0


def test_cw_respects_epsilon_like_foolbox(linear_model):
    """The reference consumes foolbox's eps-CLIPPED second return
    (attack.py:77-81): with epsilons=eps the CW perturbation is clipped to
    the L2 eps-ball and success recomputed on the clipped image."""
    logits_fn, x, labels = linear_model
    adv, success = make_attack("CW", 0.05, logits_fn)(x, labels, jax.random.PRNGKey(0))
    norms = np.sqrt(np.sum(np.asarray(adv - x) ** 2, axis=(1, 2, 3)))
    assert norms.max() <= 0.05 + 1e-5
    # success must describe the clipped images, not the unclipped minimizer
    fooled_now = np.asarray(jnp.argmax(logits_fn(adv), -1) != labels)
    np.testing.assert_array_equal(np.asarray(success), fooled_now)


def test_bim_is_l2_not_linf(linear_model):
    """Reference BIM = foolbox L2BasicIterativeAttack (attack.py:96): the
    perturbation lives in the L2 eps-ball — for eps far below sqrt(d) an
    Linf-style signed step would overshoot it immediately."""
    logits_fn, x, labels = linear_model
    eps = 0.3
    adv, _ = make_attack("BIM", eps, logits_fn)(x, labels, jax.random.PRNGKey(0))
    norms = np.sqrt(np.sum(np.asarray(adv - x) ** 2, axis=(1, 2, 3)))
    assert norms.max() <= eps + 1e-5
    # and it must actually move (one normalized step is 0.2*eps long)
    assert norms.min() > 0.01


def test_linf_bim_respects_epsilon(linear_model):
    logits_fn, x, labels = linear_model
    adv, _ = make_attack("LinfBIM", 0.05, logits_fn)(x, labels, jax.random.PRNGKey(0))
    assert float(jnp.abs(adv - x).max()) <= 0.05 + 1e-6


def test_apply_attack_returns_images(linear_model):
    logits_fn, x, labels = linear_model
    attack = make_attack("FGSM", 0.1, logits_fn)
    adv = apply_attack(attack, x, labels, jax.random.PRNGKey(0))
    assert adv.shape == x.shape


def test_unknown_attack_raises(linear_model):
    logits_fn, _, _ = linear_model
    with pytest.raises(ValueError):
        make_attack("DeepFool", 0.1, logits_fn)


def test_apgd_checkpoint_schedule():
    flags = _checkpoints(100)
    idx = np.flatnonzero(flags)
    assert idx[0] == 22  # ceil(0.22 * 100)
    assert (np.diff(idx) >= 6).all()  # minimum interval 0.06 * n_iter
    assert idx[-1] <= 100


def test_attacks_jit(linear_model):
    logits_fn, x, labels = linear_model
    attack = jax.jit(make_attack("PGD", 0.1, logits_fn))
    adv, success = attack(x, labels, jax.random.PRNGKey(0))
    assert adv.shape == x.shape
