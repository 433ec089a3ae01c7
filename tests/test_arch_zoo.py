"""Arch-selector and remaining-inventory tests (SURVEY.md C5/C14/C17)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.models import ConditionalModel
from ladine_tpu.models.encoders import TrajectoryClassifier
from ladine_tpu.train import cosine_warm_restarts


@pytest.mark.parametrize(
    "arch,x_shape",
    [
        ("simple", (4, 48)),
        ("lenet", (4, 28, 28, 1)),
        ("lenet5", (4, 28, 28, 1)),
        ("fashioncnn", (4, 28, 28, 1)),
        ("resnet18", (4, 32, 32, 3)),
    ],
)
def test_conditional_model_arch_selector(arch, x_shape):
    model = ConditionalModel(
        data_dim=48, feature_dim=8, hidden_dim=8, y_dim=2, n_steps=6, arch=arch
    )
    x = jax.random.normal(jax.random.PRNGKey(0), x_shape)
    y = jnp.zeros((4, 2))
    yhat = jnp.full((4, 2), 0.5)
    v = model.init(jax.random.PRNGKey(1), x, y, jnp.asarray(0), yhat)
    out = model.apply(v, x, y, jnp.asarray(3), yhat)
    assert out.shape == (4, 2)
    assert np.isfinite(np.asarray(out)).all()
    # encode/eps split still exact for every arch
    f = model.apply(v, x, method="encode")
    split = model.apply(v, f, y, jnp.asarray(3), yhat, method="eps")
    np.testing.assert_allclose(np.asarray(out), np.asarray(split), rtol=1e-5, atol=1e-6)


def test_unknown_arch_raises():
    model = ConditionalModel(arch="nope", feature_dim=8, hidden_dim=8, n_steps=6)
    with pytest.raises(ValueError):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)), jnp.zeros((1, 2)),
                   jnp.asarray(0), jnp.zeros((1, 2)))


def test_trajectory_classifier():
    m = TrajectoryClassifier(num_classes=10, feature_dim=64, seq_len=5, d_model=10)
    traj = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 10))
    feat = jax.random.normal(jax.random.PRNGKey(1), (3, 64))
    v = m.init(jax.random.PRNGKey(2), traj, feat)
    out = m.apply(v, traj, feat)
    assert out.shape == (3, 10)


def test_cosine_warm_restarts():
    s = cosine_warm_restarts(1e-3, first_cycle_epochs=10, steps_per_epoch=1)
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(5)) == pytest.approx(5e-4, rel=1e-5)  # mid-cycle
    assert float(s(10)) == pytest.approx(1e-3)  # restart
    s2 = cosine_warm_restarts(1e-3, 10, 1, t_mult=2)
    assert float(s2(10)) == pytest.approx(1e-3)  # first restart at epoch 10
    assert float(s2(20)) == pytest.approx(5e-4, rel=1e-4)  # mid of 20-epoch cycle


def test_resnet_backbone_in_vit_trainer():
    from ladine_tpu.models.encoders import ResNet
    from ladine_tpu.train import create_vit_state, make_optimizer, make_vit_train_step

    m = ResNet(num_classes=2, arch="resnet18")
    tx = make_optimizer("AdamW", 1e-3, weight_decay=0.1)
    state = create_vit_state(m, jax.random.PRNGKey(0), tx, image_size=32)
    step = jax.jit(make_vit_train_step(m, tx))
    images = jnp.stack([jnp.zeros((32, 32, 3)), jnp.ones((32, 32, 3))] * 2)
    labels = jnp.array([0, 1, 0, 1])
    state, loss, acc = step(state, images, labels)
    assert np.isfinite(float(loss))
