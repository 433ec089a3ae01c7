import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.models import ConditionalModel, MappingMLP, SEViTGuidance, ViT
from ladine_tpu.ops import DiffusionSchedule
from ladine_tpu.train import (
    create_mapping_states,
    create_member_state,
    create_member_states,
    create_vit_state,
    ema_init,
    ema_update,
    make_full_train_step,
    make_mapping_train_step,
    make_member_step,
    make_multi_member_step,
    make_optimizer,
    make_vit_train_step,
    step_decay,
    warmup_cosine,
)


def test_ema():
    # zero-init accumulator + Adam-style debias (train/ema.py): one update
    # at ANY mu debiases to exactly the params seen — no init anchor
    from ladine_tpu.train import ema_debias

    p = {"a": jnp.ones(3)}
    e = ema_init(p)
    np.testing.assert_allclose(np.asarray(e["a"]), 0.0)
    p2 = {"a": jnp.full(3, 2.0)}
    e2 = ema_update(e, p2, mu=0.9)
    np.testing.assert_allclose(np.asarray(e2["a"]), 0.1 * 2.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ema_debias(e2, 0.9, 1)["a"]), 2.0, rtol=1e-6)


def test_warmup_cosine_schedule():
    s = warmup_cosine(1e-3, warmup_epochs=4, total_epochs=10, steps_per_epoch=10)
    assert float(s(0)) == 0.0
    assert float(s(20)) == pytest.approx(5e-4)  # mid-warmup (epoch 2 of 4)
    assert float(s(40)) == pytest.approx(1e-3)  # warmup end = peak
    assert float(s(100)) == pytest.approx(0.0, abs=1e-9)  # cosine end
    assert float(s(70)) == pytest.approx(5e-4, rel=1e-5)  # cosine midpoint


def test_step_decay():
    s = step_decay(1e-3, step_size_epochs=10, gamma=0.5, steps_per_epoch=5)
    assert float(s(0)) == 1e-3
    assert float(s(49)) == 1e-3  # epoch 9
    assert float(s(50)) == 5e-4  # epoch 10
    assert float(s(100)) == 2.5e-4  # epoch 20


def test_optimizer_factory():
    for name in ["Adam", "AdamW", "RMSProp", "SGD"]:
        tx = make_optimizer(name, 1e-3)
        params = {"w": jnp.ones((3, 3))}
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones((3, 3))}, state, params)
        assert jax.tree.leaves(updates)[0].shape == (3, 3)
    with pytest.raises(NotImplementedError):
        make_optimizer("Adagrad")


@pytest.fixture(scope="module")
def tiny_setup():
    model = ConditionalModel(data_dim=48, feature_dim=8, hidden_dim=8, y_dim=2, n_steps=11)
    sched = DiffusionSchedule.create("linear", 10, 1e-4, 0.02)
    tx = make_optimizer("Adam", 1e-3, grad_clip=1.0)
    return model, sched, tx


def test_member_step_reduces_loss(tiny_setup):
    model, sched, tx = tiny_setup
    state = create_member_state(model, jax.random.PRNGKey(0), tx, batch_size=8)
    step = jax.jit(make_member_step(model, tx, sched))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 48))
    y0 = jnp.tile(jnp.array([[1.0, 0.0]]), (8, 1))
    yhat = jnp.tile(jnp.array([[0.7, 0.3]]), (8, 1))
    losses = []
    for i in range(60):
        state, loss = step(state, x, y0, yhat, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert int(state.step) == 60
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_member_step_updates_ema_and_stats(tiny_setup):
    model, sched, tx = tiny_setup
    state = create_member_state(model, jax.random.PRNGKey(0), tx, batch_size=4)
    step = make_member_step(model, tx, sched, ema_rate=0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 48))
    y0 = jnp.eye(2)[jnp.array([0, 1, 0, 1])]
    new_state, _ = step(state, x, y0, y0, jax.random.PRNGKey(2))
    k0 = np.asarray(state.params["lin4"]["Dense_0"]["kernel"])
    k1 = np.asarray(new_state.params["lin4"]["Dense_0"]["kernel"])
    e1 = np.asarray(new_state.ema["lin4"]["Dense_0"]["kernel"])
    assert not np.allclose(k0, k1)
    # zero-init accumulator: one step at mu=0.5 holds 0.5 * params_1; the
    # debiased read (1 - 0.5^1 divisor) recovers params_1 exactly
    np.testing.assert_allclose(e1, 0.5 * k1, rtol=1e-5)
    from ladine_tpu.train import ema_debias

    deb = ema_debias(new_state.ema, 0.5, new_state.step)
    np.testing.assert_allclose(
        np.asarray(deb["lin4"]["Dense_0"]["kernel"]), k1, rtol=1e-5)
    # batch stats moved
    b0 = np.asarray(state.batch_stats["enc_bn1"]["mean"])
    b1 = np.asarray(new_state.batch_stats["enc_bn1"]["mean"])
    assert not np.allclose(b0, b1)


def test_multi_member_step(tiny_setup):
    model, sched, tx = tiny_setup
    states = create_member_states(model, jax.random.PRNGKey(0), tx, num_members=3, batch_size=4)
    step = jax.jit(make_multi_member_step(model, tx, sched))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 48))
    y0 = jnp.eye(2)[jnp.array([0, 1, 0, 1])]
    yhat = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(2), (3, 4, 2)))
    new_states, losses = step(states, x, y0, yhat, jax.random.PRNGKey(3))
    assert losses.shape == (3,)
    # members are independent: different params after the step
    k = np.asarray(new_states.params["lin1"]["TorchLinear_0"]["Dense_0"]["kernel"])
    assert not np.allclose(k[0], k[1])


def test_full_train_step_with_guidance():
    guidance = SEViTGuidance(
        num_classes=2, num_members=3, vit_depth=3,
        img_size=16, patch_size=8, embed_dim=16, num_heads=2, mlp_hidden_dims=(16, 8, 8),
    )
    x = jnp.zeros((4, 16, 16, 3))
    gvars = guidance.init(jax.random.PRNGKey(0), x)
    model = ConditionalModel(data_dim=16 * 16 * 3, feature_dim=8, hidden_dim=8, y_dim=2, n_steps=6)
    sched = DiffusionSchedule.create("linear", 5, 1e-4, 0.02)
    tx = make_optimizer("Adam", 1e-3)
    states = create_member_states(model, jax.random.PRNGKey(1), tx, 3, batch_size=4)
    step = jax.jit(make_full_train_step(guidance, model, tx, sched, 3, 2))
    images = jax.random.uniform(jax.random.PRNGKey(2), (4, 16, 16, 3))
    labels = jnp.array([0, 1, 1, 0])
    new_states, losses = step(states, gvars, images, labels, jax.random.PRNGKey(3))
    assert losses.shape == (3,)
    assert np.isfinite(np.asarray(losses)).all()
    # guidance is frozen: gvars unchanged by construction (not in state)


def test_joint_train_step():
    """Joint path: guidance CE improves AND diffusion members update."""
    from ladine_tpu.train import make_joint_train_step

    guidance = SEViTGuidance(
        num_classes=2, num_members=3, vit_depth=3,
        img_size=16, patch_size=8, embed_dim=16, num_heads=2, mlp_hidden_dims=(16, 8, 8),
    )
    images = jnp.stack([jnp.zeros((16, 16, 3)), jnp.ones((16, 16, 3))] * 2)
    labels = jnp.array([0, 1, 0, 1])
    gparams = guidance.init(jax.random.PRNGKey(0), images)["params"]
    model = ConditionalModel(data_dim=16 * 16 * 3, feature_dim=8, hidden_dim=8, y_dim=2, n_steps=6)
    sched = DiffusionSchedule.create("linear", 5, 1e-4, 0.02)
    tx = make_optimizer("Adam", 1e-3)
    import optax

    aux_tx = optax.adam(1e-3)
    aux_opt = aux_tx.init(gparams)
    states = create_member_states(model, jax.random.PRNGKey(1), tx, 3, batch_size=4)
    step = jax.jit(make_joint_train_step(guidance, model, tx, aux_tx, sched, 3, 2))
    first_aux = None
    for i in range(30):
        states, gparams, aux_opt, aux_loss, losses = step(
            states, gparams, aux_opt, images, labels, jax.random.PRNGKey(i)
        )
        if first_aux is None:
            first_aux = float(aux_loss)
    assert float(aux_loss) < first_aux  # guidance learned
    assert int(states.step[0]) == 30  # members advanced
    assert np.isfinite(np.asarray(losses)).all()


def test_vit_train_step_learns():
    vit = ViT(num_classes=2, img_size=16, patch_size=8, embed_dim=16, depth=2, num_heads=2)
    tx = make_optimizer("AdamW", 1e-3, weight_decay=0.1)
    state = create_vit_state(vit, jax.random.PRNGKey(0), tx, image_size=16)
    step = jax.jit(make_vit_train_step(vit, tx))
    # two linearly separable "images"
    images = jnp.stack([jnp.zeros((16, 16, 3)), jnp.ones((16, 16, 3))] * 4)
    labels = jnp.array([0, 1] * 4)
    for _ in range(40):
        state, loss, acc = step(state, images, labels)
    assert float(acc) == 1.0
    assert float(loss) < 0.2


def test_mapping_train_step_all_members():
    vit = ViT(num_classes=2, img_size=16, patch_size=8, embed_dim=16, depth=3, num_heads=2)
    vparams = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    mlp = MappingMLP(num_classes=2, hidden_dims=(16, 8, 8))
    tx = make_optimizer("Adam", 1e-3)
    states = create_mapping_states(mlp, jax.random.PRNGKey(1), tx, 3, num_patches=4, embed_dim=16)
    step = jax.jit(make_mapping_train_step(vit, vparams, mlp, tx, 3))
    images = jnp.stack([jnp.zeros((16, 16, 3)), jnp.ones((16, 16, 3))] * 3)
    labels = jnp.array([0, 1] * 3)
    for _ in range(60):
        states, losses, accs = step(states, images, labels)
    assert losses.shape == (3,) and accs.shape == (3,)
    assert np.asarray(accs).min() == 1.0
