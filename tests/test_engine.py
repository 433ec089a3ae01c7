import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.infer import (
    member_mc_sample,
    nested_ensemble_sample,
    stack_members,
    unstack_members,
)
from ladine_tpu.models import ConditionalModel
from ladine_tpu.ops import DiffusionSchedule, ddim_timesteps, p_sample_loop


@pytest.fixture(scope="module")
def setup():
    model = ConditionalModel(
        data_dim=24, feature_dim=8, hidden_dim=8, y_dim=2, n_steps=21, guidance=True
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 24))
    y = jnp.zeros((3, 2))
    yhat = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (5, 3, 2)), axis=-1)
    members = [
        model.init(jax.random.PRNGKey(10 + i), x, y, jnp.asarray(0), yhat[0])
        for i in range(5)
    ]
    sched = DiffusionSchedule.create("linear", 20, 1e-4, 0.02)
    return model, members, x, yhat, sched


def test_stack_unstack_roundtrip(setup):
    model, members, *_ = setup
    stacked = stack_members(members)
    k = stacked["params"]["lin1"]["TorchLinear_0"]["Dense_0"]["kernel"]
    assert k.shape[0] == 5
    back = unstack_members(stacked, 5)
    for a, b in zip(jax.tree.leaves(back[2]), jax.tree.leaves(members[2])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_member_mc_sample_shapes(setup):
    model, members, x, yhat, sched = setup
    out = member_mc_sample(model, members[0], x, yhat[0], jax.random.PRNGKey(0), sched, 4)
    assert out.shape == (4, 3, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_member_mc_sample_matches_manual_chain(setup):
    """The vmapped trial chains equal manual p_sample_loop calls with the
    same per-trial keys and precomputed features."""
    model, members, x, yhat, sched = setup
    key = jax.random.PRNGKey(5)
    out = member_mc_sample(model, members[1], x, yhat[1], key, sched, 3)

    f = model.apply(members[1], x, method="encode")

    def eps_fn(y, t):
        return model.apply(members[1], f, y, t, yhat[1], method="eps")

    for i, k in enumerate(jax.random.split(key, 3)):
        manual = p_sample_loop(eps_fn, yhat[1], sched, k)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(manual), rtol=1e-4, atol=1e-5)


def test_nested_ensemble_shapes_and_member_equivalence(setup):
    model, members, x, yhat, sched = setup
    stacked = stack_members(members)
    key = jax.random.PRNGKey(9)
    out = nested_ensemble_sample(model, stacked, x, yhat, key, sched, mc_trials=2)
    assert out.shape == (5, 2, 3, 2)
    member_keys = jax.random.split(key, 5)
    for m in [0, 3]:
        solo = member_mc_sample(model, members[m], x, yhat[m], member_keys[m], sched, 2)
        np.testing.assert_allclose(np.asarray(out[m]), np.asarray(solo), rtol=1e-4, atol=1e-5)


def test_nested_ensemble_ddim(setup):
    model, members, x, yhat, sched = setup
    stacked = stack_members(members)
    tau = ddim_timesteps(20, 5)
    out = nested_ensemble_sample(
        model, stacked, x, yhat, jax.random.PRNGKey(2), sched, mc_trials=2, tau=tau
    )
    assert out.shape == (5, 2, 3, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_nested_ensemble_jits(setup):
    model, members, x, yhat, sched = setup
    stacked = stack_members(members)

    @jax.jit
    def run(sv, xx, yh, key):
        return nested_ensemble_sample(model, sv, xx, yh, key, sched, mc_trials=2)

    out = run(stacked, x, yhat, jax.random.PRNGKey(0))
    out2 = run(stacked, x, yhat, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
    eager = nested_ensemble_sample(
        model, stacked, x, yhat, jax.random.PRNGKey(0), sched, mc_trials=2
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(eager), rtol=1e-4, atol=1e-5)


def test_trials_differ_members_differ(setup):
    """Different MC trials and different members produce different samples
    (the epistemic signal the ensemble aggregates)."""
    model, members, x, yhat, sched = setup
    stacked = stack_members(members)
    out = nested_ensemble_sample(model, stacked, x, yhat, jax.random.PRNGKey(3), sched, 2)
    assert not np.allclose(np.asarray(out[0, 0]), np.asarray(out[0, 1]))
    assert not np.allclose(np.asarray(out[0, 0]), np.asarray(out[1, 0]))
