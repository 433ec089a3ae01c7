"""Mesh-sharded evaluation pipeline and scan-unroll equivalences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.infer import EvalConfig, make_eval_pipeline, member_mc_sample, stack_members
from ladine_tpu.models import ConditionalModel, SEViTGuidance
from ladine_tpu.ops import DiffusionSchedule
from ladine_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def setup():
    guidance = SEViTGuidance(
        num_classes=2, num_members=4, vit_depth=4,
        img_size=16, patch_size=8, embed_dim=16, num_heads=2, mlp_hidden_dims=(16, 8, 8),
    )
    x = jnp.zeros((8, 16, 16, 3))
    gvars = guidance.init(jax.random.PRNGKey(0), x)
    model = ConditionalModel(data_dim=16 * 16 * 3, feature_dim=8, hidden_dim=8, y_dim=2, n_steps=11)
    members = [
        model.init(jax.random.PRNGKey(5 + i), jnp.zeros((2, 768)), jnp.zeros((2, 2)),
                   jnp.asarray(0), jnp.full((2, 2), 0.5))
        for i in range(4)
    ]
    sched = DiffusionSchedule.create("linear", 10, 1e-4, 0.02)
    return guidance, gvars, model, stack_members(members), sched


def test_sharded_eval_pipeline_matches_unsharded(setup):
    guidance, gvars, model, stacked, sched = setup
    cfg = EvalConfig(mc_trials=2, temperature=0.2, noise_std=0.02)
    images = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3))
    labels = jnp.array([0, 1] * 4)
    key = jax.random.PRNGKey(2)

    plain = make_eval_pipeline(guidance, gvars, model, sched, cfg)
    ref = plain(stacked, images, labels, key)

    mesh = make_mesh(8, num_members=4)
    sharded = make_eval_pipeline(guidance, gvars, model, sched, cfg, mesh=mesh)
    out = sharded(stacked, images, labels, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_unroll_matches_unrolled(setup):
    _, _, model, stacked, sched = setup
    member0 = jax.tree.map(lambda x: x[0], stacked)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 768))
    yhat = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (3, 2)))
    a = member_mc_sample(model, member0, x, yhat, jax.random.PRNGKey(2), sched, 2)
    b = member_mc_sample(model, member0, x, yhat, jax.random.PRNGKey(2), sched, 2, unroll=3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_eta_changes_samples_but_not_shape(setup):
    guidance, gvars, model, stacked, sched = setup
    from ladine_tpu.ops import ddim_timesteps

    member0 = jax.tree.map(lambda x: x[0], stacked)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 768))
    yhat = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (3, 2)))
    tau = ddim_timesteps(10, 4)
    a = member_mc_sample(model, member0, x, yhat, jax.random.PRNGKey(2), sched, 2, tau=tau, eta=0.0)
    b = member_mc_sample(model, member0, x, yhat, jax.random.PRNGKey(2), sched, 2, tau=tau, eta=1.0)
    assert a.shape == b.shape == (2, 3, 2)
    assert not np.allclose(np.asarray(a), np.asarray(b))
