"""Multi-device sharding tests on the virtual 8-CPU-device mesh — the
stand-in for a TPU slice (SURVEY.md section 4 implication (d))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.infer import nested_ensemble_sample, stack_members
from ladine_tpu.models import ConditionalModel, SEViTGuidance
from ladine_tpu.ops import DiffusionSchedule
from ladine_tpu.parallel import (
    data_sharding,
    factor_mesh,
    make_mesh,
    member_data_sharding,
    member_sharding,
    replicated,
    shard_pytree,
    tree_shardings,
)
from ladine_tpu.train import create_member_states, make_full_train_step, make_optimizer


def test_factor_mesh():
    assert factor_mesh(8, 5) == (1, 8)
    assert factor_mesh(8, 10) == (2, 4)
    assert factor_mesh(8, 8) == (8, 1)
    assert factor_mesh(4, 6) == (2, 2)


def test_make_mesh_axes():
    mesh = make_mesh(8, num_members=4)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("member", "data")


@pytest.fixture(scope="module")
def sharded_setup():
    mesh = make_mesh(8, num_members=4)
    guidance = SEViTGuidance(
        num_classes=2, num_members=4, vit_depth=4,
        img_size=16, patch_size=8, embed_dim=16, num_heads=2, mlp_hidden_dims=(16, 8, 8),
    )
    x = jnp.zeros((8, 16, 16, 3))
    gvars = guidance.init(jax.random.PRNGKey(0), x)
    model = ConditionalModel(data_dim=16 * 16 * 3, feature_dim=8, hidden_dim=8, y_dim=2, n_steps=6)
    sched = DiffusionSchedule.create("linear", 5, 1e-4, 0.02)
    tx = make_optimizer("Adam", 1e-3)
    states = create_member_states(model, jax.random.PRNGKey(1), tx, 4, batch_size=8)
    return mesh, guidance, gvars, model, sched, tx, states


def test_sharded_full_train_step_matches_unsharded(sharded_setup):
    mesh, guidance, gvars, model, sched, tx, states = sharded_setup
    images = jax.random.uniform(jax.random.PRNGKey(2), (8, 16, 16, 3))
    labels = jnp.array([0, 1, 1, 0, 0, 1, 1, 0])
    step = make_full_train_step(guidance, model, tx, sched, 4, 2)

    # unsharded reference
    ref_states, ref_losses = jax.jit(step)(states, gvars, images, labels,
                                           jax.random.PRNGKey(3))

    # sharded: member axis over 'member', batch over 'data', guidance replicated
    st_shard = tree_shardings(states, member_sharding(mesh))
    sharded_step = jax.jit(
        step,
        in_shardings=(st_shard, tree_shardings(gvars, replicated(mesh)),
                      data_sharding(mesh), data_sharding(mesh), replicated(mesh)),
        out_shardings=(st_shard, member_sharding(mesh)),
    )
    states_s = shard_pytree(states, member_sharding(mesh))
    images_s = jax.device_put(images, data_sharding(mesh))
    labels_s = jax.device_put(labels, data_sharding(mesh))
    out_states, out_losses = sharded_step(states_s, gvars, images_s, labels_s,
                                          jax.random.PRNGKey(3))

    np.testing.assert_allclose(np.asarray(out_losses), np.asarray(ref_losses), rtol=1e-5)
    # Adam's first step is ~lr * sign(grad); cross-device psum reduction order
    # can flip the sign of near-zero float32 gradients, so individual params
    # may differ by up to 2*lr — bound by that, not exact equality.
    for a, b in zip(jax.tree.leaves(out_states.params), jax.tree.leaves(ref_states.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-3)


def test_sharded_inference_matches_unsharded(sharded_setup):
    mesh, guidance, gvars, model, sched, tx, states = sharded_setup
    x_flat = jax.random.normal(jax.random.PRNGKey(4), (8, 16 * 16 * 3))
    yhat = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(5), (4, 8, 2)))
    variables = jax.vmap(lambda s: {"params": s.params, "batch_stats": s.batch_stats})(states)

    def run(v, xf, yh, key):
        return nested_ensemble_sample(model, v, xf, yh, key, sched, mc_trials=2)

    ref = jax.jit(run)(variables, x_flat, yhat, jax.random.PRNGKey(6))

    v_shard = tree_shardings(variables, member_sharding(mesh))
    sharded = jax.jit(
        run,
        in_shardings=(v_shard, data_sharding(mesh), member_data_sharding(mesh), replicated(mesh)),
        out_shardings=member_data_sharding(mesh),
    )(
        shard_pytree(variables, member_sharding(mesh)),
        jax.device_put(x_flat, data_sharding(mesh)),
        jax.device_put(yhat, member_data_sharding(mesh)),
        jax.random.PRNGKey(6),
    )
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_eight_devices_present():
    assert len(jax.devices()) == 8
