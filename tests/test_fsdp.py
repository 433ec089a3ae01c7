"""FSDP-style state sharding: correctness vs unsharded training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.models import ConditionalModel
from ladine_tpu.ops import DiffusionSchedule
from ladine_tpu.parallel import (
    DATA_AXIS,
    MEMBER_AXIS,
    data_sharding,
    fsdp_shardings,
    make_mesh,
    member_sharding,
    replicated,
)
from ladine_tpu.train import create_member_states, make_multi_member_step, make_optimizer


def test_fsdp_shardings_structure():
    mesh = make_mesh(8, num_members=2)
    leaves = {
        "big": jnp.zeros((2, 1024, 1024)),
        "small": jnp.zeros((2, 7)),
        "odd": jnp.zeros((2, 1023, 64)),  # second dim doesn't tile data axis
    }
    sh = fsdp_shardings(leaves, mesh)
    assert sh["big"].spec == jax.sharding.PartitionSpec(MEMBER_AXIS, DATA_AXIS)
    assert sh["small"].spec == jax.sharding.PartitionSpec(MEMBER_AXIS)
    assert sh["odd"].spec == jax.sharding.PartitionSpec(MEMBER_AXIS)


def test_fsdp_train_step_matches_unsharded():
    model = ConditionalModel(data_dim=48, feature_dim=16, hidden_dim=16, y_dim=2, n_steps=6)
    sched = DiffusionSchedule.create("linear", 5, 1e-4, 0.02)
    tx = make_optimizer("Adam", 1e-3)
    states = create_member_states(model, jax.random.PRNGKey(0), tx, 4, batch_size=8)
    step = make_multi_member_step(model, tx, sched)

    x = jax.random.normal(jax.random.PRNGKey(1), (8, 48))
    y0 = jnp.eye(2)[jnp.array([0, 1] * 4)]
    yhat = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(2), (4, 8, 2)))
    key = jax.random.PRNGKey(3)

    ref_states, ref_losses = jax.jit(step)(states, x, y0, yhat, key)

    mesh = make_mesh(8, num_members=4)
    fs = fsdp_shardings(states, mesh, min_size=0)
    jitted = jax.jit(
        step,
        in_shardings=(fs, data_sharding(mesh), data_sharding(mesh),
                      member_sharding(mesh), replicated(mesh)),
        out_shardings=(fs, member_sharding(mesh)),
    )
    states_f = jax.tree.map(jax.device_put, states, fs)
    out_states, out_losses = jitted(
        states_f,
        jax.device_put(x, data_sharding(mesh)),
        jax.device_put(y0, data_sharding(mesh)),
        jax.device_put(yhat, member_sharding(mesh)),
        key,
    )
    np.testing.assert_allclose(np.asarray(out_losses), np.asarray(ref_losses), rtol=1e-5)
    # params land within Adam's first-step sign-flip bound (see test_sharding)
    for a, b in zip(jax.tree.leaves(out_states.params), jax.tree.leaves(ref_states.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-3)
    # state is actually distributed: a big leaf's addressable shard is smaller
    k = out_states.params["enc_lin1"]["Dense_0"]["kernel"]
    shard_elems = k.addressable_shards[0].data.size
    assert shard_elems < k.size