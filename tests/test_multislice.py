"""Multi-slice (DCN) mesh recipe: layout, factoring, and train-step parity.

8 virtual CPU devices emulate 4 slices x 2 devices (conftest.py). The
hardware-truth claim — member axis across slices means no per-step DCN
collectives — follows from the layout verified here: each mesh row holds
exactly one slice's devices, and the train step's only cross-device
collective is the gradient psum over the 'data' (intra-row) axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.models import ConditionalModel
from ladine_tpu.ops import DiffusionSchedule
from ladine_tpu.parallel import (
    data_sharding,
    describe_mesh,
    group_devices_by_slice,
    make_mesh,
    make_multislice_mesh,
    member_sharding,
    multislice_factor,
    replicated,
)
from ladine_tpu.train import create_member_states, make_multi_member_step, make_optimizer


def test_group_devices_virtual_split():
    devs = jax.devices()
    groups = group_devices_by_slice(devs, num_slices=4)
    assert [len(g) for g in groups] == [2, 2, 2, 2]
    assert [d.id for g in groups for d in g] == [d.id for d in devs]
    with pytest.raises(ValueError):
        group_devices_by_slice(devs, num_slices=3)


def test_multislice_factor():
    assert multislice_factor(5, 5) == (5, 1)    # one member per slice
    assert multislice_factor(10, 5) == (5, 2)   # member DP over 2 slices
    assert multislice_factor(4, 4) == (4, 1)
    assert multislice_factor(2, 5) == (1, 2)    # 5 members don't split over 2
    assert multislice_factor(1, 5) == (1, 1)


def test_mesh_rows_are_whole_slices():
    # 4 slices x 2 devices, 4 members -> each mesh row IS one slice
    mesh = make_multislice_mesh(num_members=4, num_slices=4)
    assert mesh.devices.shape == (4, 2)
    groups = group_devices_by_slice(jax.devices(), num_slices=4)
    for row, grp in zip(mesh.devices, groups):
        assert [d.id for d in row] == [d.id for d in grp]
    msg = describe_mesh(mesh, num_slices=4)
    assert "ICI" in msg and "DCN" not in msg.split(";")[0].split("rides")[-1]


def test_mesh_data_axis_spanning_slices_is_flagged():
    # 4 slices, 2 members -> each member group owns 2 slices; the data
    # axis then crosses DCN and describe_mesh must say so
    mesh = make_multislice_mesh(num_members=2, num_slices=4)
    assert mesh.devices.shape == (2, 4)
    assert "DCN" in describe_mesh(mesh, num_slices=4)


def test_train_step_parity_on_multislice_mesh():
    """One train step on the multislice mesh == the single-mesh step."""
    model = ConditionalModel(data_dim=48, feature_dim=16, hidden_dim=16,
                             y_dim=2, n_steps=6)
    sched = DiffusionSchedule.create("linear", 5, 1e-4, 0.02)
    tx = make_optimizer("Adam", 1e-3)
    states = create_member_states(model, jax.random.PRNGKey(0), tx, 4, batch_size=8)
    step = make_multi_member_step(model, tx, sched)

    x = jax.random.normal(jax.random.PRNGKey(1), (8, 48))
    y0 = jnp.eye(2)[jnp.array([0, 1] * 4)]
    yhat = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(2), (4, 8, 2)))
    key = jax.random.PRNGKey(3)
    _, ref_losses = jax.jit(step)(states, x, y0, yhat, key)

    mesh = make_multislice_mesh(num_members=4, num_slices=4)
    st = member_sharding(mesh)
    jitted = jax.jit(
        step,
        in_shardings=(jax.tree.map(lambda _: st, states), data_sharding(mesh),
                      data_sharding(mesh), st, replicated(mesh)),
        out_shardings=(jax.tree.map(lambda _: st, states), st),
    )
    states_s = jax.tree.map(lambda l: jax.device_put(l, st), states)
    _, losses = jitted(
        states_s,
        jax.device_put(x, data_sharding(mesh)),
        jax.device_put(y0, data_sharding(mesh)),
        jax.device_put(yhat, st),
        key,
    )
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses), rtol=1e-5)


def test_multislice_mesh_axis_names_match_make_mesh():
    # drop-in compatibility: same axis names as the single-slice mesh, so
    # fsdp_shardings / eval pipeline / joint step work unchanged
    assert make_multislice_mesh(4, 4).axis_names == make_mesh(8, 4).axis_names
