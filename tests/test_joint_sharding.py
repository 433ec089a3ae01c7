"""--joint_train on a mesh: the sharded joint step (members sharded, guidance
replicated with CE-gradient psum over 'data') must match the unsharded step."""

import jax
import jax.numpy as jnp
import numpy as np

from ladine_tpu.models import ConditionalModel, SEViTGuidance
from ladine_tpu.ops import DiffusionSchedule
from ladine_tpu.parallel import (
    data_sharding,
    fsdp_shardings,
    make_mesh,
    member_sharding,
    replicated,
    tree_shardings,
)
from ladine_tpu.train import (
    create_member_states,
    make_joint_train_step,
    make_optimizer,
)


def _setup(num_members=4, batch=8):
    guidance = SEViTGuidance(
        num_classes=2, num_members=num_members, vit_depth=num_members,
        img_size=16, patch_size=8, embed_dim=16, num_heads=2,
        mlp_hidden_dims=(16, 8, 8),
    )
    cond = ConditionalModel(data_dim=16 * 16 * 3, feature_dim=8, hidden_dim=8,
                            y_dim=2, n_steps=6)
    sched = DiffusionSchedule.create("linear", 5, 1e-4, 0.02)
    tx = make_optimizer("Adam", 1e-3, grad_clip=1.0)
    aux_tx = make_optimizer("Adam", 1e-3)
    images = jax.random.uniform(jax.random.PRNGKey(0), (batch, 16, 16, 3))
    labels = jnp.tile(jnp.array([0, 1]), batch // 2)
    gvars = guidance.init(jax.random.PRNGKey(1), images)
    states = create_member_states(cond, jax.random.PRNGKey(2), tx, num_members,
                                  batch_size=batch)
    step = make_joint_train_step(guidance, cond, tx, aux_tx, sched,
                                 num_members, 2)
    gparams = gvars["params"]
    aux_opt = aux_tx.init(gparams)
    return step, states, gparams, aux_opt, images, labels


def test_joint_sharded_matches_unsharded():
    step, states, gparams, aux_opt, images, labels = _setup()
    key = jax.random.PRNGKey(3)

    ref = jax.jit(step)(states, gparams, aux_opt, images, labels, key)
    ref_states, ref_gparams, _, ref_aux_loss, ref_losses = ref

    mesh = make_mesh(8, num_members=4)
    st_shard = fsdp_shardings(states, mesh, min_size=0)
    data_s, rep = data_sharding(mesh), replicated(mesh)
    g_shard = tree_shardings(gparams, rep)
    aux_shard = tree_shardings(aux_opt, rep)
    jitted = jax.jit(
        step,
        in_shardings=(st_shard, g_shard, aux_shard, data_s, data_s, rep),
        out_shardings=(st_shard, g_shard, aux_shard, rep, member_sharding(mesh)),
    )
    out = jitted(
        jax.tree.map(jax.device_put, states, st_shard),
        jax.tree.map(lambda x: jax.device_put(x, rep), gparams),
        jax.tree.map(lambda x: jax.device_put(x, rep), aux_opt),
        jax.device_put(images, data_s),
        jax.device_put(labels, data_s),
        key,
    )
    out_states, out_gparams, _, out_aux_loss, out_losses = out

    np.testing.assert_allclose(float(out_aux_loss), float(ref_aux_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_losses), np.asarray(ref_losses),
                               rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(out_gparams), jax.tree.leaves(ref_gparams)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-3)
    for a, b in zip(jax.tree.leaves(out_states.params), jax.tree.leaves(ref_states.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-3)


def test_runner_joint_train_uses_mesh(tmp_path, monkeypatch):
    """The Runner no longer drops the mesh for --joint_train: with >1 device
    the joint path must report a mesh and still produce a checkpoint."""
    import yaml

    from ladine_tpu.cli.main import main

    # 8 virtual CPU devices are configured by tests/conftest.py
    assert len(jax.devices()) >= 2
    exp = str(tmp_path / "exp")
    rc = main([
        "--train", "--demo", "--cpu", "--exp", exp, "--doc", "jm",
        "--joint_train", "--n_epochs", "2", "--timesteps", "6",
    ])
    assert rc == 0
    log = open(f"{exp}/logs/jm/stdout.txt").read()
    assert "training on mesh" in log and "(joint)" in log
    assert "without mesh shardings" not in log
