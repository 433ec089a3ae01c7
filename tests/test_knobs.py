"""Reference CLI knobs: --noise_prior, --skip_type, --no_cat_f_phi,
--val_ddim, --eta — round-trip through the config and change behavior
(reference main.py:83-98,126-146)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from ladine_tpu.infer.engine import member_mc_sample, stack_members
from ladine_tpu.models.conditional import ConditionalModel
from ladine_tpu.ops.schedules import DiffusionSchedule


@pytest.fixture(scope="module")
def tiny_member():
    model = ConditionalModel(data_dim=12, feature_dim=8, hidden_dim=8, y_dim=2, n_steps=9)
    x = jnp.zeros((4, 12))
    variables = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((4, 2)), jnp.asarray(0),
        jnp.full((4, 2), 0.5),
    )
    sched = DiffusionSchedule.create("linear", 8, 1e-4, 0.02)
    return model, variables, sched


def test_noise_prior_changes_samples(tiny_member):
    model, variables, sched = tiny_member
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 12))
    y0_hat = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(2), (4, 2)))
    a = member_mc_sample(model, variables, x, y0_hat, jax.random.PRNGKey(3), sched, 2)
    b = member_mc_sample(model, variables, x, y0_hat, jax.random.PRNGKey(3), sched, 2,
                         noise_prior=True)
    assert a.shape == b.shape
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_noise_prior_noop_when_guidance_is_zero(tiny_member):
    """noise_prior only replaces the PRIOR MEAN: with y0_hat == 0 the two
    paths are bit-identical (the conditioning input is unchanged)."""
    model, variables, sched = tiny_member
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 12))
    y0_hat = jnp.zeros((4, 2))
    a = member_mc_sample(model, variables, x, y0_hat, jax.random.PRNGKey(3), sched, 2)
    b = member_mc_sample(model, variables, x, y0_hat, jax.random.PRNGKey(3), sched, 2,
                         noise_prior=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_noise_prior_train_step(tiny_member):
    from ladine_tpu.train import make_member_step, make_optimizer
    from ladine_tpu.train.diffusion_trainer import create_member_state

    model, _, sched = tiny_member
    tx = make_optimizer("Adam", 1e-3, grad_clip=1.0)
    state = create_member_state(model, jax.random.PRNGKey(0), tx, batch_size=4)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 12))
    y0 = jnp.eye(2)[jnp.array([0, 1, 0, 1])]
    y0_hat = jnp.full((4, 2), 0.5)
    _, loss_a = make_member_step(model, tx, sched)(state, x, y0, y0_hat, jax.random.PRNGKey(2))
    _, loss_b = make_member_step(model, tx, sched, noise_prior=True)(
        state, x, y0, y0_hat, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss_a)) and np.isfinite(float(loss_b))
    assert float(loss_a) != float(loss_b)


def test_cli_knobs_roundtrip_config_snapshot(tmp_path):
    """The flags must land in the persisted config snapshot AND the demo
    pipeline must run under them (main.py:221 snapshot behavior)."""
    from ladine_tpu.cli.main import main

    exp = str(tmp_path / "exp")
    rc = main([
        "--test", "--demo", "--cpu", "--exp", exp, "--doc", "k",
        "--mc_trials", "1", "--timesteps", "6", "--ddim", "4",
        "--skip_type", "quad", "--noise_prior", "--no_cat_f_phi",
        "--eta", "0.5", "--val_ddim", "3",
    ])
    assert rc == 0
    snap = yaml.safe_load(open(os.path.join(exp, "logs", "k", "config.yml")))
    assert snap["diffusion"]["noise_prior"] is True
    assert snap["diffusion"]["skip_type"] == "quad"
    assert snap["diffusion"]["include_guidance"] is False
    assert snap["diffusion"]["ddim_eta"] == 0.5
    assert snap["diffusion"]["val_ddim_steps"] == 3
    report = json.load(open(os.path.join(exp, "logs", "k", "report.json")))
    assert 0 <= report["ece"] <= 1


def test_cli_int8_eval_runs(tmp_path):
    """--int8 plumbs through EvalConfig -> engine (kernels/int8.py); the
    demo pipeline must produce a sane report with quantized eps matmuls."""
    from ladine_tpu.cli.main import main

    exp = str(tmp_path / "exp")
    rc = main([
        "--test", "--demo", "--cpu", "--exp", exp, "--doc", "i8",
        "--mc_trials", "1", "--timesteps", "6", "--int8",
    ])
    assert rc == 0
    report = json.load(open(os.path.join(exp, "logs", "i8", "report.json")))
    assert 0 <= report["ece"] <= 1


def test_no_cat_f_phi_changes_param_count():
    """include_guidance=False drops the [y_t, y0_hat] concat: the first
    y-branch layer is half as wide on input (latent_model.py:172-173)."""
    m_g = ConditionalModel(data_dim=12, feature_dim=8, hidden_dim=8, y_dim=2,
                           n_steps=9, guidance=True)
    m_n = ConditionalModel(data_dim=12, feature_dim=8, hidden_dim=8, y_dim=2,
                           n_steps=9, guidance=False)
    x = jnp.zeros((2, 12))
    v_g = m_g.init(jax.random.PRNGKey(0), x, jnp.zeros((2, 2)), jnp.asarray(0),
                   jnp.full((2, 2), 0.5))
    v_n = m_n.init(jax.random.PRNGKey(0), x, jnp.zeros((2, 2)), jnp.asarray(0), None)
    n_g = sum(x.size for x in jax.tree.leaves(v_g["params"]))
    n_n = sum(x.size for x in jax.tree.leaves(v_n["params"]))
    assert n_g > n_n


@pytest.mark.slow
def test_noise_prior_sample_only_reference_semantics(tmp_path):
    """--noise_prior_sample_only: training q_sample keeps the guidance prior
    (the reference's live train loop never consults the flag) while the
    default --noise_prior run trains with the zero prior — the two runs
    produce DIFFERENT weights from the same seed, and the sample-only run's
    weights equal a run without --noise_prior at all (training-side
    equivalence)."""
    from ladine_tpu.cli.main import main
    from ladine_tpu.utils import load_checkpoint

    def train(doc, extra):
        exp = str(tmp_path / doc)
        # ONE epoch: exactly one validation -> best-checkpoint selection is
        # epoch 0 in every run, so saved weights reflect training semantics
        # alone (validation sampling differs between the runs by design)
        rc = main(["--demo", "--train", "--cpu", "--timesteps", "8",
                   "--n_epochs", "1", "--seed", "5", "--exp", exp,
                   "--doc", doc, *extra])
        assert rc == 0
        log_dir = os.path.join(exp, "logs", doc)
        ck = sorted(d for d in os.listdir(log_dir) if d.startswith("diffu_all"))[-1]
        tree, _ = load_checkpoint(os.path.join(log_dir, ck))
        return tree["states"]["params"]

    full = train("np_full", ["--noise_prior"])
    sample_only = train("np_sample_only", ["--noise_prior",
                                           "--noise_prior_sample_only"])
    plain = train("np_off", [])

    l_full = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(full)])
    l_so = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(sample_only)])
    l_plain = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(plain)])
    assert not np.allclose(l_full, l_so)          # training semantics differ
    np.testing.assert_allclose(l_so, l_plain, rtol=1e-6)  # = reference train loop
