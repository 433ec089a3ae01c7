import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.infer import (
    EvalConfig,
    calibration_objective,
    compute_report,
    evaluate_ensemble,
    stack_members,
    temperature_search,
    tune_temperature_nll,
)
from ladine_tpu.models import ConditionalModel, SEViTGuidance
from ladine_tpu.ops import DiffusionSchedule


def _synthetic_samples(n=200, s=40, seed=0, sharpness=3.0):
    """MC 'diffusion outputs' near one-hot vertices with class-dependent
    noise, so temperature actually matters."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n)
    onehot = np.eye(2)[labels]
    correct = rng.random(n) < 0.85
    target = np.where(correct[:, None], onehot, 1 - onehot)
    samples = target[None] + rng.normal(scale=0.25, size=(s, n, 2))
    return samples.astype(np.float32), labels


def test_calibration_objective_varies_with_temperature():
    samples, labels = _synthetic_samples()
    e1 = calibration_objective(samples, labels, 0.05)
    e2 = calibration_objective(samples, labels, 1.0)
    assert e1 != e2


def test_temperature_search_improves_ece():
    samples, labels = _synthetic_samples()
    t_best, e_best = temperature_search(samples, labels)
    assert t_best > 0
    e_init = calibration_objective(samples, labels, 0.2555)
    assert e_best <= e_init + 1e-9
    # best is a local minimum vs neighbors
    assert e_best <= calibration_objective(samples, labels, t_best * 1.5) + 1e-6
    assert e_best <= calibration_objective(samples, labels, t_best / 1.5) + 1e-6


def test_tune_temperature_nll_reduces_nll():
    from ladine_tpu.metrics import ensemble_confidence, nll

    samples, labels = _synthetic_samples()
    t = tune_temperature_nll(samples, labels, steps=200)
    assert t > 0
    n_before = float(nll(ensemble_confidence(jnp.asarray(samples), 0.2555), jnp.asarray(labels), eps=1e-12))
    n_after = float(nll(ensemble_confidence(jnp.asarray(samples), t), jnp.asarray(labels), eps=1e-12))
    assert n_after <= n_before + 1e-6


def test_compute_report_keys_and_sanity():
    samples, labels = _synthetic_samples()
    report = compute_report(samples, labels, 0.2)
    assert 0 <= report["ece"] <= 1
    assert report["majority_vote_accuracy"] > 70  # 85% correct by construction
    assert report["num_instances"] == 200
    assert len(report["piw_correct"]) == 2
    assert np.isfinite(report["nll"])


@pytest.fixture(scope="module")
def tiny_pipeline():
    guidance = SEViTGuidance(
        num_classes=2, num_members=3, vit_depth=3,
        img_size=16, patch_size=8, embed_dim=16, num_heads=2, mlp_hidden_dims=(16, 8, 8),
    )
    x = jnp.zeros((4, 16, 16, 3))
    gvars = guidance.init(jax.random.PRNGKey(0), x)
    model = ConditionalModel(data_dim=16 * 16 * 3, feature_dim=8, hidden_dim=8, y_dim=2, n_steps=11)
    members = [
        model.init(jax.random.PRNGKey(5 + i), jnp.zeros((4, 768)), jnp.zeros((4, 2)),
                   jnp.asarray(0), jnp.full((4, 2), 0.5))
        for i in range(3)
    ]
    sched = DiffusionSchedule.create("linear", 10, 1e-4, 0.02)
    return guidance, gvars, model, stack_members(members), sched


def _batches(n_batches=2, b=4, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n_batches):
        yield (
            rng.random((b, 16, 16, 3)).astype(np.float32),
            rng.integers(0, 2, b),
        )


def test_evaluate_ensemble_end_to_end(tiny_pipeline):
    guidance, gvars, model, stacked, sched = tiny_pipeline
    cfg = EvalConfig(mc_trials=2, temperature=0.2)
    report = evaluate_ensemble(
        guidance, gvars, model, stacked, sched, _batches(), cfg, jax.random.PRNGKey(0)
    )
    assert report["num_instances"] == 8
    assert report["num_samples"] == 6  # 3 members x 2 trials
    assert report["samples"].shape == (6, 8, 2)


def test_evaluate_with_corruptions_and_attack(tiny_pipeline):
    guidance, gvars, model, stacked, sched = tiny_pipeline
    cfg = EvalConfig(
        mc_trials=2, temperature=0.2, noise_std=0.05, brightness=0.1,
        contrast=0.9, cover=(0.05, 1), crop=0.1, attack_name="FGSM",
        attack_eps=0.03, ddim_steps=5,
    )
    report = evaluate_ensemble(
        guidance, gvars, model, stacked, sched, _batches(), cfg, jax.random.PRNGKey(0)
    )
    assert np.isfinite(report["samples"]).all()


def test_selected_members_subset(tiny_pipeline):
    """The reference loads 6 members but runs only selected_block_indices
    (classification_train_separately.py:275, 767-769): selected_members
    slices both the guidance heads and the FULL stacked variables."""
    guidance, gvars, model, stacked, sched = tiny_pipeline
    cfg = EvalConfig(mc_trials=2, temperature=0.2, selected_members=(0, 2))
    report = evaluate_ensemble(
        guidance, gvars, model, stacked, sched, _batches(), cfg, jax.random.PRNGKey(0)
    )
    assert report["num_samples"] == 4  # 2 members x 2 trials
    assert np.isfinite(report["samples"]).all()
