import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.metrics import (
    accuracy_topk,
    brier,
    convert_to_prob,
    ece,
    ensemble_confidence,
    majority_vote,
    mc_variance_per_class,
    nll,
    piw_per_class,
)


def test_convert_to_prob_peaks_at_one():
    """Coordinates closest to 1 get the highest probability."""
    logits = jnp.array([[1.0, 0.0], [0.0, 1.0], [0.9, 0.5]])
    p = convert_to_prob(logits, temperature=0.2)
    assert np.argmax(np.asarray(p), axis=1).tolist() == [0, 1, 0]
    np.testing.assert_allclose(np.asarray(p).sum(axis=1), 1.0, rtol=1e-6)


def test_convert_to_prob_formula():
    logits = np.array([[0.7, 0.2]])
    T = 0.1737
    d = -((logits - 1.0) ** 2) / T
    expected = np.exp(d) / np.exp(d).sum()
    np.testing.assert_allclose(np.asarray(convert_to_prob(jnp.asarray(logits), T)), expected, rtol=1e-5)


def test_majority_vote_and_ties():
    # 3 samples, 2 instances: inst0 votes [0,0,1] -> 0; inst1 votes [1,0,1] -> 1
    s = jnp.array(
        [
            [[0.9, 0.1], [0.1, 0.9]],
            [[0.8, 0.0], [0.9, 0.1]],
            [[0.2, 0.7], [0.2, 0.8]],
        ]
    )
    mv = np.asarray(majority_vote(s))
    np.testing.assert_array_equal(mv, [0, 1])
    # exact tie -> smaller class index (reference tie-break)
    tie = jnp.array([[[0.9, 0.1]], [[0.1, 0.9]]])
    assert int(majority_vote(tie)[0]) == 0


def test_ensemble_confidence_is_mean():
    s = jnp.array([[[1.0, 0.0]], [[0.0, 1.0]]])
    conf = ensemble_confidence(s, 0.5)
    manual = np.mean(np.asarray(convert_to_prob(s, 0.5)), axis=0)
    np.testing.assert_allclose(np.asarray(conf), manual, rtol=1e-6)


def test_accuracy_topk():
    out = jnp.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4], [0.3, 0.7]])
    target = jnp.array([0, 1, 1, 0])
    (top1,) = accuracy_topk(out, target, (1,))
    assert float(top1) == pytest.approx(50.0)


def test_ece_perfect_and_worst():
    # perfectly calibrated at conf ~1.0 and always correct -> ~0
    probs = jnp.array([[0.999, 0.001]] * 100)
    labels = jnp.zeros(100, dtype=jnp.int32)
    assert float(ece(probs, labels)) == pytest.approx(0.001, abs=1e-3)
    # confident and always wrong -> ~1
    labels_bad = jnp.ones(100, dtype=jnp.int32)
    assert float(ece(probs, labels_bad)) == pytest.approx(0.999, abs=1e-3)


def test_ece_boundary_bin_assignment():
    """torchmetrics puts boundary confidences in the LOWER bin: conf=0.5
    with 10 bins -> bin 4 (bucketize semantics)."""
    # 2 samples at conf exactly 0.5, one correct one wrong -> acc 0.5 in
    # bin 4 -> |0.5 - 0.5| = 0
    probs = jnp.array([[0.5, 0.5], [0.5, 0.5]])
    labels = jnp.array([0, 1])
    assert float(ece(probs, labels)) == pytest.approx(0.0, abs=1e-6)
    # all at 0.5 and all correct: |1.0 - 0.5| = 0.5
    labels2 = jnp.array([0, 0])
    assert float(ece(probs, labels2)) == pytest.approx(0.5, abs=1e-6)


def test_ece_matches_torchmetrics():
    torchmetrics = pytest.importorskip("torchmetrics")
    import torch

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(200, 2)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    labels = rng.integers(0, 2, size=200)
    ours = float(ece(jnp.asarray(probs), jnp.asarray(labels), n_bins=10))
    metric = torchmetrics.classification.MulticlassCalibrationError(
        num_classes=2, n_bins=10, norm="l1"
    )
    theirs = float(metric(torch.tensor(probs), torch.tensor(labels)))
    assert ours == pytest.approx(theirs, abs=1e-5)


def test_nll_and_brier():
    probs = jnp.array([[0.8, 0.2], [0.3, 0.7]])
    labels = jnp.array([0, 1])
    assert float(nll(probs, labels)) == pytest.approx(-(np.log(0.8) + np.log(0.7)) / 2, rel=1e-5)
    expected_brier = np.mean([(0.8 - 1) ** 2 + 0.2**2, 0.3**2 + (0.7 - 1) ** 2])
    assert float(brier(probs, labels)) == pytest.approx(expected_brier, rel=1e-5)


def test_piw_per_class():
    rng = np.random.default_rng(1)
    s = rng.normal(size=(50, 6, 2)).astype(np.float32)
    samples = jnp.asarray(s)
    predicted = jnp.array([0, 0, 1, 1, 0, 1])
    labels = jnp.array([0, 1, 1, 0, 0, 1])
    correct, incorrect = piw_per_class(samples, predicted, labels)
    piw = np.quantile(s, 0.975, axis=0) - np.quantile(s, 0.025, axis=0)
    pred_piw = piw[np.arange(6), np.asarray(predicted)]
    exp_correct_0 = pred_piw[[0, 4]].mean()
    assert float(correct[0]) == pytest.approx(exp_correct_0, rel=1e-4)
    exp_incorrect_1 = pred_piw[[3]].mean()
    assert float(incorrect[1]) == pytest.approx(exp_incorrect_1, rel=1e-4)


def test_piw_matches_torch_quantile():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    s = rng.normal(size=(40, 4, 2)).astype(np.float32)
    ours_lo = np.quantile(s, 0.025, axis=0)
    theirs_lo = torch.quantile(torch.tensor(s), 0.025, dim=0).numpy()
    np.testing.assert_allclose(ours_lo, theirs_lo, rtol=1e-4)


def test_mc_variance_per_class():
    rng = np.random.default_rng(3)
    s = rng.normal(size=(30, 5, 2)).astype(np.float32)
    predicted = jnp.array([0, 1, 0, 1, 0])
    labels = jnp.array([0, 1, 1, 0, 0])
    correct, incorrect = mc_variance_per_class(jnp.asarray(s), predicted, labels)
    var = np.var(s, axis=0, ddof=1)
    assert float(correct[0]) == pytest.approx(var[[0, 4], 0].mean(), rel=1e-4)
    assert float(incorrect[0]) == pytest.approx(var[[2], 0].mean(), rel=1e-4)
    assert float(incorrect[1]) == pytest.approx(var[[3], 1].mean(), rel=1e-4)


def test_empty_group_is_nan():
    s = jnp.ones((10, 2, 2))
    predicted = jnp.array([0, 0])
    labels = jnp.array([0, 0])
    correct, incorrect = piw_per_class(s, predicted, labels)
    assert np.isnan(np.asarray(incorrect)).all()
