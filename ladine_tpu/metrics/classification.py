"""Prediction aggregation and calibration metrics.

Parity targets (all from /root/reference/diffusion/classification_train_separately.py):
* majority vote over MC samples            (:51-68)   — tie goes to the
  smallest class index (torch.unique sorts ascending, argmax takes first max).
* distance-softmax probability map         (:392-398) — softmax(-(l-1)^2 / T).
* ensemble mean confidence                 (:425-447)
* ECE, 10 bins, l1                         (:413-423) — torchmetrics
  MulticlassCalibrationError semantics: uniform bins over max-prob
  confidence, sum_b (n_b/N) |acc_b - conf_b|.
* NLL                                      (:400-411)
* top-k accuracy (timm-style, in percent)  (utils.py:231-241)
* Brier score (BASELINE.json parity metric set).

These run on device arrays but are cheap; hosts may call them on numpy too
(jnp works on numpy inputs).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def convert_to_prob(logits: jnp.ndarray, temperature: float) -> jnp.ndarray:
    """softmax(-(logits - 1)^2 / T): distance-to-one-hot probability map.

    The diffusion sampler outputs live near the one-hot vertices of the
    simplex; distance to 1 in each coordinate is the evidence for that class.
    """
    import jax

    d = -((logits - 1.0) ** 2) / temperature
    return jax.nn.softmax(d, axis=-1)


def majority_vote(samples: jnp.ndarray) -> jnp.ndarray:
    """(S, B, C) MC sample logits -> (B,) plurality class of per-sample argmax.

    Ties break toward the smaller class index (reference behavior via sorted
    torch.unique + first-argmax)."""
    votes = jnp.argmax(samples, axis=-1)  # (S, B)
    num_classes = samples.shape[-1]
    counts = jnp.sum(votes[..., None] == jnp.arange(num_classes), axis=0)  # (B, C)
    return jnp.argmax(counts, axis=-1)


def ensemble_confidence(samples: jnp.ndarray, temperature: float) -> jnp.ndarray:
    """(S, B, C) -> (B, C): mean of convert_to_prob over all MC samples."""
    return jnp.mean(convert_to_prob(samples, temperature), axis=0)


def accuracy_topk(
    output: jnp.ndarray, target: jnp.ndarray, topk: Sequence[int] = (1,)
) -> Tuple[jnp.ndarray, ...]:
    """timm-style top-k accuracy in percent (reference utils.py:231-241)."""
    maxk = min(max(topk), output.shape[1])
    order = jnp.argsort(-output, axis=1)[:, :maxk]  # (B, maxk)
    correct = order == target[:, None]
    return tuple(
        jnp.sum(correct[:, : min(k, maxk)]) * 100.0 / target.shape[0] for k in topk
    )


def ece(probs: jnp.ndarray, labels: jnp.ndarray, n_bins: int = 10) -> jnp.ndarray:
    """Expected calibration error, l1 norm, uniform confidence bins.

    Matches torchmetrics MulticlassCalibrationError(n_bins, norm='l1')
    (reference :417): bin by max-prob confidence, ECE =
    sum_b (n_b / N) * |mean_acc_b - mean_conf_b|.
    """
    conf = jnp.max(probs, axis=-1)
    pred = jnp.argmax(probs, axis=-1)
    acc = (pred == labels).astype(jnp.float32)
    # torchmetrics bins via bucketize(conf, linspace(0,1,n+1)) - 1: boundary
    # values fall in the LOWER bin (conf=0.5 with 10 bins -> bin 4), i.e.
    # idx = ceil(conf * n) - 1 clamped to [0, n-1]
    idx = jnp.clip(jnp.ceil(conf * n_bins).astype(jnp.int32) - 1, 0, n_bins - 1)
    n = probs.shape[0]
    bin_count = jnp.zeros(n_bins).at[idx].add(1.0)
    bin_conf = jnp.zeros(n_bins).at[idx].add(conf)
    bin_acc = jnp.zeros(n_bins).at[idx].add(acc)
    nonempty = bin_count > 0
    mean_conf = jnp.where(nonempty, bin_conf / jnp.maximum(bin_count, 1), 0.0)
    mean_acc = jnp.where(nonempty, bin_acc / jnp.maximum(bin_count, 1), 0.0)
    return jnp.sum(jnp.abs(mean_acc - mean_conf) * bin_count / n)


def reliability_bins(probs: jnp.ndarray, labels: jnp.ndarray, n_bins: int = 10):
    """Per-bin (count, mean confidence, accuracy) — the data behind the ECE /
    a reliability diagram. Same binning as :func:`ece`."""
    conf = jnp.max(probs, axis=-1)
    pred = jnp.argmax(probs, axis=-1)
    acc = (pred == labels).astype(jnp.float32)
    idx = jnp.clip(jnp.ceil(conf * n_bins).astype(jnp.int32) - 1, 0, n_bins - 1)
    count = jnp.zeros(n_bins).at[idx].add(1.0)
    sum_conf = jnp.zeros(n_bins).at[idx].add(conf)
    sum_acc = jnp.zeros(n_bins).at[idx].add(acc)
    denom = jnp.maximum(count, 1)
    return count, sum_conf / denom, sum_acc / denom


def nll(probs: jnp.ndarray, labels: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Mean negative log-likelihood of the true class (reference :400-411
    takes log of probabilities directly; eps guards exact zeros)."""
    p = jnp.take_along_axis(probs, labels[:, None], axis=1)[:, 0]
    return -jnp.mean(jnp.log(p + eps))


def brier(probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error between the probability vector and the one-hot
    label (multi-class Brier score)."""
    onehot = (labels[:, None] == jnp.arange(probs.shape[-1])).astype(probs.dtype)
    return jnp.mean(jnp.sum((probs - onehot) ** 2, axis=-1))
