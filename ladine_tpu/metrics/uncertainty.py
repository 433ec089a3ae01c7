"""Uncertainty metrics over MC sample sets.

Parity with /root/reference/diffusion/classification_train_separately.py:
* per-class PIW (prediction-interval width, 2.5/97.5 percentiles) split by
  correct/incorrect predictions (:102-140, compute_mean_piws_for_class)
* per-class MC variance split by correct/incorrect (:143-174,
  calculate_variances)

Both use linear-interpolated quantiles (torch.quantile default == numpy
default) and return NaN for empty (class, correctness) cells like the
reference's mean-of-empty.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def piw_per_class(
    samples: jnp.ndarray,
    predicted: jnp.ndarray,
    labels: jnp.ndarray,
    q_lo: float = 2.5,
    q_hi: float = 97.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(S, B, C) samples -> per-class mean PIW for correct / incorrect.

    PIW_b = quantile_hi - quantile_lo over the S sample axis at the
    *predicted* class of each instance; means are grouped by predicted class
    and correctness. Returns two (C,) arrays (NaN where a group is empty).
    """
    lo = jnp.quantile(samples, q_lo / 100.0, axis=0)  # (B, C)
    hi = jnp.quantile(samples, q_hi / 100.0, axis=0)
    piw = hi - lo
    b = piw.shape[0]
    pred_piw = jnp.take_along_axis(piw, predicted[:, None], axis=1)[:, 0]  # (B,)
    num_classes = piw.shape[1]
    correct = predicted == labels

    def group_mean(mask):
        cls_mask = (predicted[:, None] == jnp.arange(num_classes)) & mask[:, None]
        count = jnp.sum(cls_mask, axis=0)
        total = jnp.sum(pred_piw[:, None] * cls_mask, axis=0)
        return jnp.where(count > 0, total / jnp.maximum(count, 1), jnp.nan)

    return group_mean(correct), group_mean(~correct)


def mc_variance_per_class(
    samples: jnp.ndarray,
    predicted: jnp.ndarray,
    labels: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(S, B, C) samples -> per-class mean across-sample variance for
    correct / incorrect predictions at each class's own coordinate.

    Mirrors calculate_variances (:143-174): variance over the S axis
    (unbiased, ddof=1 like torch.var), then averaged over the instances
    predicted as class c that are / are not truly class c. Empty
    (class, correctness) cells are 0.0 — the reference initializes zeros and
    only fills non-empty groups (:147-173).
    """
    num_classes = samples.shape[-1]
    var = jnp.var(samples, axis=0, ddof=1)  # (B, C)

    def group_mean(mask_fn):
        outs = []
        for c in range(num_classes):
            m = (predicted == c) & mask_fn(c)
            count = jnp.sum(m)
            outs.append(jnp.where(count > 0, jnp.sum(var[:, c] * m) / jnp.maximum(count, 1), 0.0))
        return jnp.stack(outs)

    correct = group_mean(lambda c: labels == c)
    incorrect = group_mean(lambda c: labels != c)
    return correct, incorrect


def ttest_certainty(samples, alpha: float = 0.05):
    """Per-instance paired t-test certainty flag (reference dead path,
    classification_train_separately.py:1224-1227): is the mean MC logit of
    the winning class significantly above the runner-up at level alpha?

    samples: (S, B, C). Returns (certain (B,) bool, p_values (B,)).
    Host-side (scipy), like the reference.
    """
    import numpy as np

    s = np.asarray(samples)
    mean = s.mean(axis=0)  # (B, C)
    order = np.argsort(-mean, axis=1)
    top, second = order[:, 0], order[:, 1]
    b = s.shape[1]
    a_col = s[:, np.arange(b), top]
    b_col = s[:, np.arange(b), second]
    try:
        from scipy import stats

        _, p = stats.ttest_rel(a_col, b_col, axis=0)
    except ImportError:  # normal-approx fallback
        d = a_col - b_col
        t = d.mean(0) / (d.std(0, ddof=1) / np.sqrt(d.shape[0]) + 1e-12)
        from math import erf, sqrt

        p = np.array([2 * (1 - 0.5 * (1 + erf(abs(ti) / sqrt(2)))) for ti in t])
    return p < alpha, p


def pavpu(
    probs,
    labels,
    uncertain_mask,
    conf_threshold: float = 0.5,
):
    """PAvPU — Patch Accuracy vs Patch Uncertainty (reference dead path,
    classification_train_separately.py:1703-1720):
    (n_accurate_certain + n_inaccurate_uncertain) / N.

    uncertain_mask: (B,) bool — e.g. the negation of ttest_certainty."""
    import numpy as np

    probs = np.asarray(probs)
    labels = np.asarray(labels)
    unc = np.asarray(uncertain_mask)
    accurate = probs.argmax(-1) == labels
    n_ac = np.sum(accurate & ~unc)
    n_iu = np.sum(~accurate & unc)
    return float((n_ac + n_iu) / len(labels))
