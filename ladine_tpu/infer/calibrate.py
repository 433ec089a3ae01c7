"""Temperature calibration.

The reference tunes the distance-softmax temperature by Nelder-Mead where
EVERY objective evaluation re-runs the full nested-ensemble inference on the
validation split (main.py:356-361 -> test_calibrate,
classification_train_separately.py:449-629) — hours per iteration. But the
temperature only enters through ``convert_to_prob``
(classification_train_separately.py:392-398), so here the MC samples are
drawn ONCE and each objective evaluation is a cheap reweighting
(SURVEY.md section 7 win #4). Identical optimum, ~1000x less compute.

Also provided: the gradient-based softplus-temperature NLL fit of the
reference's ``--tune_T`` path (classification_train_separately.py:1540-1618).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ladine_tpu.metrics.classification import ece, ensemble_confidence, nll


def calibration_objective(samples: np.ndarray, labels: np.ndarray, temperature: float) -> float:
    """ECE of the ensemble mean confidence at the given temperature —
    the reference's test_calibrate return value (:614)."""
    probs = ensemble_confidence(samples, float(temperature))
    return float(ece(probs, labels))


def temperature_search(
    samples: np.ndarray,
    labels: np.ndarray,
    x0: float = 0.2555,
    xatol: float = 1e-4,
    fatol: float = 1e-5,
    max_iter: int = 200,
) -> Tuple[float, float]:
    """Nelder-Mead over the cached-sample ECE (main.py:356-361 settings:
    x0=0.2555, xatol 1e-4, fatol 1e-5). Returns (best_temperature, best_ece).

    Falls back to a dense golden-section-style scan if scipy is absent.
    """
    samples = np.asarray(samples)
    labels = np.asarray(labels)

    def f(t):
        t = float(np.atleast_1d(t)[0])
        if t <= 0:
            return 1e9  # temperature must be positive
        return calibration_objective(samples, labels, t)

    try:
        from scipy.optimize import minimize

        res = minimize(
            f,
            x0=[x0],
            method="Nelder-Mead",
            options={"xatol": xatol, "fatol": fatol, "maxiter": max_iter},
        )
        return float(res.x[0]), float(res.fun)
    except ImportError:
        ts = np.geomspace(1e-3, 10.0, 400)
        vals = [f(t) for t in ts]
        i = int(np.argmin(vals))
        return float(ts[i]), float(vals[i])


def tune_temperature_nll(
    samples: np.ndarray,
    labels: np.ndarray,
    init: float = 0.2555,
    lr: float = 0.01,
    steps: int = 500,
) -> float:
    """Gradient fit of a softplus-parameterized temperature minimizing NLL on
    cached samples (the reference's dead --tune_T path, :1540-1618)."""
    import jax
    import jax.numpy as jnp

    samples_j = jnp.asarray(samples)
    labels_j = jnp.asarray(labels)
    # softplus(raw) == init at start
    raw0 = float(np.log(np.expm1(init)))

    def loss(raw):
        t = jax.nn.softplus(raw)
        probs = ensemble_confidence(samples_j, t)
        return nll(probs, labels_j, eps=1e-12)

    g = jax.jit(jax.grad(loss))
    raw = raw0
    for _ in range(steps):
        raw = raw - lr * float(g(raw))
    return float(np.logaddexp(0.0, raw))  # softplus(raw)
