"""APGD-CE (Auto-PGD with cross-entropy), the AutoAttack component the
reference runs for its AUTOPGD mode
(/root/reference/diffusion/classification_train_separately.py:663-667,
AutoAttack(..., version='custom', attacks_to_run implies apgd-ce, Linf).

Croce & Hein's Auto-PGD (ICML 2020): momentum PGD with an automatic step-size
schedule — at checkpoint iterations the step is HALVED and the iterate reset
to the best-so-far point if either (a) fewer than rho x interval iterations
since the last checkpoint improved the objective, or (b) the step wasn't
reduced last time and the best objective didn't improve. Checkpoints follow
p_{j+1} = p_j + max(p_j - p_{j-1} - 0.03, 0.06) starting (0, 0.22).

Implemented as one jitted fori_loop with per-sample step sizes and counters —
no host control flow.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LogitsFn = Callable[[jnp.ndarray], jnp.ndarray]


def _checkpoints(n_iter: int) -> np.ndarray:
    ps = [0.0, 0.22]
    while ps[-1] < 1.0:
        ps.append(ps[-1] + max(ps[-1] - ps[-2] - 0.03, 0.06))
    pts = sorted({int(np.ceil(p * n_iter)) for p in ps if p <= 1.0})
    flags = np.zeros(n_iter + 1, bool)
    for p in pts:
        if 0 < p <= n_iter:
            flags[p] = True
    return flags


def apgd_ce(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    labels: jnp.ndarray,
    eps: float,
    key: jax.Array,
    n_iter: int = 100,
    rho: float = 0.75,
    alpha_momentum: float = 0.75,
    x_init: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``x_init`` overrides the random start point (oracle tests inject the
    same start into this and the torch reference transcription so the
    deterministic trajectory can be compared step-for-step)."""
    b = x.shape[0]
    flags = jnp.asarray(_checkpoints(n_iter))
    # distance between consecutive checkpoints, for the rho test
    idxs = np.flatnonzero(np.asarray(_checkpoints(n_iter)))
    intervals = np.diff(np.concatenate([[0], idxs])) if len(idxs) else np.array([n_iter])
    interval_at = np.zeros(n_iter + 1, np.float32)
    prev = 0
    for i in idxs:
        interval_at[i] = i - prev
        prev = i
    interval_at = jnp.asarray(interval_at)

    def ce(xx):
        logp = jax.nn.log_softmax(logits_fn(xx), axis=-1)
        return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]  # per-sample CE

    grad_fn = jax.grad(lambda xx: jnp.sum(ce(xx)))

    def project(z):
        return jnp.clip(jnp.clip(z, x - eps, x + eps), 0.0, 1.0)

    x0 = (
        project(jnp.asarray(x_init, x.dtype))
        if x_init is not None
        else project(x + jax.random.uniform(key, x.shape, x.dtype, -eps, eps))
    )
    f0 = ce(x0)
    g0 = grad_fn(x0)
    eta0 = jnp.full((b, 1, 1, 1), 2.0 * eps)
    x1 = project(x0 + eta0 * jnp.sign(g0))
    f1 = ce(x1)
    better1 = f1 > f0
    x_best = jnp.where(better1[:, None, None, None], x1, x0)
    f_best = jnp.maximum(f0, f1)

    carry = dict(
        x_k=x1,
        x_prev=x0,
        f_k=f1,
        x_best=x_best,
        f_best=f_best,
        f_best_last_ckpt=f_best,
        eta=eta0,
        eta_reduced_last=jnp.zeros((b,), bool),
        improved=better1.astype(jnp.float32),
    )

    def body(k, carry):
        g = grad_fn(carry["x_k"])
        z = project(carry["x_k"] + carry["eta"] * jnp.sign(g))
        x_new = project(
            carry["x_k"]
            + alpha_momentum * (z - carry["x_k"])
            + (1 - alpha_momentum) * (carry["x_k"] - carry["x_prev"])
        )
        f_new = ce(x_new)
        better = f_new > carry["f_best"]
        x_best = jnp.where(better[:, None, None, None], x_new, carry["x_best"])
        f_best = jnp.maximum(f_new, carry["f_best"])
        # Croce & Hein count steps where f(x^{k+1}) > f(x^k) — the PREVIOUS
        # iterate, not the all-time best
        improved = carry["improved"] + (f_new > carry["f_k"]).astype(jnp.float32)

        is_ckpt = flags[k]

        def at_ckpt(args):
            x_k, x_prev, f_k, x_best, f_best, f_last, eta, reduced, improved = args
            interval = jnp.maximum(interval_at[k], 1.0)
            cond1 = improved < rho * interval
            cond2 = (~reduced) & (f_last >= f_best)
            halve = cond1 | cond2
            eta = jnp.where(halve[:, None, None, None], eta / 2.0, eta)
            # on halving, restart from the best point
            x_k = jnp.where(halve[:, None, None, None], x_best, x_k)
            x_prev = jnp.where(halve[:, None, None, None], x_best, x_prev)
            f_k = jnp.where(halve, f_best, f_k)
            return x_k, x_prev, f_k, x_best, f_best, f_best, eta, halve, jnp.zeros_like(improved)

        def not_ckpt(args):
            return args

        x_k, x_prev, f_k, x_best, f_best, f_last, eta, reduced, improved = jax.lax.cond(
            is_ckpt,
            at_ckpt,
            not_ckpt,
            (
                x_new,
                carry["x_k"],
                f_new,
                x_best,
                f_best,
                carry["f_best_last_ckpt"],
                carry["eta"],
                carry["eta_reduced_last"],
                improved,
            ),
        )
        return dict(
            x_k=x_k,
            x_prev=x_prev,
            f_k=f_k,
            x_best=x_best,
            f_best=f_best,
            f_best_last_ckpt=f_last,
            eta=eta,
            eta_reduced_last=reduced,
            improved=improved,
        )

    carry = jax.lax.fori_loop(2, n_iter + 1, body, carry)
    adv = carry["x_best"]
    return adv, jnp.argmax(logits_fn(adv), -1) != labels
