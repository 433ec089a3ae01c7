"""Exponential moving average of parameters as a pure pytree transform.

The update rule is the reference's (shadow = mu * shadow + (1 - mu) * param,
/root/reference/diffusion/ema.py:16-21), but the ACCUMULATOR is stored
zero-initialized and debiased at read time (divide by 1 - mu^t, the Adam
convention). The reference registers the shadow as a copy of the random
init (ema.py:10-14) and then never applies it at eval (SURVEY.md C6) — so
its anchoring-to-init flaw is invisible there. Here ``--eval_ema`` DOES
apply the shadow, and with mu=0.9999 a copy-initialized shadow is still
~mu^t random-init at realistic epoch counts (the round-3 evidence row:
53.57% EMA vs 88.57% raw — a plumbing demo, not a usable average). The
debiased form is an exact weighted average of the post-init parameter
trajectory at every step count.

Checkpoints record ``meta["ema_init"] = "zero"``; the eval loaders debias
only when the marker is present, so legacy copy-initialized checkpoints
keep their old (direct-read) behavior.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_init(params: Any) -> Any:
    """Zero-initialized accumulator (read through :func:`ema_debias`).

    Fresh zeros per leaf, never aliases: aliased leaves break buffer
    donation of the train state ("attempt to donate the same buffer
    twice"), which the full-dims single-chip paths rely on."""
    return jax.tree.map(jnp.zeros_like, params)


def ema_update(ema: Any, params: Any, mu: float = 0.9999) -> Any:
    """shadow <- mu * shadow + (1 - mu) * param (ema.py:16-21)."""
    return jax.tree.map(lambda e, p: mu * e + (1.0 - mu) * p, ema, params)


def ema_debias(ema: Any, mu: float, step) -> Any:
    """Bias-corrected shadow weights: accumulator / (1 - mu^step).

    ``step`` is the member's update count (scalar or 0-d array). At step 0
    there is no trajectory to average — returns the raw (all-zero)
    accumulator unchanged rather than dividing by zero; eval of an
    untrained member is refused upstream anyway."""
    step = jnp.asarray(step)
    denom = 1.0 - mu ** step.astype(jnp.float32)
    scale = jnp.where(step > 0, 1.0 / jnp.maximum(denom, 1e-12), 1.0)
    return jax.tree.map(lambda e: (e * scale).astype(e.dtype), ema)


def ema_read(ema: Any, mu: float, step, mode: str) -> Any:
    """THE shadow-weight read convention, in one place: ``mode == "zero"``
    (this build's checkpoints) debiases the zero-init accumulator by
    1 - mu^step; any other mode is a legacy copy-initialized shadow whose
    accumulator IS directly-usable weights."""
    return ema_debias(ema, mu, step) if mode == "zero" else ema


def ema_params_from_ckpt(st: Any, meta: dict) -> Any:
    """EMA weights from a checkpoint's stacked ``states`` tree, debiased iff
    the checkpoint was trained with the zero-initialized accumulator
    (``meta["ema_init"] == "zero"``). Legacy copy-initialized shadows are
    directly usable weights and pass through unchanged."""
    if meta.get("ema_init") != "zero":
        return st["ema"]
    step = st.get("step")
    if step is None:
        raise ValueError(
            "zero-init EMA checkpoint is missing the per-member 'step' "
            "counter needed for debiasing — re-save it or evaluate raw params"
        )
    mu = float(meta.get("ema_rate", 0.9999))
    return jax.vmap(lambda e, s: ema_read(e, mu, s, "zero"))(
        st["ema"], jnp.asarray(step)
    )
