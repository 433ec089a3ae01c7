"""Exponential moving average of parameters as a pure pytree transform.

Parity with /root/reference/diffusion/ema.py:3-33 (shadow = mu * shadow +
(1 - mu) * param, registered at init, updated each step). The reference
never checkpoints nor applies the EMA at eval (SURVEY.md C6); we keep the
EMA inside the train state (``MemberTrainState.ema``) so it IS checkpointed,
and ``--eval_ema`` evaluates/validates the shadow weights
(``Runner._validate(use_ema=...)`` / ``Runner.load_members_from_train_ckpt``)
— documented deviation that fixes the reference's gap while defaulting to
reference behavior (eval on raw params).
"""

from __future__ import annotations

from typing import Any

import jax


def ema_init(params: Any) -> Any:
    """Register: shadow starts as a copy of the params (ema.py:10-14).

    A REAL copy, not an alias: aliased leaves break buffer donation of the
    train state ("attempt to donate the same buffer twice"), which the
    full-dims single-chip paths rely on."""
    return jax.tree.map(lambda p: p.copy() if hasattr(p, "copy") else p, params)


def ema_update(ema: Any, params: Any, mu: float = 0.9999) -> Any:
    """shadow <- mu * shadow + (1 - mu) * param (ema.py:16-21)."""
    return jax.tree.map(lambda e, p: mu * e + (1.0 - mu) * p, ema, params)
