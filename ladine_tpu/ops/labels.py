"""Label casting utilities (reference ``cast_label_to_one_hot_and_prototype``,
/root/reference/diffusion/utils.py:244-254)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def one_hot_and_prototype(
    labels: jnp.ndarray,
    num_classes: int,
    label_min: float = 0.001,
    label_max: float = 0.999,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (one_hot, prototype_logits).

    The prototype is ``logit(normalize_l1(clip(one_hot, min, max)))`` —
    the reference's soft label used by CARD heritage paths.
    """
    one_hot = jnp.asarray(
        jnp.equal(labels[..., None], jnp.arange(num_classes)), jnp.float32
    )
    clipped = jnp.clip(one_hot, label_min, label_max)
    normed = clipped / jnp.sum(clipped, axis=-1, keepdims=True)
    logits = jnp.log(normed) - jnp.log1p(-normed)
    return one_hot, logits
