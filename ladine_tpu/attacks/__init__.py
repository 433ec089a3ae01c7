"""Attack harness dispatch, mirroring the reference's Attack class surface
(/root/reference/diffusion/attack.py:6-176 + the AutoAttack AUTOPGD path,
classification_train_separately.py:661-667, utils.py:258-269)."""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ladine_tpu.attacks.autopgd import apgd_ce
from ladine_tpu.attacks.cw import cw_l2
from ladine_tpu.attacks.gradient import bim, fgsm, l2_bim, l2pgd, linf_bim, pgd

ATTACKS = ("FGSM", "PGD", "BIM", "LinfBIM", "L2PGD", "CW", "AUTOPGD")


def make_attack(name: str, epsilon: float, logits_fn) -> Callable:
    """Return attack(x, labels, key) -> (adv_images, success), jittable.

    ``logits_fn`` is the model under attack — the full ViT forward in the
    reference (the diffusion ensemble then defends against transfers)."""
    if name == "FGSM":
        return lambda x, labels, key: fgsm(logits_fn, x, labels, epsilon)
    if name == "PGD":
        return lambda x, labels, key: pgd(logits_fn, x, labels, epsilon, key)
    if name == "BIM":
        # the reference's BIM mode is foolbox's **L2** basic iterative attack
        # (attack.py:96); LinfBIM below is the Linf variant (attack.py:136)
        return lambda x, labels, key: l2_bim(logits_fn, x, labels, epsilon)
    if name == "LinfBIM":
        return lambda x, labels, key: linf_bim(logits_fn, x, labels, epsilon)
    if name == "L2PGD":
        return lambda x, labels, key: l2pgd(logits_fn, x, labels, epsilon, key)
    if name == "CW":
        # the reference passes epsilons=eps and consumes foolbox's CLIPPED
        # second return (attack.py:77-81); non-positive eps = unclipped
        eps_cw = epsilon if epsilon and epsilon > 0 else None
        return lambda x, labels, key: cw_l2(logits_fn, x, labels, epsilon=eps_cw)
    if name == "AUTOPGD":
        return lambda x, labels, key: apgd_ce(logits_fn, x, labels, epsilon, key)
    raise ValueError(f"unknown attack {name!r}; one of {ATTACKS}")


def apply_attack(attack_fn, images, labels, key) -> jnp.ndarray:
    """Reference apply_attack (utils.py:258-269): returns the adversarial
    images only."""
    adv, _ = attack_fn(images, labels, key)
    return adv
