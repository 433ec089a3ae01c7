"""White-box gradient attacks via jax.grad.

Parity with the reference's foolbox wrapper
(/root/reference/diffusion/attack.py:6-176): every attack is computed
against the ViT classifier with cross-entropy, images in [0, 1] bounds
(fb.models.PyTorchModel(model, bounds=(0,1)), attack.py:20), all
constructors called with foolbox 3.x DEFAULTS (attack.py:34,55,96,116,136).

Pinned foolbox 3.x default constants (foolbox/attacks/
fast_gradient_method.py, projected_gradient_descent.py,
basic_iterative_method.py — class attribute defaults):

| reference mode | foolbox class                  | rel_stepsize | steps | random_start |
|----------------|--------------------------------|--------------|-------|--------------|
| FGSM           | LinfFastGradientAttack         | 1.0 (=eps)   | 1     | False        |
| PGD            | LinfProjectedGradientDescent   | 0.01/0.3     | 40    | True         |
| L2PGD          | L2ProjectedGradientDescent     | 0.025        | 50    | True         |
| BIM            | **L2**BasicIterativeAttack     | 0.2          | 10    | False        |
| LinfBIM        | LinfBasicIterativeAttack       | 0.2          | 10    | False        |

NOTE the reference's ``BIM`` mode is the **L2** basic iterative attack
(attack.py:96: ``fb.attacks.L2BasicIterativeAttack()``); ``LinfBIM`` is the
separate Linf variant (attack.py:136). Step size is ``rel_stepsize * eps``
per foolbox's ``BaseGradientDescent.run``. Random starts: Linf draws uniform
in the eps-box; L2 draws uniform in the eps-ball (radius ~ U^(1/d)). RNG is
jax-native (bitwise parity with torch RNG is impossible; parity is
statistical).

The reference's foolbox import is a latent bug (absent from
requirements.txt, SURVEY.md C11); here the attacks are first-class, jittable,
and run on TPU — ``logits_fn`` is any pure (B,H,W,C)->(B,classes) function.

The constants above pin the CONFIGURATION; the UPDATE EQUATIONS themselves
are numerically cross-validated step-for-step against torch transcriptions
of foolbox's BaseGradientDescent.run / CW and APGD's Algorithm 1 in
tests/test_attack_oracle.py (deterministic paths exact; random starts
validated distributionally in tests/test_attacks.py).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

LogitsFn = Callable[[jnp.ndarray], jnp.ndarray]


def _ce_grad(logits_fn: LogitsFn, x: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    def loss(xx):
        logits = logits_fn(xx)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

    return jax.grad(loss)(x)


def _success(logits_fn: LogitsFn, x: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(logits_fn(x), axis=-1) != labels


def fgsm(
    logits_fn: LogitsFn, x: jnp.ndarray, labels: jnp.ndarray, eps: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fast Gradient Sign Method (attack.py:22-39)."""
    g = _ce_grad(logits_fn, x, labels)
    adv = jnp.clip(x + eps * jnp.sign(g), 0.0, 1.0)
    return adv, _success(logits_fn, adv, labels)


def _linf_project(adv, x, eps):
    return jnp.clip(jnp.clip(adv, x - eps, x + eps), 0.0, 1.0)


def _l2_project(adv, x, eps):
    delta = adv - x
    norms = jnp.sqrt(jnp.sum(delta**2, axis=(1, 2, 3), keepdims=True))
    factor = jnp.minimum(1.0, eps / jnp.maximum(norms, 1e-12))
    return jnp.clip(x + delta * factor, 0.0, 1.0)


def pgd(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    labels: jnp.ndarray,
    eps: float,
    key: jax.Array,
    steps: int = 40,
    rel_stepsize: float = 0.01 / 0.3,
    random_start: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linf projected gradient descent (attack.py PGD mode)."""
    alpha = eps * rel_stepsize
    if random_start:
        adv = _linf_project(x + jax.random.uniform(key, x.shape, x.dtype, -eps, eps), x, eps)
    else:
        adv = x

    def body(i, adv):
        g = _ce_grad(logits_fn, adv, labels)
        return _linf_project(adv + alpha * jnp.sign(g), x, eps)

    adv = jax.lax.fori_loop(0, steps, body, adv)
    return adv, _success(logits_fn, adv, labels)


def linf_bim(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    labels: jnp.ndarray,
    eps: float,
    steps: int = 10,
    rel_stepsize: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linf Basic Iterative Method — the reference's ``LinfBIM`` mode
    (attack.py:136, foolbox LinfBasicIterativeAttack: rel_stepsize=0.2,
    steps=10, no random start)."""
    key = jax.random.PRNGKey(0)  # unused
    return pgd(logits_fn, x, labels, eps, key, steps, rel_stepsize, random_start=False)


def l2_bim(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    labels: jnp.ndarray,
    eps: float,
    steps: int = 10,
    rel_stepsize: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """L2 Basic Iterative Method — the reference's ``BIM`` mode maps to
    foolbox's **L2**BasicIterativeAttack (attack.py:96), NOT the Linf
    variant: normalized-gradient steps of size 0.2*eps, 10 steps, no random
    start, projection onto the L2 eps-ball."""
    alpha = eps * rel_stepsize

    def body(i, adv):
        g = _ce_grad(logits_fn, adv, labels)
        gn = jnp.sqrt(jnp.sum(g**2, axis=(1, 2, 3), keepdims=True))
        return _l2_project(adv + alpha * g / jnp.maximum(gn, 1e-12), x, eps)

    adv = jax.lax.fori_loop(0, steps, body, x)
    return adv, _success(logits_fn, adv, labels)


# kept as an alias for round-1 callers; the dispatch layer now routes the
# reference's mode names to the correct norm (attacks/__init__.py)
bim = linf_bim


def l2pgd(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    labels: jnp.ndarray,
    eps: float,
    key: jax.Array,
    steps: int = 50,
    rel_stepsize: float = 0.025,
    random_start: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """L2 projected gradient descent (attack.py:41-60). ``random_start``
    mirrors foolbox's flag (default True, as the reference runs it); the
    deterministic path exists for oracle tests (tests/test_attack_oracle.py)."""
    alpha = eps * rel_stepsize
    if random_start:
        k_dir, k_rad = jax.random.split(key)
        u = jax.random.normal(k_dir, x.shape, x.dtype)
        u = u / jnp.maximum(jnp.sqrt(jnp.sum(u**2, axis=(1, 2, 3), keepdims=True)), 1e-12)
        r = jax.random.uniform(k_rad, (x.shape[0], 1, 1, 1)) ** (1.0 / (x[0].size))
        adv = jnp.clip(x + eps * r * u, 0.0, 1.0)
    else:
        adv = x

    def body(i, adv):
        g = _ce_grad(logits_fn, adv, labels)
        gn = jnp.sqrt(jnp.sum(g**2, axis=(1, 2, 3), keepdims=True))
        return _l2_project(adv + alpha * g / jnp.maximum(gn, 1e-12), x, eps)

    adv = jax.lax.fori_loop(0, steps, body, adv)
    return adv, _success(logits_fn, adv, labels)
