"""Fully-fused eval-mode eps_theta y-branch — the body of the reverse scan.

Reproduces ConditionalModel.eps (models/conditional.py) at inference exactly,
but with each (ConditionalLinear -> BatchNorm -> Softplus [-> f gate]) layer
collapsed into one Pallas kernel call (kernels/fused_linear.py): the timestep
gate and eval BatchNorm fold into per-unit (scale, shift) computed per step,
and the f (.) y conditioning rides the first layer's epilogue. Only the raw
weights and the (rows, feature_dim) layer outputs ever touch HBM.

Enabled via the engine's ``use_pallas_eps`` flag; numerics are tested equal
to the Flax path (tests/test_kernels.py).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ladine_tpu.kernels.fused_linear import fused_linear_act

_BN_EPS = 1e-5


def _fold(cl_params: Any, bn_params: Any, bn_stats: Any, t: jnp.ndarray):
    """Fold (timestep gate, BN eval affine) into (W, b, a, c):
    layer(x) = softplus((x @ W) * a + c) where a, c absorb gamma_t and BN."""
    dense = cl_params["TorchLinear_0"]["Dense_0"]
    w = dense["kernel"]
    b = dense["bias"]
    gamma = cl_params["embed"][t]
    inv = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + _BN_EPS)
    a = gamma * inv
    c = gamma * b * inv + bn_params["bias"] - bn_stats["mean"] * inv
    return w, a, c


def fused_eps(
    variables: Any,
    f: jnp.ndarray,
    y: jnp.ndarray,
    t: jnp.ndarray,
    y_hat: jnp.ndarray,
) -> jnp.ndarray:
    """(R, F) features + (R, C) y_t + scalar t + (R, C) guidance -> (R, C) eps.

    Equivalent to ``model.apply(vars, f, y, t, y_hat, method='eps')`` with
    guidance=True, train=False.
    """
    params = variables["params"]
    stats = variables["batch_stats"]

    y_in = jnp.concatenate([y, y_hat], axis=-1)

    w1, a1, c1 = _fold(params["lin1"], params["unetnorm1"], stats["unetnorm1"], t)
    h = fused_linear_act(y_in, w1, a1, c1, mult=f)

    w2, a2, c2 = _fold(params["lin2"], params["unetnorm2"], stats["unetnorm2"], t)
    h = fused_linear_act(h, w2, a2, c2)

    w3, a3, c3 = _fold(params["lin3"], params["unetnorm3"], stats["unetnorm3"], t)
    h = fused_linear_act(h, w3, a3, c3)

    dense4 = params["lin4"]["Dense_0"]
    return jnp.dot(h, dense4["kernel"], preferred_element_type=jnp.float32).astype(
        h.dtype
    ) + dense4["bias"]
