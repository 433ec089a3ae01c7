"""PyTorch-compatible parameter initializers.

The reference trains with torch's default ``nn.Linear`` init —
``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` for both kernel and bias — and
``U[0, 1)`` for the timestep-embedding gates (latent_model.py:99). Training
dynamics (and therefore reproduced accuracy) are sensitive to these, so we
expose them explicitly instead of using flax defaults.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import random
from flax.linen import initializers as flax_init

# kaiming_uniform(a=sqrt(5)) on a Linear kernel reduces to U(+-1/sqrt(fan_in)),
# which is variance_scaling with scale 1/3 (uniform bound sqrt(3*scale/fan_in)).
torch_linear_kernel = flax_init.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias(fan_in: int):
    """torch Linear bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def uniform01(key, shape, dtype=jnp.float32):
    """U[0, 1) — the reference's embedding-gate init (latent_model.py:99)."""
    return random.uniform(key, shape, dtype, 0.0, 1.0)
