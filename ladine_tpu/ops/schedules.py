"""Beta schedules and precomputed diffusion-schedule tensors.

Behavioral parity with the reference's schedule zoo
(/root/reference/diffusion/diffusion_utils.py:5-28): linear, const, quad, jsd,
sigmoid, cosine, cosine_reverse, cosine_anneal. All schedules are computed once
on host in float64 for accuracy and stored as float32 device arrays; everything
downstream is pure-functional on these arrays so the whole reverse chain stays
inside one jit/scan.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

_SCHEDULES = (
    "linear",
    "const",
    "quad",
    "jsd",
    "sigmoid",
    "cosine",
    "cosine_reverse",
    "cosine_anneal",
)


def make_beta_schedule(
    schedule: str = "linear",
    num_timesteps: int = 1000,
    start: float = 1e-5,
    end: float = 1e-2,
) -> np.ndarray:
    """Return betas of shape (num_timesteps,) as float64 numpy.

    Matches reference semantics for each named schedule
    (diffusion_utils.py:5-28). Computed on host (numpy) — schedules are tiny
    and static, so there is no reason to trace them.
    """
    t = num_timesteps
    if schedule == "linear":
        betas = np.linspace(start, end, t)
    elif schedule == "const":
        betas = end * np.ones(t)
    elif schedule == "quad":
        betas = np.linspace(start**0.5, end**0.5, t) ** 2
    elif schedule == "jsd":
        # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(t, 1, t)
    elif schedule == "sigmoid":
        s = np.linspace(-6, 6, t)
        betas = 1.0 / (1.0 + np.exp(-s)) * (end - start) + start
    elif schedule in ("cosine", "cosine_reverse"):
        max_beta = 0.999
        cosine_s = 0.008

        def f(i):
            return math.cos((i / t + cosine_s) / (1 + cosine_s) * math.pi / 2) ** 2

        betas = np.array([min(1 - f(i + 1) / f(i), max_beta) for i in range(t)])
    elif schedule == "cosine_anneal":
        betas = np.array(
            [
                start + 0.5 * (end - start) * (1 - math.cos(i / (t - 1) * math.pi))
                for i in range(t)
            ]
        )
    else:
        raise ValueError(f"unknown beta schedule {schedule!r}; one of {_SCHEDULES}")
    return betas.astype(np.float64)


class DiffusionSchedule(NamedTuple):
    """Precomputed schedule arrays, each of shape (T,), float32 on device.

    Mirrors the precompute block of the reference runner
    (classification_train_separately.py:215-246) but as an immutable value
    passed explicitly into the pure sampling/training functions.
    """

    betas: jnp.ndarray  # beta_t
    alphas: jnp.ndarray  # 1 - beta_t
    alphas_bar: jnp.ndarray  # prod alpha
    alphas_bar_sqrt: jnp.ndarray  # sqrt(prod alpha)
    one_minus_alphas_bar_sqrt: jnp.ndarray  # sqrt(1 - prod alpha)

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    @classmethod
    def create(
        cls,
        schedule: str = "linear",
        num_timesteps: int = 1000,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        dtype=jnp.float32,
    ) -> "DiffusionSchedule":
        betas = make_beta_schedule(schedule, num_timesteps, beta_start, beta_end)
        alphas = 1.0 - betas
        alphas_bar = np.cumprod(alphas)
        return cls(
            betas=jnp.asarray(betas, dtype=dtype),
            alphas=jnp.asarray(alphas, dtype=dtype),
            alphas_bar=jnp.asarray(alphas_bar, dtype=dtype),
            alphas_bar_sqrt=jnp.asarray(np.sqrt(alphas_bar), dtype=dtype),
            one_minus_alphas_bar_sqrt=jnp.asarray(np.sqrt(1.0 - alphas_bar), dtype=dtype),
        )
