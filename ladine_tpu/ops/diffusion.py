"""CARD-style conditional diffusion math as pure JAX functions.

Behavioral parity with /root/reference/diffusion/diffusion_utils.py:39-163:
the forward posterior ``q(y_t | y_0, f_phi(x))`` has a prior-mean shift toward
the guidance prediction, and the reverse step mixes the epsilon-reparameterized
y_0, the current y_t and the prior mean with gamma coefficients
(diffusion_utils.py:75-91).

TPU-first design notes
----------------------
* The reference's Python ``for t in reversed(range(1, n_steps))`` loop of
  sequential model calls (diffusion_utils.py:145) becomes a single
  ``lax.scan`` over a precomputed timestep vector, so XLA compiles ONE step
  and the whole 1000-step chain never leaves the device.
* The epsilon network is abstracted as ``eps_fn(y, t, key?) -> eps`` — callers
  close it over the (precomputed, per-image) encoder features and the guidance
  prediction, so the per-step cost is only the small y-branch matmuls.
* A strided DDIM-style sampler (``ddim_sample_loop``) generalizes the ancestral
  CARD chain to arbitrary timestep subsequences (the reference's dead
  ``--timesteps/--eta/--skip_type`` surface, main.py:126-146), giving ~20x
  fewer steps at matched accuracy.
* Everything is shape-polymorphic over leading batch dims: ``y`` may be
  ``(B, C)`` or ``(M, K, B, C)`` etc.; coefficients are scalars per step.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ladine_tpu.ops.schedules import DiffusionSchedule

EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def extract(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather schedule entries at timesteps ``t`` and reshape to broadcast
    against an ndim-dimensional batch tensor (reference ``extract``,
    diffusion_utils.py:31-35)."""
    t = jnp.asarray(t)
    out = arr[t]
    return out.reshape(t.shape + (1,) * (ndim - t.ndim))


def q_sample(
    y0: jnp.ndarray,
    y0_hat: jnp.ndarray,
    sched: DiffusionSchedule,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Forward diffusion with prior-mean shift (diffusion_utils.py:39-50):

    ``y_t = sqrt(ab_t) y_0 + (1 - sqrt(ab_t)) y_0_hat + sqrt(1-ab_t) eps``
    """
    sab = extract(sched.alphas_bar_sqrt, t, y0.ndim)
    somab = extract(sched.one_minus_alphas_bar_sqrt, t, y0.ndim)
    return sab * y0 + (1.0 - sab) * y0_hat + somab * noise


class PSampleCoeffs(NamedTuple):
    """Scalar reverse-step coefficients at one timestep t >= 1."""

    gamma0: jnp.ndarray
    gamma1: jnp.ndarray
    gamma2: jnp.ndarray
    beta_hat_sqrt: jnp.ndarray
    alpha_bar_sqrt: jnp.ndarray  # sqrt(ab_t)
    one_minus_alpha_bar_sqrt: jnp.ndarray  # sqrt(1-ab_t)


def p_sample_coefficients(sched: DiffusionSchedule, t: jnp.ndarray) -> PSampleCoeffs:
    """gamma coefficients of the CARD posterior mean (diffusion_utils.py:75-90).

    Note the reference recomputes ``sqrt(ab_t)`` as ``sqrt(1 - somab_t^2)``
    rather than reading the precomputed ``alphas_bar_sqrt`` — we reproduce
    that exactly so float32 rounding matches.
    """
    alpha_t = sched.alphas[t]
    somab_t = sched.one_minus_alphas_bar_sqrt[t]
    somab_tm1 = sched.one_minus_alphas_bar_sqrt[t - 1]
    sab_t = jnp.sqrt(1.0 - somab_t**2)
    sab_tm1 = jnp.sqrt(1.0 - somab_tm1**2)
    denom = somab_t**2
    gamma0 = (1.0 - alpha_t) * sab_tm1 / denom
    gamma1 = somab_tm1**2 * jnp.sqrt(alpha_t) / denom
    gamma2 = 1.0 + (sab_t - 1.0) * (jnp.sqrt(alpha_t) + sab_tm1) / denom
    beta_hat = somab_tm1**2 / denom * (1.0 - alpha_t)
    return PSampleCoeffs(gamma0, gamma1, gamma2, jnp.sqrt(beta_hat), sab_t, somab_t)


def y0_reparam(
    y: jnp.ndarray,
    eps: jnp.ndarray,
    y_T_mean: jnp.ndarray,
    alpha_bar_sqrt: jnp.ndarray,
    one_minus_alpha_bar_sqrt: jnp.ndarray,
) -> jnp.ndarray:
    """Epsilon-reparameterization of y_0 under the mean-shifted forward process
    (diffusion_utils.py:85-86, 108-109): Algorithm 2 Line 4 of the paper."""
    return (
        y - (1.0 - alpha_bar_sqrt) * y_T_mean - eps * one_minus_alpha_bar_sqrt
    ) / alpha_bar_sqrt


def p_sample_step(
    y: jnp.ndarray,
    eps: jnp.ndarray,
    y_T_mean: jnp.ndarray,
    coeffs: PSampleCoeffs,
    z: jnp.ndarray,
) -> jnp.ndarray:
    """One ancestral reverse step t -> t-1 (t >= 1), diffusion_utils.py:54-92."""
    y0 = y0_reparam(y, eps, y_T_mean, coeffs.alpha_bar_sqrt, coeffs.one_minus_alpha_bar_sqrt)
    mean = coeffs.gamma0 * y0 + coeffs.gamma1 * y + coeffs.gamma2 * y_T_mean
    return mean + coeffs.beta_hat_sqrt * z


def p_sample_final(
    y: jnp.ndarray,
    eps: jnp.ndarray,
    y_T_mean: jnp.ndarray,
    sched: DiffusionSchedule,
) -> jnp.ndarray:
    """Final deterministic step at array index t=0 — diffusion timestep 1 -> 0
    (diffusion_utils.py:96-111)."""
    somab = sched.one_minus_alphas_bar_sqrt[0]
    sab = jnp.sqrt(1.0 - somab**2)
    return y0_reparam(y, eps, y_T_mean, sab, somab)


def p_sample_loop(
    eps_fn: EpsFn,
    y_T_mean: jnp.ndarray,
    sched: DiffusionSchedule,
    key: jax.Array,
    return_trajectory: bool = False,
    unroll: int = 1,
):
    """Full ancestral reverse chain as a single ``lax.scan``.

    Equivalent to the reference's sequential loop (diffusion_utils.py:133-163)
    with ``only_last_sample=True`` (the live inference path,
    classification_train_separately.py:772-777): sample
    ``y_T = z + y_T_mean``, step t = T-1 .. 1, then the deterministic
    1 -> 0 step.

    eps_fn(y, t) must accept a scalar int32 ``t`` and a batch of ``y``.
    """
    T = sched.num_timesteps
    key_init, key_scan = jax.random.split(key)
    z = jax.random.normal(key_init, y_T_mean.shape, y_T_mean.dtype)
    y_T = z + y_T_mean

    ts = jnp.arange(T - 1, 0, -1, dtype=jnp.int32)  # T-1 .. 1
    step_keys = jax.random.split(key_scan, T - 1)

    def body(y, inp):
        t, k = inp
        coeffs = p_sample_coefficients(sched, t)
        eps = eps_fn(y, t)
        z_t = jax.random.normal(k, y.shape, y.dtype)
        y_next = p_sample_step(y, eps, y_T_mean, coeffs, z_t)
        return y_next, (y if return_trajectory else None)

    y_1, traj = jax.lax.scan(body, y_T, (ts, step_keys), unroll=unroll)
    eps_0 = eps_fn(y_1, jnp.asarray(0, jnp.int32))
    y_0 = p_sample_final(y_1, eps_0, y_T_mean, sched)
    if return_trajectory:
        return y_0, traj
    return y_0


def ddim_timesteps(
    num_timesteps: int, num_steps: int, skip_type: str = "uniform"
) -> jnp.ndarray:
    """Increasing subsequence of array-timestep indices ending at 0.

    ``uniform``: evenly strided; ``quad``: quadratic spacing (denser near 0),
    mirroring the reference's DDIM-heritage ``--skip_type`` surface
    (main.py:133-139)."""
    import numpy as np

    if skip_type == "uniform":
        tau = np.linspace(0, num_timesteps - 1, num_steps)
    elif skip_type == "quad":
        tau = np.linspace(0, np.sqrt(num_timesteps - 1), num_steps) ** 2
    else:
        raise ValueError(f"unknown skip_type {skip_type!r}")
    tau = np.unique(tau.round().astype(np.int64))
    return jnp.asarray(tau, dtype=jnp.int32)


def ddim_sample_loop(
    eps_fn: EpsFn,
    y_T_mean: jnp.ndarray,
    sched: DiffusionSchedule,
    key: jax.Array,
    tau: jnp.ndarray,
    eta: float = 0.0,
):
    """Strided (DDIM-style) reverse chain for the mean-shifted CARD process.

    For consecutive subsequence indices t > s the update keeps the exact
    marginals of the mean-shifted forward process
    ``q(y_t|y_0) = N(sqrt(ab_t) y_0 + (1-sqrt(ab_t)) m, (1-ab_t) I)``:

        y_s = sqrt(ab_s) y0_hat + (1 - sqrt(ab_s)) m
              + sqrt(1 - ab_s - sigma^2) eps + sigma z,
        sigma = eta sqrt((1-ab_s)/(1-ab_t)) sqrt(1 - ab_t/ab_s).

    With eta=0 this is deterministic given y_T; with the full subsequence and
    eta=1 it reduces to (a DDPM-like variant of) the ancestral chain. The
    final step at index 0 returns the y_0 reparameterization, matching
    ``p_sample_t_1to0``.
    """
    n = int(tau.shape[0])
    key_init, key_scan = jax.random.split(key)
    z = jax.random.normal(key_init, y_T_mean.shape, y_T_mean.dtype)
    y = z + y_T_mean

    t_hi = tau[1:][::-1]  # t_{n-1} .. t_1
    t_lo = tau[:-1][::-1]  # t_{n-2} .. t_0
    step_keys = jax.random.split(key_scan, n - 1)

    def body(y, inp):
        t, s, k = inp
        ab_t = sched.alphas_bar[t]
        ab_s = sched.alphas_bar[s]
        sab_t = jnp.sqrt(ab_t)
        sab_s = jnp.sqrt(ab_s)
        eps = eps_fn(y, t)
        y0 = y0_reparam(y, eps, y_T_mean, sab_t, jnp.sqrt(1.0 - ab_t))
        sigma = (
            eta
            * jnp.sqrt((1.0 - ab_s) / (1.0 - ab_t))
            * jnp.sqrt(jnp.maximum(1.0 - ab_t / ab_s, 0.0))
        )
        dir_coeff = jnp.sqrt(jnp.maximum(1.0 - ab_s - sigma**2, 0.0))
        z_t = jax.random.normal(k, y.shape, y.dtype)
        y_next = sab_s * y0 + (1.0 - sab_s) * y_T_mean + dir_coeff * eps + sigma * z_t
        return y_next, None

    y_1, _ = jax.lax.scan(body, y, (t_hi, t_lo, step_keys))
    eps_0 = eps_fn(y_1, tau[0])
    return p_sample_final(y_1, eps_0, y_T_mean, sched)


def antithetic_timesteps(key: jax.Array, n: int, num_timesteps: int) -> jnp.ndarray:
    """Antithetic timestep sampling for training
    (classification_train_separately.py:945-948): draw n//2+1 uniform t and
    mirror them as T-1-t, truncated to n."""
    t_half = jax.random.randint(key, (n // 2 + 1,), 0, num_timesteps)
    t = jnp.concatenate([t_half, num_timesteps - 1 - t_half], axis=0)[:n]
    return t
