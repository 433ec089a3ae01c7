"""Nested-ensemble inference engine.

The reference's inference hot loop (classification_train_separately.py:767-777)
runs 5 members x 20 MC trials x 1000 reverse steps as sequential Python —
100,000 eps_theta forwards per test batch, with CPU<->GPU model swaps between
members. Here the whole thing is ONE jitted computation:

    scan(timesteps)  over  vmap(members) x vmap(trials) x batch

with the per-member image features computed once (BatchNorm eval uses running
stats, so this is exact — see models/conditional.py) and the eps network's
y-branch as the only per-step work. Members' parameter pytrees are stacked
leaf-wise so the member axis is a real array axis that can be sharded over the
TPU mesh ('member'), with batch sharded over 'data'.
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ladine_tpu.models.conditional import ConditionalModel
from ladine_tpu.ops.diffusion import ddim_sample_loop, p_sample_loop
from ladine_tpu.ops.schedules import DiffusionSchedule


def stack_members(variables_list: Sequence[Any]) -> Any:
    """Stack K structurally-identical variable pytrees along a new leading
    member axis. The reference keeps 5 (6) separate nn.Modules
    (classification_train_separately.py:684-691); stacking makes the member
    dimension vmappable and shardable."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *variables_list)


def unstack_members(stacked: Any, num: int) -> List[Any]:
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(num)]


def member_mc_sample(
    model: ConditionalModel,
    member_vars: Any,
    x_flat: jnp.ndarray,
    y0_hat: jnp.ndarray,
    key: jax.Array,
    sched: DiffusionSchedule,
    mc_trials: int,
    tau: Optional[jnp.ndarray] = None,
    eta: float = 0.0,
    use_pallas_eps: bool = False,
    use_int8_eps: bool = False,
    use_int8_encode: bool = False,
    use_int8_pallas: bool = False,
    pallas_fuse_ends: bool = False,
    unroll: int = 1,
    noise_prior: bool = False,
) -> jnp.ndarray:
    """MC samples from ONE member's reverse chain: (mc_trials, B, y_dim).

    Encoder features are computed once here — outside both the trial vmap and
    the timestep scan (the reference recomputes them 1000x per trial).
    y_T_mean == y0_hat, matching classification_train_separately.py:772-777;
    with ``noise_prior`` the prior mean is zero while the y0_hat conditioning
    stays (reference --noise_prior, classification_train_separately.py:1654).
    ``use_pallas_eps`` swaps the scan body for the fully-fused Pallas kernel
    path (kernels/fused_eps.py). Measured on v5e at full LaDiNE shapes the
    XLA path sustains ~72% bf16 peak and the Pallas path is ~4x slower
    (vmap over members fragments the kernel grid), so the default is off.
    """
    if use_int8_encode and model.arch == "linear":
        # int8 enc_lin1 (the 1.2 GB weight stream that dominates the
        # per-image fixed cost at short DDIM schedules); rel err ~5e-4.
        # Pre-quantized resident weights (kernels/int8.quantize_encoder,
        # done once outside jit — the Predictor does) get the bandwidth
        # win; float trees quantize in-jit (numerics only)
        from ladine_tpu.kernels.int8 import int8_encode

        # f's dtype drives the whole scan's intermediate storage (int8_eps
        # keys its hidden tensors off f.dtype) — follow the model's COMPUTE
        # dtype when set, falling back to the stored param dtype (an fp32
        # artifact served with model.dtype=bf16 must still run bf16)
        w_dtype = member_vars["params"]["enc_lin3"]["Dense_0"]["kernel"].dtype
        f = int8_encode(member_vars, x_flat).astype(model.dtype or w_dtype)
    else:
        f = model.apply(member_vars, x_flat, method="encode")
    y_T_mean = jnp.zeros_like(y0_hat) if noise_prior else y0_hat

    if use_int8_pallas:
        # Fused Pallas int8 scan body (kernels/int8_pallas.py). The MC-trial
        # axis is FOLDED into GEMM rows instead of vmapped: a vmapped
        # pallas_call re-streams the 16.7 MB int8 weights once per trial
        # (the round-1 fused-kernel regression, docs/ROADMAP.md #5), while
        # one (MC*B)-row kernel reads them once per row-tile. Noise draws
        # are per-element of the widened batch, so the sampler is
        # distributionally identical to the vmapped-trials path (the PRNG
        # stream differs — same caveat as any batch-shape change).
        from ladine_tpu.kernels.int8 import quantize_member
        from ladine_tpu.kernels.int8_pallas import (
            int8_eps_pallas,
            int8_eps_pallas_fused,
        )

        # v2 (pallas_fuse_ends) additionally folds lin1 into lin2's
        # prologue and lin4 into lin3's epilogue — h1/h3 never touch HBM
        eps_impl = int8_eps_pallas_fused if pallas_fuse_ends else int8_eps_pallas
        qvars = quantize_member(member_vars)
        b, c = y_T_mean.shape
        f_rows = jnp.broadcast_to(f, (mc_trials,) + f.shape).reshape(
            mc_trials * b, f.shape[-1]
        )
        yhat_rows = jnp.broadcast_to(y0_hat, (mc_trials, b, c)).reshape(-1, c)

        def eps_fn(y, t):
            out = eps_impl(qvars, f_rows, y.reshape(-1, c), t, yhat_rows)
            return out.astype(f.dtype).reshape(mc_trials, b, c)

        y_T_wide = jnp.broadcast_to(y_T_mean, (mc_trials, b, c))
        if tau is None:
            return p_sample_loop(eps_fn, y_T_wide, sched, key, unroll=unroll)
        return ddim_sample_loop(eps_fn, y_T_wide, sched, key, tau, eta)

    if use_int8_eps:
        from ladine_tpu.kernels.int8 import int8_eps, quantize_member

        qvars = quantize_member(member_vars)  # once per call, outside the scan

        def eps_fn(y, t):
            return int8_eps(qvars, f, y, t, y0_hat).astype(f.dtype)

    elif use_pallas_eps:
        from ladine_tpu.kernels.fused_eps import fused_eps

        def eps_fn(y, t):
            return fused_eps(member_vars, f, y, t, y0_hat)

    else:

        def eps_fn(y, t):
            return model.apply(member_vars, f, y, t, y0_hat, method="eps")

    def one_trial(k):
        if tau is None:
            return p_sample_loop(eps_fn, y_T_mean, sched, k, unroll=unroll)
        return ddim_sample_loop(eps_fn, y_T_mean, sched, k, tau, eta)

    return jax.vmap(one_trial)(jax.random.split(key, mc_trials))


def nested_ensemble_sample(
    model: ConditionalModel,
    stacked_vars: Any,
    x_flat: jnp.ndarray,
    y0_hat_members: jnp.ndarray,
    key: jax.Array,
    sched: DiffusionSchedule,
    mc_trials: int = 20,
    tau: Optional[jnp.ndarray] = None,
    eta: float = 0.0,
    use_pallas_eps: bool = False,
    use_int8_eps: bool = False,
    use_int8_encode: bool = False,
    use_int8_pallas: bool = False,
    pallas_fuse_ends: bool = False,
    unroll: int = 1,
    noise_prior: bool = False,
) -> jnp.ndarray:
    """Draw all members' MC samples in one shot: (M, mc_trials, B, y_dim).

    Args:
        stacked_vars: member-stacked ConditionalModel variables (see
            :func:`stack_members`).
        x_flat: (B, data_dim) flattened images.
        y0_hat_members: (M, B, y_dim) softmaxed guidance per member — used as
            both the eps-net conditioning and the prior mean y_T_mean.
        tau: optional strided timestep subsequence for the DDIM sampler;
            None = full ancestral chain (reference behavior).
    """
    num_members = y0_hat_members.shape[0]
    member_keys = jax.random.split(key, num_members)

    fn = functools.partial(
        member_mc_sample,
        model,
        sched=sched,
        mc_trials=mc_trials,
        tau=tau,
        eta=eta,
        use_pallas_eps=use_pallas_eps,
        use_int8_eps=use_int8_eps,
        use_int8_encode=use_int8_encode,
        use_int8_pallas=use_int8_pallas,
        pallas_fuse_ends=pallas_fuse_ends,
        unroll=unroll,
        noise_prior=noise_prior,
    )
    return jax.vmap(lambda v, yh, k: fn(v, x_flat, yh, k))(
        stacked_vars, y0_hat_members, member_keys
    )
