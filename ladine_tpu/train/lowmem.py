"""Low-memory (bf16 + stochastic rounding) optimizer and EMA state.

The full-dims member train step is HBM-bandwidth-bound: with fp32 Adam
moments + fp32 EMA the analytic floor is 40*P bytes/step (fwd 4P + bwd 4P +
state read 16P + write 16P) and the measured step sits at ~75% of peak
bandwidth with 2.4% MFU (bench.py train_step, BENCH_r04). Storing the Adam
moments and the EMA accumulator in bfloat16 cuts the floor to 28*P —
a ~1.4x ceiling lift — without touching the fp32 master params.

Why stochastic rounding: the EMA/second-moment increments are tiny relative
to the accumulator ((1-b2)=1e-3, (1-mu) down to 1e-4 of magnitude) while
bf16 has only 8 mantissa bits (~0.4% ulp). Round-to-nearest silently drops
sub-ulp increments, stalling the accumulator; rounding each store DOWN or UP
with probability proportional to the distance to the neighboring
representables makes the quantized accumulation unbiased, so the expected
trajectory matches fp32 (the standard bf16-training recipe; cf. the
scaling-book's low-precision-state discussion and 8-bit-Adam literature).

The reference has no counterpart (single-GPU fp32 Adam,
/root/reference/diffusion/utils.py:52-63); this is a TPU-native throughput
feature gated by ``optim.lowmem`` and accuracy-gated by a training
convergence A/B (tests/test_lowmem.py + the demo-config gate).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def bf16_stochastic_round(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """fp32 -> bf16 with stochastic rounding.

    Adds uniform random bits to the 16 low (dropped) mantissa bits and
    truncates: P(round up) == fraction of the ulp above the lower neighbor,
    i.e. an unbiased rounding. Exactly-representable values (low 16 bits
    zero) pass through unchanged for every draw. inf stays inf (the masked
    add cannot carry past the low halfword unless the value rounds up, which
    is the correct ulp behavior at the finite top of the range)."""
    x32 = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    rnd = jax.random.bits(key, x32.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    out = (bits + rnd) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(out, jnp.float32).astype(jnp.bfloat16)


def _rbg_key(key: jax.Array) -> jax.Array:
    """Re-seed a hardware-RNG (rbg) key from any PRNG key.

    The SR draw covers EVERY optimizer-state element (~3*P words/step at
    full dims — billions): threefry bits at that volume would dominate the
    step on the VPU, defeating the bandwidth win. The TPU's rbg hardware
    generator is effectively free; its weaker stream independence is
    irrelevant for rounding noise (only per-element uniformity matters).
    One threefry draw seeds it, so the caller's key semantics (fold_in per
    step) still select the stream."""
    seeds = jax.random.bits(key, (4,), jnp.uint32)
    return jax.random.wrap_key_data(seeds, impl="rbg")


def _tree_sr_bf16(key: jax.Array, tree: Any) -> Any:
    """Stochastically round every leaf, one folded rbg key per leaf."""
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(_rbg_key(key), len(leaves))
    return jax.tree.unflatten(
        treedef, [bf16_stochastic_round(k, l) for k, l in zip(keys, leaves)]
    )


class ScaleByAdamBF16State(NamedTuple):
    count: jnp.ndarray
    mu: Any  # first moment, bf16 leaves
    nu: Any  # second moment, bf16 leaves


def scale_by_adam_bf16(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    seed: int = 0,
) -> optax.GradientTransformation:
    """optax.scale_by_adam with bfloat16 moment storage.

    The moment math runs in fp32 (read: upcast, fused by XLA into the
    elementwise update); only the stored state is bf16, written back with
    stochastic rounding keyed on the step count. Update direction matches
    torch/optax Adam: m_hat / (sqrt(v_hat) + eps) with eps OUTSIDE the
    sqrt (reference utils.py:52-63 semantics via optax.adam eps_root=0)."""

    def init_fn(params):
        z = lambda p: jnp.zeros(p.shape, jnp.bfloat16)
        return ScaleByAdamBF16State(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(z, params),
            nu=jax.tree.map(z, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        cf = count.astype(jnp.float32)
        mu32 = jax.tree.map(
            lambda m, g: b1 * m.astype(jnp.float32) + (1.0 - b1) * g,
            state.mu, updates)
        nu32 = jax.tree.map(
            lambda v, g: b2 * v.astype(jnp.float32) + (1.0 - b2) * g * g,
            state.nu, updates)
        bc1 = 1.0 - b1 ** cf
        bc2 = 1.0 - b2 ** cf
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu32, nu32)
        base = jax.random.fold_in(jax.random.PRNGKey(seed), count)
        k_mu, k_nu = jax.random.split(base)
        return out, ScaleByAdamBF16State(
            count=count,
            mu=_tree_sr_bf16(k_mu, mu32),
            nu=_tree_sr_bf16(k_nu, nu32),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adam_bf16(
    lr,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    seed: int = 0,
) -> optax.GradientTransformation:
    """Adam with bf16 moments (drop-in for optax.adam in make_optimizer)."""
    tx = scale_by_adam_bf16(b1, b2, eps, seed)
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts += [tx, optax.scale_by_learning_rate(lr)]
    return optax.chain(*parts)


def ema_init_bf16(params: Any) -> Any:
    """Zero-initialized bf16 EMA accumulator (debiased at read like
    train/ema.py — zeros are exactly representable, so the read convention
    is unchanged)."""
    return jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.bfloat16), params)


def ema_update_sr(ema: Any, params: Any, mu: float, key: jax.Array) -> Any:
    """shadow <- mu*shadow + (1-mu)*param in fp32, stored bf16 with
    stochastic rounding (unbiased accumulation at (1-mu) << bf16 ulp)."""
    upd = jax.tree.map(
        lambda e, p: mu * e.astype(jnp.float32)
        + (1.0 - mu) * p.astype(jnp.float32),
        ema, params)
    return _tree_sr_bf16(key, upd)
