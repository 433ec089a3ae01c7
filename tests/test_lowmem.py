"""bf16-state (stochastic-rounding) optimizer and EMA: train/lowmem.py.

The lowmem path must match fp32 Adam's trajectory statistically — the whole
point is identical update DIRECTION with 2-byte moment storage. The
reference has no counterpart (fp32 Adam, utils.py:52-63); these tests are
the accuracy gate for optim.lowmem alongside the convergence A/B
(scripts/lowmem_ab.py -> evidence/lowmem_convergence_ab.json).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ladine_tpu.train import (
    adam_bf16,
    bf16_stochastic_round,
    ema_debias,
    ema_init_bf16,
    ema_update_sr,
    make_optimizer,
)


def test_sr_exact_values_pass_through():
    # low-16-bits-zero fp32 values are exactly representable in bf16: every
    # draw must return them unchanged
    vals = jnp.asarray([0.0, 1.0, -2.5, 0.15625, 2.0**40, -(2.0**-40)],
                       jnp.float32)
    for seed in range(5):
        out = bf16_stochastic_round(jax.random.PRNGKey(seed), vals)
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(vals))


def test_sr_is_unbiased_and_bounded():
    # a value strictly between two bf16 neighbors: mean over draws converges
    # to the fp32 value (unbiasedness), every draw is one of the 2 neighbors
    x = jnp.full((4096,), 1.003, jnp.float32)  # between 1.0 and 1.0078125
    out = bf16_stochastic_round(jax.random.PRNGKey(0), x)
    vals = np.unique(np.asarray(out, np.float32))
    assert set(vals) <= {np.float32(1.0), np.float32(1.0078125)}
    mean = float(np.mean(np.asarray(out, np.float32)))
    # P(up) = 0.003/0.0078125 = 0.384 -> mean 1.003 +- ~3 sigma/sqrt(4096)
    assert abs(mean - 1.003) < 4e-4


def test_sr_keeps_infinity():
    x = jnp.asarray([np.inf, -np.inf], jnp.float32)
    out = np.asarray(bf16_stochastic_round(jax.random.PRNGKey(3), x),
                     np.float32)
    assert np.isinf(out).all() and out[0] > 0 > out[1]


def test_adam_bf16_matches_fp32_trajectory():
    # convex quadratic: bf16-state Adam must track fp32 Adam's path closely
    # (moments are smooth; SR noise is sub-ulp)
    target = jnp.asarray([1.0, -2.0, 0.5, 3.0])

    def loss(p):
        return jnp.sum((p - target) ** 2)

    def run(tx):
        p = jnp.zeros(4)
        st = tx.init(p)
        for _ in range(600):
            g = jax.grad(loss)(p)
            up, st = tx.update(g, st, p)
            p = optax.apply_updates(p, up)
        return p

    p32 = run(optax.adam(1e-2))
    p16 = run(adam_bf16(1e-2))
    # SR noise perturbs the path sub-ulp per step; both must land near the
    # optimum and stay close pointwise. The bf16 arm's asymptote is a
    # random walk of scale ~lr around the optimum (SR noise on m/v does
    # not decay), so its floor is lr-sized, not exact.
    np.testing.assert_allclose(np.asarray(p16), np.asarray(p32), atol=0.03)
    assert float(loss(p32)) < 0.02  # fp32 sanity (600 steps, lr-limited)
    assert float(loss(p16)) < 0.05


def test_make_optimizer_lowmem_state_is_bf16():
    tx = make_optimizer("Adam", 1e-3, grad_clip=1.0, lowmem=True)
    params = {"w": jnp.zeros((8, 8)), "b": jnp.zeros(8)}
    st = tx.init(params)
    assert any(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(st)
               if hasattr(l, "dtype") and l.ndim > 0)
    # moments must dominate the state footprint as bf16 (no hidden fp32 copy)
    f32_big = [l for l in jax.tree.leaves(st)
               if hasattr(l, "dtype") and l.dtype == jnp.float32
               and l.size >= 64]
    assert not f32_big, f"unexpected fp32 moment-sized leaves: {f32_big}"


def test_ema_sr_tracks_below_ulp_increments():
    # mu=0.999 on a CONSTANT param 1.0: the per-step increment decays to
    # ~1e-3 of the accumulator while bf16 ulp near 1.0 is 0.0078 —
    # round-to-nearest would stall the shadow well below its target;
    # stochastic rounding keeps the expectation on the fp32 trajectory.
    mu = 0.999
    p = {"w": jnp.ones((256,))}
    e16 = ema_init_bf16(p)
    e32 = jax.tree.map(jnp.zeros_like, p)
    key = jax.random.PRNGKey(7)

    @jax.jit
    def step16(e, k):
        return ema_update_sr(e, p, mu, k)

    n = 2000
    for i in range(n):
        e16 = step16(e16, jax.random.fold_in(key, i))
        e32 = jax.tree.map(lambda e, q: mu * e + (1 - mu) * q, e32, p)

    d16 = float(jnp.mean(ema_debias(e16, mu, n)["w"]))
    d32 = float(jnp.mean(ema_debias(e32, mu, n)["w"]))
    assert abs(d32 - 1.0) < 1e-5  # fp32 sanity: debiased average of 1.0 is 1.0
    assert abs(d16 - d32) < 0.01  # SR shadow within 1% (mean over 256 leaves)


@pytest.mark.slow
def test_member_step_lowmem_trains():
    # one tiny ConditionalModel member: the lowmem step must reduce the
    # eps-matching loss like the fp32 step does (same seeds, same data)
    from ladine_tpu.models import ConditionalModel
    from ladine_tpu.ops import DiffusionSchedule
    from ladine_tpu.train import create_member_state, make_member_step

    cond = ConditionalModel(data_dim=48, feature_dim=16, hidden_dim=16,
                            y_dim=2, n_steps=11)
    sched = DiffusionSchedule.create("linear", 10, 1e-4, 0.02)
    x = jax.random.uniform(jax.random.PRNGKey(0), (16, 48))
    y0 = jnp.eye(2)[jnp.tile(jnp.arange(2), 8)]
    yhat = jnp.full((16, 2), 0.5)

    def run(lowmem):
        tx = make_optimizer("Adam", 1e-2, grad_clip=1.0, lowmem=lowmem)
        st = create_member_state(cond, jax.random.PRNGKey(1), tx,
                                 batch_size=2, lowmem=lowmem)
        step = jax.jit(make_member_step(cond, tx, sched, ema_rate=0.99))
        losses = []
        for i in range(60):
            st, loss = step(st, x, y0, yhat, jax.random.PRNGKey(10 + i))
            losses.append(float(loss))
        return losses, st

    l32, _ = run(False)
    l16, st16 = run(True)
    # the gate is PARITY with the fp32 arm on identical seeds/data — the
    # lowmem step must not train worse (60 steps is trend, not convergence)
    assert np.mean(l16[-10:]) < np.mean(l32[-10:]) + 0.05
    assert abs(np.mean(l16[-10:]) - np.mean(l32[-10:])) < 0.15
    assert jax.tree.leaves(st16.ema)[0].dtype == jnp.bfloat16


def test_tpu_lowering_lowmem_step():
    """The lowmem member step (rbg hardware RNG + uint32 bitcasts + SR) must
    lower for the TPU target — pinned from the CPU host like the Pallas
    kernels' export tests, so a backend-only lowering break cannot first
    surface in the round-end hardware battery."""
    from ladine_tpu.models import ConditionalModel
    from ladine_tpu.ops import DiffusionSchedule
    from ladine_tpu.train import create_member_state, make_member_step

    cond = ConditionalModel(data_dim=48, feature_dim=16, hidden_dim=16,
                            y_dim=2, n_steps=11)
    sched = DiffusionSchedule.create("linear", 10, 1e-4, 0.02)
    tx = make_optimizer("Adam", 1e-2, grad_clip=1.0, lowmem=True)
    st = create_member_state(cond, jax.random.PRNGKey(1), tx,
                             batch_size=2, lowmem=True)
    step = make_member_step(cond, tx, sched, ema_rate=0.99)
    x = jnp.zeros((4, 48))
    y0 = jnp.eye(2)[jnp.array([0, 1, 0, 1])]
    yhat = jnp.full((4, 2), 0.5)
    exp = jax.export.export(jax.jit(step), platforms=["tpu"])(
        st, x, y0, yhat, jax.random.PRNGKey(3))
    assert "tpu" in exp.platforms
