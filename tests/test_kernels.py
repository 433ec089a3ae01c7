"""Kernel correctness on CPU (the Pallas paths auto-fallback to identical XLA
math off-TPU; the Pallas code itself is exercised on TPU by bench.py and can
be forced here via interpret mode in the future)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.kernels import flash_attention, fused_eps, fused_linear_act
from ladine_tpu.models import ConditionalModel


def test_flash_attention_matches_naive():
    b, n, h, d = 2, 13, 4, 16
    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(i), (b, n, h, d), jnp.float32)
        for i in range(3)
    )
    out = flash_attention(q, k, v)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) * d**-0.5
    ref = jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(s, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_linear_act_matches_naive():
    r, k, n = 9, 24, 17
    x = jax.random.normal(jax.random.PRNGKey(0), (r, k))
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n)) * 0.1
    a = jax.random.normal(jax.random.PRNGKey(2), (n,))
    c = jax.random.normal(jax.random.PRNGKey(3), (n,))
    m = jax.random.normal(jax.random.PRNGKey(4), (r, n))
    ref = jax.nn.softplus(x @ w * a + c)
    np.testing.assert_allclose(
        np.asarray(fused_linear_act(x, w, a, c)), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fused_linear_act(x, w, a, c, mult=m)), np.asarray(ref * m),
        rtol=1e-4, atol=1e-5,
    )


def test_fused_eps_matches_flax():
    model = ConditionalModel(
        data_dim=48, feature_dim=16, hidden_dim=16, y_dim=2, n_steps=11, guidance=True
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 48))
    y = jax.random.normal(jax.random.PRNGKey(1), (5, 2))
    yhat = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(2), (5, 2)))
    variables = model.init(jax.random.PRNGKey(3), x, y, jnp.asarray(5), yhat)
    # push batch stats away from init so the BN fold is non-trivial
    _, mutated = model.apply(
        variables, x, y, jnp.asarray(5), yhat, train=True, mutable=["batch_stats"]
    )
    variables = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}

    f = model.apply(variables, x, method="encode")
    for t in [0, 5, 10]:
        ref = model.apply(variables, f, y, jnp.asarray(t), yhat, method="eps")
        out = fused_eps(variables, f, y, jnp.asarray(t), yhat)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_engine_pallas_path_matches_flax_path():
    from ladine_tpu.infer import member_mc_sample
    from ladine_tpu.ops import DiffusionSchedule

    model = ConditionalModel(data_dim=24, feature_dim=8, hidden_dim=8, y_dim=2, n_steps=11)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 24))
    yhat = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (3, 2)))
    v = model.init(jax.random.PRNGKey(2), x, jnp.zeros((3, 2)), jnp.asarray(0), yhat)
    sched = DiffusionSchedule.create("linear", 10, 1e-4, 0.02)
    a = member_mc_sample(model, v, x, yhat, jax.random.PRNGKey(3), sched, 2)
    b = member_mc_sample(
        model, v, x, yhat, jax.random.PRNGKey(3), sched, 2, use_pallas_eps=True
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)
