import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.ops.diffusion import (
    antithetic_timesteps,
    ddim_sample_loop,
    ddim_timesteps,
    extract,
    p_sample_coefficients,
    p_sample_final,
    p_sample_loop,
    p_sample_step,
    q_sample,
    y0_reparam,
)
from ladine_tpu.ops.labels import one_hot_and_prototype
from ladine_tpu.ops.schedules import DiffusionSchedule


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule.create("linear", 100, 1e-4, 0.02)


def test_extract_broadcast(sched):
    t = jnp.array([0, 5, 10])
    out = extract(sched.alphas, t, 2)
    assert out.shape == (3, 1)
    out4 = extract(sched.alphas, t, 4)
    assert out4.shape == (3, 1, 1, 1)


def test_q_sample_formula(sched):
    key = jax.random.PRNGKey(0)
    y0 = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    y0_hat = jnp.array([[0.8, 0.2], [0.3, 0.7]])
    t = jnp.array([3, 50])
    noise = jax.random.normal(key, y0.shape)
    y_t = q_sample(y0, y0_hat, sched, t, noise)
    sab = np.asarray(sched.alphas_bar_sqrt)[np.asarray(t)][:, None]
    somab = np.asarray(sched.one_minus_alphas_bar_sqrt)[np.asarray(t)][:, None]
    expected = sab * np.asarray(y0) + (1 - sab) * np.asarray(y0_hat) + somab * np.asarray(noise)
    np.testing.assert_allclose(np.asarray(y_t), expected, rtol=1e-6)


def test_gamma_affine_identity(sched):
    """gamma0 + gamma1 + gamma2 == 1: the posterior mean is an affine
    combination, so a constant y = y0 = y_T_mean must be a fixed point."""
    for t in [1, 2, 50, 99]:
        c = p_sample_coefficients(sched, jnp.asarray(t))
        total = float(c.gamma0 + c.gamma1 + c.gamma2)
        # float32: the 1/(1-ab_t) terms amplify rounding near t=1
        assert total == pytest.approx(1.0, abs=1e-4)


def test_beta_hat_positive(sched):
    for t in [1, 50, 99]:
        c = p_sample_coefficients(sched, jnp.asarray(t))
        assert float(c.beta_hat_sqrt) > 0


def test_y0_reparam_inverts_q_sample(sched):
    """y0_reparam is the exact inverse of the mean-shifted forward map."""
    key = jax.random.PRNGKey(1)
    y0 = jnp.array([[0.9, 0.1]])
    m = jnp.array([[0.6, 0.4]])
    t = jnp.array([70])
    noise = jax.random.normal(key, y0.shape)
    y_t = q_sample(y0, m, sched, t, noise)
    sab = sched.alphas_bar_sqrt[70]
    somab = sched.one_minus_alphas_bar_sqrt[70]
    rec = y0_reparam(y_t, noise, m, sab, somab)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(y0), rtol=1e-4, atol=1e-5)


def _oracle_eps_fn(y0, m, sched):
    """eps_fn that returns the exact noise consistent with (y, t, y0, m)."""

    def eps_fn(y, t):
        sab = sched.alphas_bar_sqrt[t]
        somab = sched.one_minus_alphas_bar_sqrt[t]
        return (y - sab * y0 - (1.0 - sab) * m) / somab

    return eps_fn


def test_ancestral_loop_oracle_recovers_y0(sched):
    """With an oracle eps network the final deterministic 1->0 step returns
    exactly y0, regardless of the stochastic chain before it."""
    y0 = jnp.array([[0.999, 0.001], [0.2, 0.8]])
    m = jnp.array([[0.7, 0.3], [0.4, 0.6]])
    out = p_sample_loop(_oracle_eps_fn(y0, m, sched), m, sched, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(y0), rtol=1e-3, atol=1e-3)


def test_ddim_loop_oracle_recovers_y0(sched):
    y0 = jnp.array([[0.999, 0.001], [0.2, 0.8]])
    m = jnp.array([[0.7, 0.3], [0.4, 0.6]])
    tau = ddim_timesteps(100, 10)
    out = ddim_sample_loop(
        _oracle_eps_fn(y0, m, sched), m, sched, jax.random.PRNGKey(3), tau, eta=0.0
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(y0), rtol=1e-3, atol=1e-3)


def test_ddim_timesteps_uniform():
    tau = ddim_timesteps(1000, 50)
    t = np.asarray(tau)
    assert t[0] == 0
    assert t[-1] == 999
    assert np.all(np.diff(t) > 0)


def test_ddim_timesteps_quad_denser_near_zero():
    tau = np.asarray(ddim_timesteps(1000, 50, "quad"))
    d = np.diff(tau)
    assert d[0] < d[-1]


def test_p_sample_loop_trajectory(sched):
    y0 = jnp.zeros((1, 2))
    m = jnp.zeros((1, 2))
    out, traj = p_sample_loop(
        _oracle_eps_fn(y0, m, sched), m, sched, jax.random.PRNGKey(4), return_trajectory=True
    )
    assert traj.shape == (99, 1, 2)  # T-1 intermediate states


def test_p_sample_step_zero_noise_fixed_point(sched):
    """y = y0 = m with oracle eps=0 and z=0 stays put."""
    y = jnp.array([[0.5, 0.5]])
    c = p_sample_coefficients(sched, jnp.asarray(50))
    out = p_sample_step(y, jnp.zeros_like(y), y, c, jnp.zeros_like(y))
    np.testing.assert_allclose(np.asarray(out), np.asarray(y), rtol=1e-5)
    out0 = p_sample_final(y, jnp.zeros_like(y), y, sched)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(y), rtol=1e-5)


def test_antithetic_timesteps():
    t = antithetic_timesteps(jax.random.PRNGKey(0), 31, 100)
    t = np.asarray(t)
    assert t.shape == (31,)
    assert t.min() >= 0 and t.max() < 100
    half = 31 // 2 + 1
    np.testing.assert_array_equal(t[half:], 100 - 1 - t[: 31 - half])


def test_one_hot_and_prototype():
    labels = jnp.array([0, 1])
    oh, logits = one_hot_and_prototype(labels, 2)
    np.testing.assert_array_equal(np.asarray(oh), [[1, 0], [0, 1]])
    # prototype: clip to [0.001, 0.999], l1-normalize, then logit
    p = np.clip(np.asarray(oh), 0.001, 0.999)
    p = p / p.sum(-1, keepdims=True)
    expected = np.log(p / (1 - p))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=1e-4)


def test_scan_matches_stepwise(sched):
    """The scan-based loop equals a hand-rolled Python loop using the same
    per-step primitives and the same key schedule."""
    y0 = jnp.array([[0.9, 0.1]])
    m = jnp.array([[0.5, 0.5]])
    eps_fn = _oracle_eps_fn(y0, m, sched)
    key = jax.random.PRNGKey(7)
    out = p_sample_loop(eps_fn, m, sched, key)

    key_init, key_scan = jax.random.split(key)
    y = jax.random.normal(key_init, m.shape) + m
    step_keys = jax.random.split(key_scan, sched.num_timesteps - 1)
    for i, t in enumerate(range(sched.num_timesteps - 1, 0, -1)):
        c = p_sample_coefficients(sched, jnp.asarray(t))
        z = jax.random.normal(step_keys[i], y.shape)
        y = p_sample_step(y, eps_fn(y, jnp.asarray(t)), m, c, z)
    y_final = p_sample_final(y, eps_fn(y, jnp.asarray(0)), m, sched)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y_final), rtol=1e-5, atol=1e-6)
