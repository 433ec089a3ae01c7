"""Debiased EMA semantics (round-3 verdict Next #7).

The reference computes shadow weights but never applies them
(/root/reference/diffusion/ema.py:3-33; SURVEY.md C6). This build applies
them under --eval_ema, which makes the copy-init anchor bias observable:
at mu=0.9999 and realistic step counts a copy-initialized shadow is still
~random-init. The zero-initialized accumulator + 1-mu^t debias is an exact
weighted average of the post-init trajectory at EVERY step count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.train import ema_debias, ema_init, ema_params_from_ckpt, ema_update


def test_debiased_ema_is_exact_weighted_average():
    """Against the closed form: debiased_t = (1-mu) sum_i mu^(t-i) p_i / (1-mu^t)."""
    mu = 0.9
    params = {"w": jnp.zeros((3,))}
    ema = ema_init(params)
    traj = [jnp.asarray([float(i + 1), -2.0 * (i + 1), 0.5]) for i in range(7)]
    for t, p in enumerate(traj):
        ema = ema_update(ema, {"w": p}, mu)
    t = len(traj)
    expected = sum((1 - mu) * mu ** (t - 1 - i) * np.asarray(p)
                   for i, p in enumerate(traj)) / (1 - mu ** t)
    got = ema_debias(ema, mu, t)
    np.testing.assert_allclose(np.asarray(got["w"]), expected, rtol=1e-6)


def test_debiased_ema_constant_trajectory_is_identity():
    """The invariant the copy-init shadow violates: a constant parameter
    trajectory must average to exactly itself at ANY step count — even one
    far below the 1/(1-mu) time constant (mu=0.9999 -> 10k steps)."""
    mu = 0.9999
    p = {"w": jnp.asarray([3.0, -1.5])}
    ema = ema_init(p)
    for _ in range(20):  # 20 steps << 10,000-step time constant
        ema = ema_update(ema, p, mu)
    got = ema_debias(ema, mu, 20)
    # fp32: the accumulator is ~2e-3 * p and the debias divides by ~2e-3,
    # so a few ulps of the accumulation surface as ~1e-4 relative error
    np.testing.assert_allclose(np.asarray(got["w"]), np.asarray(p["w"]), rtol=1e-3)
    # whereas the raw accumulator is still ~0 (the old copy-init shadow
    # would equivalently still be ~its random init)
    assert np.abs(np.asarray(ema["w"])).max() < 0.01


def test_debias_step_zero_no_nan():
    ema = ema_init({"w": jnp.ones((2,))})
    out = ema_debias(ema, 0.9999, 0)
    assert np.isfinite(np.asarray(out["w"])).all()


def test_ema_params_from_ckpt_modes():
    mu = 0.9
    # stacked 2-member ckpt states: member axis leading, per-member step
    st = {
        "params": {"w": jnp.zeros((2, 3))},
        "ema": {"w": jnp.asarray([[0.5, 0.5, 0.5], [0.75, 0.75, 0.75]])},
        "step": jnp.asarray([5, 9]),
    }
    # legacy meta: accumulator passes through untouched
    legacy = ema_params_from_ckpt(st, {"kind": "diffusion_members"})
    np.testing.assert_array_equal(np.asarray(legacy["w"]),
                                  np.asarray(st["ema"]["w"]))
    # zero-init meta: per-member debias by 1 - mu^step
    got = ema_params_from_ckpt(st, {"ema_init": "zero", "ema_rate": mu})
    for m, s in enumerate((5, 9)):
        np.testing.assert_allclose(
            np.asarray(got["w"][m]),
            np.asarray(st["ema"]["w"][m]) / (1 - mu ** s), rtol=1e-6)
    # zero-init meta without step counters: refuse rather than mis-scale
    st_nostep = {k: v for k, v in st.items() if k != "step"}
    with pytest.raises(ValueError, match="step"):
        ema_params_from_ckpt(st_nostep, {"ema_init": "zero", "ema_rate": mu})


def test_member_step_ema_tracks_params():
    """End-to-end through the real member train step: the debiased EMA
    equals the analytic weighted average of the visited post-update params
    — i.e. it averages the TRAJECTORY, with no anchor on the random init
    (the copy-init shadow's flaw)."""
    from ladine_tpu.models import ConditionalModel
    from ladine_tpu.ops import DiffusionSchedule
    from ladine_tpu.train import create_member_state, make_member_step, make_optimizer

    mu = 0.999
    model = ConditionalModel(data_dim=12, feature_dim=8, hidden_dim=8,
                             y_dim=2, n_steps=6)
    tx = make_optimizer("Adam", 5e-2)
    state = create_member_state(model, jax.random.PRNGKey(0), tx, batch_size=4)
    sched = DiffusionSchedule.create("linear", 5, 1e-4, 0.02)
    step = jax.jit(make_member_step(model, tx, sched, mu))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 12))
    y0 = jnp.eye(2)[jnp.array([0, 1, 0, 1])]
    yhat = jnp.full((4, 2), 0.5)
    traj = []
    for i in range(30):
        state, _ = step(state, x, y0, yhat, jax.random.PRNGKey(2 + i))
        traj.append(jax.tree.map(np.asarray, state.params))
    t = len(traj)
    deb = ema_debias(state.ema, mu, state.step)
    weights = [(1 - mu) * mu ** (t - 1 - i) / (1 - mu ** t) for i in range(t)]
    expected = jax.tree.map(
        lambda *ps: sum(w * p for w, p in zip(weights, ps)), *traj)
    chex_close = jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), b, rtol=2e-3, atol=1e-5), deb, expected)
    # and the raw accumulator alone is unusable at 30 steps (~3% of the mass)
    scale = float(1 - mu ** t)
    raw_norm = max(float(np.abs(np.asarray(l)).max())
                   for l in jax.tree.leaves(state.ema))
    deb_norm = max(float(np.abs(np.asarray(l)).max())
                   for l in jax.tree.leaves(deb))
    assert raw_norm < 0.1 * deb_norm
    assert 0.02 < scale < 0.04
    del chex_close
