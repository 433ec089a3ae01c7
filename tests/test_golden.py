"""Golden-value regression tests: fixed seeds, fixed tiny shapes, values
pinned at round-1. Catches silent numerical drift in model init, the eps
forward, the schedule precompute, and the full reverse chain (incl. the PRNG
key-splitting discipline — any change to how keys are threaded shows up
here)."""

import jax
import jax.numpy as jnp
import numpy as np

from ladine_tpu.models import ConditionalModel
from ladine_tpu.ops import DiffusionSchedule, p_sample_loop


def _setup():
    model = ConditionalModel(data_dim=12, feature_dim=8, hidden_dim=8, y_dim=2, n_steps=9)
    x = jnp.linspace(-1, 1, 24).reshape(2, 12)
    y = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    yhat = jnp.array([[0.7, 0.3], [0.4, 0.6]])
    v = model.init(jax.random.PRNGKey(42), x, y, jnp.asarray(0), yhat)
    return model, v, x, y, yhat


def test_golden_eps_forward():
    model, v, x, y, yhat = _setup()
    eps = np.asarray(model.apply(v, x, y, jnp.asarray(4), yhat))
    expected = np.array(
        [[-0.03278956, 0.6603952], [-0.03277852, 0.6604661]], np.float32
    )
    np.testing.assert_allclose(eps, expected, rtol=1e-4, atol=1e-5)


def test_golden_schedule():
    sched = DiffusionSchedule.create("linear", 8, 1e-4, 0.02)
    assert float(sched.alphas_bar_sqrt[4]) == np.float32(0.9855783)
    assert float(sched.one_minus_alphas_bar_sqrt[7]) == np.float32(0.27890465)


def test_golden_reverse_chain():
    model, v, x, y, yhat = _setup()
    f = model.apply(v, x, method="encode")

    def eps_fn(yy, tt):
        return model.apply(v, f, yy, tt, yhat, method="eps")

    sched = DiffusionSchedule.create("linear", 8, 1e-4, 0.02)
    out = np.asarray(p_sample_loop(eps_fn, yhat, sched, jax.random.PRNGKey(7)))
    expected = np.array(
        [[1.9609464, 0.34601405], [-0.18943673, -0.04565874]], np.float32
    )
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)
