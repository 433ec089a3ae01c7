"""Fused Pallas int8 scan-body kernel (kernels/int8_pallas.py): numerics vs
the XLA int8 path, row-max semantics, and the engine's MC-fold integration.

On CPU the kernel runs in Pallas interpret mode — the real kernel body, not
a fallback — so these tests pin the kernel's math; only the Mosaic lowering
and its performance need the chip (bench --pallas_int8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.infer import member_mc_sample
from ladine_tpu.kernels.fused_eps import _fold
from ladine_tpu.kernels.int8 import int8_eps, int8_matmul, quantize_member, quantize_weight
from ladine_tpu.kernels.int8_pallas import int8_eps_pallas, int8_linear_softplus
from ladine_tpu.models import ConditionalModel
from ladine_tpu.ops import DiffusionSchedule, ddim_timesteps


def _ref_layer(x, w_q, w_scale, a, c, colsum=None):
    """The XLA int8 path's layer math (kernels/int8.py int8_eps body)."""
    z = int8_matmul(x.astype(jnp.float32), w_q, w_scale, w_colsum=colsum) * a + c
    return jax.nn.softplus(z)


@pytest.mark.parametrize("zp", [False, True])
def test_int8_linear_softplus_matches_xla_path(zp):
    k, n, r = 96, 80, 23  # deliberately unaligned: exercises padding
    key = jax.random.PRNGKey(0)
    kx, kw, ka, kc = jax.random.split(key, 4)
    x = jax.random.normal(kx, (r, k))
    if zp:
        x = jax.nn.softplus(x)  # zero-point mode assumes non-negative input
    w_q, w_scale = quantize_weight(jax.random.normal(kw, (k, n)) * 0.2)
    colsum = jnp.sum(w_q.astype(jnp.int32), axis=0).astype(jnp.float32) if zp else None
    a = jax.random.normal(ka, (n,)) * 0.5 + 1.0
    c = jax.random.normal(kc, (n,)) * 0.1

    ref = _ref_layer(x, w_q, w_scale, a, c, colsum=colsum)
    xmax = (jnp.max(x, axis=1, keepdims=True) if zp
            else jnp.max(jnp.abs(x), axis=1, keepdims=True))
    got, gmax = int8_linear_softplus(
        x, xmax, w_q, w_scale * a, c, colsum=colsum, block_r=8, block_n=128
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
    # row max is over the compute-dtype h the next layer's quantizer reads
    np.testing.assert_allclose(
        np.asarray(gmax[:, 0]), np.asarray(jnp.max(got, axis=1)), rtol=1e-6
    )


def test_int8_linear_softplus_bf16_rowmax_uses_stored_dtype():
    """hmax must be the max of the bf16-ROUNDED h (what the consumer reads),
    not of the f32 pre-rounding values."""
    k, n, r = 64, 128, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (r, k)).astype(jnp.bfloat16)
    w_q, w_scale = quantize_weight(jax.random.normal(jax.random.PRNGKey(2), (k, n)) * 0.2)
    a = jnp.ones((n,))
    c = jnp.zeros((n,))
    xmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    h, hmax = int8_linear_softplus(x, xmax, w_q, w_scale * a, c, block_r=8, block_n=128)
    assert h.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(hmax[:, 0]),
        np.asarray(jnp.max(h.astype(jnp.float32), axis=1)),
        rtol=1e-6,
    )


@pytest.fixture(scope="module")
def cm():
    model = ConditionalModel(data_dim=24, feature_dim=32, hidden_dim=32, y_dim=2, n_steps=11)
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 24))
    y = jax.random.normal(jax.random.PRNGKey(1), (5, 2))
    yhat = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(2), (5, 2)))
    v = model.init(jax.random.PRNGKey(3), x, y, jnp.asarray(5), yhat)
    return model, v, x, y, yhat


def test_int8_eps_pallas_matches_int8_eps(cm):
    """Layer-for-layer parity with the XLA int8 path (same quantization
    schemes, same folding) — f32 associativity is the only difference."""
    model, v, x, y, yhat = cm
    f = model.apply(v, x, method="encode")
    qv = quantize_member(v)
    ref = int8_eps(qv, f, y, jnp.asarray(5), yhat)
    got = int8_eps_pallas(qv, f, y, jnp.asarray(5), yhat, block_r=8, block_n=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_int8_eps_pallas_bf16(cm):
    """bf16 compute dtype: intermediates stored bf16, output fp32 — the
    same contract as int8_eps's bf16-intermediates mode."""
    model, v, x, y, yhat = cm
    f = model.apply(v, x, method="encode").astype(jnp.bfloat16)
    qv = quantize_member(v)
    ref = int8_eps(qv, f, y.astype(jnp.bfloat16), jnp.asarray(5), yhat.astype(jnp.bfloat16))
    got = int8_eps_pallas(qv, f, y.astype(jnp.bfloat16), jnp.asarray(5),
                          yhat.astype(jnp.bfloat16), block_r=8, block_n=128)
    assert got.dtype == jnp.float32
    err = float(jnp.abs(got - ref).mean() / (jnp.abs(ref).mean() + 1e-8))
    assert err < 0.02, f"bf16 pallas-vs-xla int8 relative error {err:.4f}"


def test_engine_mc_fold_runs_and_agrees(cm):
    """use_int8_pallas folds MC trials into GEMM rows; the sampler must
    produce the right shape and agree with the vmapped int8 path in
    distribution (deterministic check: eta=0 DDIM from a PINNED y_T is a
    pure function of eps, so member means match closely)."""
    model, v, x, y, yhat = cm
    sched = DiffusionSchedule.create("linear", 11, 1e-4, 0.02)
    tau = ddim_timesteps(11, 5)
    mc = 16
    key = jax.random.PRNGKey(7)
    out_pallas = member_mc_sample(
        model, v, x, yhat, key, sched, mc_trials=mc, tau=tau, eta=0.0,
        use_int8_pallas=True,
    )
    assert out_pallas.shape == (mc, x.shape[0], 2)
    assert bool(jnp.all(jnp.isfinite(out_pallas)))
    out_int8 = member_mc_sample(
        model, v, x, yhat, key, sched, mc_trials=mc, tau=tau, eta=0.0,
        use_int8_eps=True,
    )
    # Different PRNG stream layouts -> trials are not comparable pairwise,
    # and MC=16 means of an untrained model are noisy per element; the exact
    # eps math is pinned by test_int8_eps_pallas_matches_int8_eps, so here
    # compare coarse sample statistics over all (MC x batch x class) draws.
    p, i = np.asarray(out_pallas, np.float64), np.asarray(out_int8, np.float64)
    assert abs(p.mean() - i.mean()) < 0.2, (p.mean(), i.mean())
    assert 0.6 < p.std() / i.std() < 1.6, (p.std(), i.std())


def test_tpu_lowering_exports():
    """The kernel must keep LOWERING for the TPU target from a CPU host
    (jax.export runs the Mosaic serialization pipeline) — catches
    unsupported-op regressions (e.g. the int8 MXU dot) without a chip."""
    r, k, n = 256, 512, 512
    x = jnp.zeros((r, k), jnp.bfloat16)
    xmax = jnp.ones((r, 1), jnp.float32)
    w_q = jnp.zeros((k, n), jnp.int8)
    s = jnp.ones((n,), jnp.float32)
    c = jnp.zeros((n,), jnp.float32)
    fn = jax.jit(lambda *a: int8_linear_softplus(*a, interpret=False))
    exp = jax.export.export(fn, platforms=["tpu"])(x, xmax, w_q, s, c)
    assert tuple(exp.out_avals[0].shape) == (r, n)


def test_int8_eps_pallas_fused_matches_int8_eps(cm):
    """v2 (lin1-in-prologue + lin4 K-accumulation) matches the XLA int8
    path up to f32 associativity; bf16 stays within the int8 error budget."""
    from ladine_tpu.kernels.int8_pallas import int8_eps_pallas_fused

    model, v, x, y, yhat = cm
    f = model.apply(v, x, method="encode")
    qv = quantize_member(v)
    ref = int8_eps(qv, f, y, jnp.asarray(5), yhat)
    got = int8_eps_pallas_fused(qv, f, y, jnp.asarray(5), yhat,
                                block_r=8, block_n=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    fb = f.astype(jnp.bfloat16)
    ref16 = int8_eps(qv, fb, y.astype(jnp.bfloat16), jnp.asarray(5),
                     yhat.astype(jnp.bfloat16))
    got16 = int8_eps_pallas_fused(qv, fb, y.astype(jnp.bfloat16), jnp.asarray(5),
                                  yhat.astype(jnp.bfloat16), block_r=8, block_n=128)
    assert got16.dtype == jnp.float32
    err = float(jnp.abs(got16 - ref16).mean() / (jnp.abs(ref16).mean() + 1e-8))
    assert err < 0.02, f"v2 bf16 pallas-vs-xla relative error {err:.4f}"


def test_engine_pallas_v2_runs(cm):
    model, v, x, y, yhat = cm
    sched = DiffusionSchedule.create("linear", 11, 1e-4, 0.02)
    tau = ddim_timesteps(11, 5)
    out = member_mc_sample(
        model, v, x, yhat, jax.random.PRNGKey(7), sched, mc_trials=4, tau=tau,
        eta=0.0, use_int8_pallas=True, pallas_fuse_ends=True,
    )
    assert out.shape == (4, x.shape[0], 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_tpu_lowering_exports_v2():
    """v2's two fused kernels must keep lowering for the TPU target."""
    from ladine_tpu.kernels.int8_pallas import int8_eps_pallas_fused
    from ladine_tpu.models import ConditionalModel as CM

    model = CM(data_dim=24, feature_dim=512, hidden_dim=512, y_dim=2,
               n_steps=11, dtype=jnp.bfloat16)
    x = jnp.zeros((8, 24))
    y = jnp.zeros((8, 2))
    yhat = jnp.full((8, 2), 0.5)
    v = model.init(jax.random.PRNGKey(0), x, y, jnp.asarray(5), yhat)
    qv = quantize_member(v)
    f = jnp.zeros((256, 512), jnp.bfloat16)
    yr = jnp.zeros((256, 2), jnp.bfloat16)
    yh = jnp.full((256, 2), 0.5, jnp.bfloat16)
    fn = jax.jit(lambda f, y, yh: int8_eps_pallas_fused(
        qv, f, y, jnp.asarray(5), yh, interpret=False))
    exp = jax.export.export(fn, platforms=["tpu"])(f, yr, yh)
    assert tuple(exp.out_avals[0].shape) == (256, 2)


def test_pick_block_r_divisor_selection():
    """Block picker prefers a dividing multiple-of-8 (no pad copy in the
    scan body) and only falls back to padding when none exists. The serving
    row counts (MC*B = 1400 / 5600) must hit the no-pad path."""
    from ladine_tpu.kernels.int8_pallas import _pick_block_r

    assert _pick_block_r(1400, 512) == 280   # largest mult-of-8 divisor <= 512
    assert _pick_block_r(5600, 512) == 400
    assert _pick_block_r(1024, 512) == 512   # exact divide keeps the default
    assert _pick_block_r(7, 512) == 8        # r <= block: rounded up, padded
    assert _pick_block_r(23, 8) == 8         # no divisor: fall back to pad
    assert _pick_block_r(1400, 512) % 8 == 0


def test_block_env_overrides(monkeypatch):
    """LADINE_PALLAS_BLOCK_R/_N env vars override caller defaults (the
    on-chip tuning hook); unset env leaves the defaults untouched."""
    from ladine_tpu.kernels.int8_pallas import _block_overrides

    monkeypatch.delenv("LADINE_PALLAS_BLOCK_R", raising=False)
    monkeypatch.delenv("LADINE_PALLAS_BLOCK_N", raising=False)
    assert _block_overrides(512, 256) == (512, 256)
    monkeypatch.setenv("LADINE_PALLAS_BLOCK_R", "128")
    monkeypatch.setenv("LADINE_PALLAS_BLOCK_N", "1024")
    assert _block_overrides(512, 256) == (128, 1024)
