"""Experimental int8 eps path: numerical closeness + sampler viability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.infer import member_mc_sample
from ladine_tpu.kernels.int8 import int8_eps, int8_matmul, quantize_member, quantize_weight
from ladine_tpu.models import ConditionalModel
from ladine_tpu.ops import DiffusionSchedule


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (32, 16)) * 0.3
    w_q, scale = quantize_weight(w)
    assert w_q.dtype == jnp.int8
    rec = np.asarray(w_q, np.float32) * np.asarray(scale)[None, :]
    # max-abs symmetric quant: error bounded by half a quantization step
    step = np.asarray(scale)
    assert np.all(np.abs(rec - np.asarray(w)) <= step[None, :] * 0.5 + 1e-7)


def test_int8_matmul_close():
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 64))
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 32)) * 0.1
    w_q, scale = quantize_weight(w)
    got = int8_matmul(x, w_q, scale)
    ref = np.asarray(x) @ np.asarray(w)
    # int8 with per-row/per-channel scales: ~1% relative error at these sizes
    denom = np.abs(ref).mean()
    assert np.abs(np.asarray(got) - ref).mean() / denom < 0.02


@pytest.fixture(scope="module")
def cm():
    model = ConditionalModel(data_dim=24, feature_dim=32, hidden_dim=32, y_dim=2, n_steps=11)
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 24))
    y = jax.random.normal(jax.random.PRNGKey(1), (5, 2))
    yhat = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(2), (5, 2)))
    v = model.init(jax.random.PRNGKey(3), x, y, jnp.asarray(5), yhat)
    return model, v, x, y, yhat


def test_int8_eps_close_to_fp(cm):
    model, v, x, y, yhat = cm
    f = model.apply(v, x, method="encode")
    ref = model.apply(v, f, y, jnp.asarray(5), yhat, method="eps")
    qv = quantize_member(v)
    got = int8_eps(qv, f, y, jnp.asarray(5), yhat)
    err = float(jnp.abs(got - ref).mean() / (jnp.abs(ref).mean() + 1e-8))
    assert err < 0.05, f"int8 eps relative error {err:.3f}"


def test_int8_eps_bf16_intermediates(cm):
    """On TPU the model computes in bf16, so int8_eps stores its hidden-size
    intermediates in f.dtype (halves the per-step elementwise HBM traffic —
    ~half the measured step time at serving shapes). Pin the semantics on
    CPU by passing bf16 features: the OUTPUT is always fp32 (the final dot
    accumulates with preferred_element_type=float32; the engine casts back
    to f.dtype), and the extra bf16 rounding of the intermediates stays
    within the int8 path's own error budget."""
    model, v, x, y, yhat = cm
    f = model.apply(v, x, method="encode")
    ref = model.apply(v, f, y, jnp.asarray(5), yhat, method="eps")
    qv = quantize_member(v)
    got16 = int8_eps(qv, f.astype(jnp.bfloat16), y.astype(jnp.bfloat16),
                     jnp.asarray(5), yhat.astype(jnp.bfloat16))
    err = float(
        jnp.abs(got16.astype(jnp.float32) - ref).mean()
        / (jnp.abs(ref).mean() + 1e-8)
    )
    assert err < 0.07, f"bf16-intermediate int8 eps relative error {err:.3f}"
    # output accumulation is fp32 regardless of the intermediate dtype
    assert got16.dtype == jnp.float32
    got32 = int8_eps(qv, f, y, jnp.asarray(5), yhat)
    assert got32.dtype == jnp.float32


def test_int8_sampler_runs(cm):
    model, v, x, y, yhat = cm
    sched = DiffusionSchedule.create("linear", 10, 1e-4, 0.02)
    fp = member_mc_sample(model, v, x, yhat, jax.random.PRNGKey(7), sched, 4)
    q = member_mc_sample(model, v, x, yhat, jax.random.PRNGKey(7), sched, 4, use_int8_eps=True)
    assert np.isfinite(np.asarray(q)).all()
    # same keys -> same noise; outputs should be close, votes mostly agree
    fp_votes = np.asarray(jnp.argmax(fp, -1))
    q_votes = np.asarray(jnp.argmax(q, -1))
    assert (fp_votes == q_votes).mean() > 0.8


def test_int8_encode_close_to_fp(cm):
    """int8 enc_lin1 (the fixed-cost lever at short DDIM schedules) must
    match the fp32 encode to quantization precision."""
    from ladine_tpu.kernels.int8 import int8_encode, quantize_encoder

    model, v, x, y, yhat = cm
    ref = model.apply(v, x, method="encode")
    got = int8_encode(quantize_encoder(v), x)
    cos = float(jnp.sum(got * ref)
                / (jnp.linalg.norm(got) * jnp.linalg.norm(ref)))
    assert cos > 0.999, f"int8 encode cosine {cos:.5f}"
    err = float(jnp.abs(got - ref).mean() / (jnp.abs(ref).mean() + 1e-8))
    assert err < 0.05, f"int8 encode relative error {err:.4f}"


def test_int8_encode_sampler_votes_agree(cm):
    model, v, x, y, yhat = cm
    sched = DiffusionSchedule.create("linear", 10, 1e-4, 0.02)
    fp = member_mc_sample(model, v, x, yhat, jax.random.PRNGKey(9), sched, 4)
    q = member_mc_sample(model, v, x, yhat, jax.random.PRNGKey(9), sched, 4,
                         use_int8_encode=True)
    assert np.isfinite(np.asarray(q)).all()
    fp_votes = np.asarray(jnp.argmax(fp, -1))
    q_votes = np.asarray(jnp.argmax(q, -1))
    assert (fp_votes == q_votes).mean() > 0.8


def test_int8_mapping_heads_close():
    from ladine_tpu.kernels.int8 import int8_mapping_heads
    from ladine_tpu.models import SEViTGuidance

    g = SEViTGuidance(num_classes=2, num_members=4, vit_depth=5, img_size=16,
                      patch_size=8, embed_dim=16, num_heads=2,
                      mlp_hidden_dims=(32, 16, 8))
    gv = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    x = jax.random.uniform(jax.random.PRNGKey(1), (6, 16, 16, 3))
    for ids in ((0, 2, 3), (3, 0, 0)):  # sorted, unsorted+repeated
        ref = g.apply(gv, x, ids, method="heads_subset")
        taps = g.apply(gv, x, ids, method="taps_subset")
        got = int8_mapping_heads(gv["params"], taps, ids)
        err = float(jnp.abs(got - ref).mean() / (jnp.abs(ref).mean() + 1e-8))
        assert got.shape == ref.shape and err < 0.05, (ids, err)


def test_predictor_int8_encode_votes_agree():
    """Predictor(use_int8_encode=True) end-to-end: same keys, votes agree
    with the fp32 predictor (quantization rel err ~1e-3 per GEMM)."""
    import numpy as np2

    from ladine_tpu.infer import Predictor, stack_members
    from ladine_tpu.models import SEViTGuidance

    g = SEViTGuidance(num_classes=2, num_members=3, vit_depth=3, img_size=16,
                      patch_size=8, embed_dim=16, num_heads=2,
                      mlp_hidden_dims=(16, 8, 8))
    gv = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    m = ConditionalModel(data_dim=768, feature_dim=8, hidden_dim=8, y_dim=2,
                         n_steps=11)
    members = [m.init(jax.random.PRNGKey(5 + i), jnp.zeros((1, 768)),
                      jnp.zeros((1, 2)), jnp.asarray(0), jnp.full((1, 2), .5))
               for i in range(3)]
    sched = DiffusionSchedule.create("linear", 10, 1e-4, 0.02)
    common = dict(guidance=g, guidance_vars=gv, model=m,
                  stacked_vars=stack_members(members), sched=sched,
                  mc_trials=2, ddim_steps=5)
    imgs = np2.random.default_rng(0).random((6, 16, 16, 3)).astype(np2.float32)
    a = Predictor(**common).predict(imgs, key=jax.random.PRNGKey(3))
    b = Predictor(**common, use_int8_encode=True).predict(
        imgs, key=jax.random.PRNGKey(3))
    assert np2.isfinite(b["probs"]).all()
    np2.testing.assert_allclose(a["probs"], b["probs"], atol=0.05)
    assert (np2.asarray(a["majority_vote"]) ==
            np2.asarray(b["majority_vote"])).mean() >= 0.8


def test_predictor_int8_encode_prequantizes_and_saves_float(tmp_path):
    """use_int8_encode pre-quantizes the RUN trees once at init (resident
    int8 lin1 kernels — in-jit quantization would re-read the float weight
    every call and win nothing), while save() keeps the float originals."""
    import numpy as np2

    from ladine_tpu.infer import Predictor, stack_members
    from ladine_tpu.models import SEViTGuidance

    g = SEViTGuidance(num_classes=2, num_members=3, vit_depth=3, img_size=16,
                      patch_size=8, embed_dim=16, num_heads=2,
                      mlp_hidden_dims=(16, 8, 8))
    gv = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    m = ConditionalModel(data_dim=768, feature_dim=8, hidden_dim=8, y_dim=2,
                         n_steps=11)
    members = [m.init(jax.random.PRNGKey(5 + i), jnp.zeros((1, 768)),
                      jnp.zeros((1, 2)), jnp.asarray(0), jnp.full((1, 2), .5))
               for i in range(3)]
    sched = DiffusionSchedule.create("linear", 10, 1e-4, 0.02)
    p = Predictor(guidance=g, guidance_vars=gv, model=m,
                  stacked_vars=stack_members(members), sched=sched,
                  mc_trials=2, ddim_steps=5, use_int8_encode=True)
    # resident run trees carry int8 lin1 kernels
    assert p._rv_s["params"]["enc_lin1"]["Dense_0"]["kernel"].dtype == jnp.int8
    assert p._rv_g["params"]["mlp0"]["linear1"]["Dense_0"]["kernel"].dtype == jnp.int8
    # public trees untouched (what save() serializes)
    assert p.stacked_vars["params"]["enc_lin1"]["Dense_0"]["kernel"].dtype != jnp.int8
    path = str(tmp_path / "a")
    p.save(path)
    loaded = Predictor.load(path)
    assert loaded.use_int8_encode  # persisted
    k = loaded.stacked_vars["params"]["enc_lin1"]["Dense_0"]["kernel"]
    assert k.dtype != jnp.int8  # float weights round-tripped
    imgs = np2.random.default_rng(1).random((4, 16, 16, 3)).astype(np2.float32)
    out = loaded.predict(imgs, key=jax.random.PRNGKey(2))
    assert np2.isfinite(out["probs"]).all()
