import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.models import ConditionalLinear, ConditionalModel, MappingMLP, SEViTGuidance, ViT


@pytest.fixture(scope="module")
def small_cm():
    model = ConditionalModel(
        data_dim=48, feature_dim=16, hidden_dim=16, y_dim=2, n_steps=11, guidance=True
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 48))
    y = jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    yhat = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(2), (4, 2)))
    variables = model.init(jax.random.PRNGKey(3), x, y, jnp.asarray(5), yhat)
    return model, variables, x, y, yhat


def test_conditional_linear_gating():
    m = ConditionalLinear(num_out=8, n_steps=5)
    x = jnp.ones((3, 4))
    v = m.init(jax.random.PRNGKey(0), x, jnp.asarray(2))
    out_t2 = m.apply(v, x, jnp.asarray(2))
    assert out_t2.shape == (3, 8)
    # gate is multiplicative: scaling the embedding row scales the output
    emb = v["params"]["embed"]
    v2 = {"params": {**v["params"], "embed": emb.at[2].multiply(2.0)}}
    out_scaled = m.apply(v2, x, jnp.asarray(2))
    np.testing.assert_allclose(np.asarray(out_scaled), 2 * np.asarray(out_t2), rtol=1e-6)
    # embed init is U[0,1)
    assert float(emb.min()) >= 0.0 and float(emb.max()) < 1.0


def test_conditional_linear_batched_t():
    m = ConditionalLinear(num_out=8, n_steps=5)
    x = jnp.ones((3, 4))
    v = m.init(jax.random.PRNGKey(0), x, jnp.asarray(0))
    t = jnp.array([0, 1, 4])
    out = m.apply(v, x, t)
    for i in range(3):
        row = m.apply(v, x[i : i + 1], t[i])
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(row[0]), rtol=1e-6)


def test_conditional_model_shapes(small_cm):
    model, variables, x, y, yhat = small_cm
    out = model.apply(variables, x, y, jnp.asarray(5), yhat)
    assert out.shape == (4, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_encode_eps_split_matches_full(small_cm):
    """encode + eps must equal the fused forward at eval — the factored form
    is what the reverse-diffusion scan uses."""
    model, variables, x, y, yhat = small_cm
    full = model.apply(variables, x, y, jnp.asarray(5), yhat)
    f = model.apply(variables, x, method="encode")
    split = model.apply(variables, f, y, jnp.asarray(5), yhat, method="eps")
    np.testing.assert_allclose(np.asarray(full), np.asarray(split), rtol=1e-6)


def test_guidance_flag_requires_yhat(small_cm):
    model, variables, x, y, _ = small_cm
    with pytest.raises(ValueError):
        model.apply(variables, x, y, jnp.asarray(5))


def test_batchnorm_train_updates_stats(small_cm):
    model, variables, x, y, yhat = small_cm
    out, mutated = model.apply(
        variables, x, y, jnp.asarray(5), yhat, train=True, mutable=["batch_stats"]
    )
    before = variables["batch_stats"]["enc_bn1"]["mean"]
    after = mutated["batch_stats"]["enc_bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_batchnorm_eval_is_per_sample(small_cm):
    """At eval (running stats) each sample's output is batch-independent —
    required for correctness of vmapping MC trials."""
    model, variables, x, y, yhat = small_cm
    full = model.apply(variables, x, y, jnp.asarray(5), yhat)
    one = model.apply(variables, x[:1], y[:1], jnp.asarray(5), yhat[:1])
    np.testing.assert_allclose(np.asarray(full[:1]), np.asarray(one), rtol=1e-5)


def test_mapping_mlp_shapes():
    m = MappingMLP(num_classes=2, hidden_dims=(32, 16, 8))
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 14, 24))
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    assert out.shape == (3, 2)


@pytest.fixture(scope="module")
def tiny_vit():
    vit = ViT(num_classes=2, img_size=32, patch_size=8, embed_dim=32, depth=6, num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = vit.init(jax.random.PRNGKey(1), x)
    return vit, v, x


def test_vit_forward(tiny_vit):
    vit, v, x = tiny_vit
    out = vit.apply(v, x)
    assert out.shape == (2, 2)


def test_vit_tap_features_no_cls_no_pos(tiny_vit):
    """Taps are bare patch features: 16 tokens (no cls), and must NOT depend
    on the position embedding — the reference quirk."""
    vit, v, x = tiny_vit
    taps = vit.apply(v, x, (1, 2, 3), method="tap_features")
    assert len(taps) == 3
    assert taps[0].shape == (2, 16, 32)
    v2 = jax.tree.map(lambda a: a, v)
    v2 = {
        "params": {
            **v["params"],
            "pos_embed": v["params"]["pos_embed"] + 100.0,
        }
    }
    taps2 = vit.apply(v2, x, (1, 2, 3), method="tap_features")
    np.testing.assert_allclose(np.asarray(taps[2]), np.asarray(taps2[2]), rtol=1e-6)
    # but the full forward DOES depend on pos_embed
    out1 = vit.apply(v, x)
    out2 = vit.apply(v2, x)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_vit_single_pass_taps_match_truncated_reruns(tiny_vit):
    """One tapped pass == independent truncated forwards (the reference's
    triangular recomputation), depth by depth."""
    vit, v, x = tiny_vit
    taps = vit.apply(v, x, (1, 2, 3), method="tap_features")
    for d in (1, 2, 3):
        solo = vit.apply(v, x, (d,), method="tap_features")[0]
        np.testing.assert_allclose(
            np.asarray(taps[d - 1]), np.asarray(solo), rtol=2e-5, atol=1e-5
        )


def test_forward_with_taps_consistent(tiny_vit):
    vit, v, x = tiny_vit
    logits, taps = vit.apply(v, x, (1, 2), method="forward_with_taps")
    np.testing.assert_allclose(np.asarray(logits), np.asarray(vit.apply(v, x)), rtol=2e-5, atol=1e-5)
    solo = vit.apply(v, x, (1, 2), method="tap_features")
    np.testing.assert_allclose(np.asarray(taps[1]), np.asarray(solo[1]), rtol=2e-5, atol=1e-5)


def test_guidance_heads():
    g = SEViTGuidance(
        num_classes=2, num_members=3, vit_depth=4,
        img_size=32, patch_size=8, embed_dim=32, num_heads=4,
        mlp_hidden_dims=(32, 16, 8),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = g.init(jax.random.PRNGKey(1), x)
    out = g.apply(v, x)
    assert out.shape == (4, 2, 2)  # members+1 heads
    vit_only = g.apply(v, x, method="vit_logits")
    np.testing.assert_allclose(np.asarray(out[-1]), np.asarray(vit_only), rtol=2e-5, atol=1e-5)
    tap_only = g.apply(v, x, method="tap_logits")
    np.testing.assert_allclose(np.asarray(out[:-1]), np.asarray(tap_only), rtol=2e-5, atol=1e-5)


def test_torch_linear_init_distribution():
    """Kernel and bias are U(+-1/sqrt(fan_in)) like torch's nn.Linear."""
    from ladine_tpu.models import TorchLinear

    m = TorchLinear(64)
    v = m.init(jax.random.PRNGKey(0), jnp.ones((1, 100)))
    k = np.asarray(v["params"]["Dense_0"]["kernel"])
    b = np.asarray(v["params"]["Dense_0"]["bias"])
    bound = 1 / np.sqrt(100)
    assert np.abs(k).max() <= bound + 1e-6
    assert np.abs(b).max() <= bound + 1e-6
    # roughly uniform: std of U(-a,a) is a/sqrt(3)
    assert np.std(k) == pytest.approx(bound / np.sqrt(3), rel=0.1)


def test_guidance_heads_subset_matches_full():
    """heads_subset(x, idx) == __call__(x)[idx] for every interesting static
    head set — including skipping the full-ViT head (the serving hot path)
    and a single mid-depth member (--mlp_idx artifacts)."""
    g = SEViTGuidance(
        num_classes=2, num_members=3, vit_depth=4,
        img_size=32, patch_size=8, embed_dim=32, num_heads=4,
        mlp_hidden_dims=(32, 16, 8),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = g.init(jax.random.PRNGKey(1), x)
    full = np.asarray(g.apply(v, x))  # (4, B, C)
    for idx in [(0, 1, 2), (1,), (2, 0), (3,), (0, 3), (0, 1, 2, 3)]:
        sub = np.asarray(g.apply(v, x, idx, method="heads_subset"))
        np.testing.assert_allclose(
            sub, full[list(idx)], rtol=2e-5, atol=1e-5,
            err_msg=f"heads_subset mismatch for idx={idx}",
        )
    with pytest.raises(ValueError):
        g.apply(v, x, (4,), method="heads_subset")
