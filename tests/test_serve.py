"""Serving API: Predictor predict/save/load roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.infer import Predictor, stack_members
from ladine_tpu.models import ConditionalModel, SEViTGuidance
from ladine_tpu.ops import DiffusionSchedule


@pytest.fixture(scope="module")
def predictor():
    guidance = SEViTGuidance(
        num_classes=2, num_members=3, vit_depth=3,
        img_size=16, patch_size=8, embed_dim=16, num_heads=2, mlp_hidden_dims=(16, 8, 8),
    )
    gvars = guidance.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    model = ConditionalModel(data_dim=768, feature_dim=8, hidden_dim=8, y_dim=2, n_steps=1001)
    members = [
        model.init(jax.random.PRNGKey(5 + i), jnp.zeros((1, 768)), jnp.zeros((1, 2)),
                   jnp.asarray(0), jnp.full((1, 2), 0.5))
        for i in range(3)
    ]
    sched = DiffusionSchedule.create("linear", 1000, 1e-4, 0.02)
    return Predictor(
        guidance=guidance, guidance_vars=gvars, model=model,
        stacked_vars=stack_members(members), sched=sched,
        temperature=0.2, mc_trials=2, ddim_steps=5,
    )


def test_predict_outputs(predictor):
    images = np.random.default_rng(0).random((4, 16, 16, 3)).astype(np.float32)
    out = predictor.predict(images)
    assert out["probs"].shape == (4, 2)
    np.testing.assert_allclose(out["probs"].sum(-1), 1.0, rtol=1e-5)
    assert out["majority_vote"].shape == (4,)
    assert set(np.unique(out["majority_vote"])) <= {0, 1}
    assert (out["piw"] >= 0).all()
    assert (out["mc_variance"] >= 0).all()


def test_predict_auto_key_advances(predictor):
    images = np.random.default_rng(1).random((2, 16, 16, 3)).astype(np.float32)
    a = predictor.predict(images)
    b = predictor.predict(images)
    # MC sampling: consecutive calls draw fresh noise
    assert not np.allclose(a["probs"], b["probs"])
    # explicit key makes it reproducible
    c = predictor.predict(images, key=jax.random.PRNGKey(42))
    d = predictor.predict(images, key=jax.random.PRNGKey(42))
    np.testing.assert_allclose(c["probs"], d["probs"])


def test_save_load_roundtrip(predictor, tmp_path):
    path = str(tmp_path / "artifact")
    predictor.save(path)
    loaded = Predictor.load(path)
    assert loaded.temperature == predictor.temperature
    assert loaded.mc_trials == predictor.mc_trials
    images = np.random.default_rng(2).random((2, 16, 16, 3)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    a = predictor.predict(images, key=key)
    b = loaded.predict(images, key=key)
    np.testing.assert_allclose(a["probs"], b["probs"], rtol=1e-4, atol=1e-5)


def test_save_load_preserves_nondefault_schedule(tmp_path):
    """A cosine-schedule artifact must not silently reload as linear."""
    guidance = SEViTGuidance(
        num_classes=2, num_members=2, vit_depth=2,
        img_size=16, patch_size=8, embed_dim=16, num_heads=2, mlp_hidden_dims=(8, 8, 8),
    )
    gvars = guidance.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    model = ConditionalModel(data_dim=768, feature_dim=8, hidden_dim=8, y_dim=2, n_steps=21)
    members = [
        model.init(jax.random.PRNGKey(i), jnp.zeros((1, 768)), jnp.zeros((1, 2)),
                   jnp.asarray(0), jnp.full((1, 2), 0.5))
        for i in range(2)
    ]
    sched = DiffusionSchedule.create("cosine", 20)
    p = Predictor(guidance=guidance, guidance_vars=gvars, model=model,
                  stacked_vars=stack_members(members), sched=sched,
                  mc_trials=2, ddim_steps=4)
    path = str(tmp_path / "cosine_artifact")
    p.save(path)
    q = Predictor.load(path)
    np.testing.assert_allclose(np.asarray(q.sched.betas), np.asarray(sched.betas), rtol=1e-6)
    images = np.random.default_rng(0).random((2, 16, 16, 3)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    np.testing.assert_allclose(p.predict(images, key=key)["probs"],
                               q.predict(images, key=key)["probs"], rtol=1e-4, atol=1e-5)


def test_int8_matmul_nonneg_mode():
    from ladine_tpu.kernels.int8 import int8_matmul, quantize_weight

    x = jax.nn.softplus(jax.random.normal(jax.random.PRNGKey(0), (8, 64)))  # >= 0
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 32)) * 0.1
    w_q, scale = quantize_weight(w)
    colsum = jnp.sum(w_q.astype(jnp.int32), axis=0).astype(jnp.float32)
    sym = int8_matmul(x, w_q, scale)
    asym = int8_matmul(x, w_q, scale, w_colsum=colsum)
    ref = np.asarray(x) @ np.asarray(w)
    err_sym = np.abs(np.asarray(sym) - ref).mean()
    err_asym = np.abs(np.asarray(asym) - ref).mean()
    # the zero-point-127 scheme has ~2x resolution on non-negative input
    assert err_asym < err_sym


def test_load_with_overrides(predictor, tmp_path):
    path = str(tmp_path / "artifact2")
    predictor.save(path)
    loaded = Predictor.load(path, mc_trials=4, temperature=0.5)
    assert loaded.mc_trials == 4
    assert loaded.temperature == 0.5


def test_load_restores_compute_dtype(predictor, tmp_path):
    """The compute dtype is part of the artifact: a bf16-run predictor must
    reload as bf16 compute (dropping it silently rebuilt fp32 modules, so
    served programs never matched the measured bf16/int8 evidence).
    Legacy artifacts without the field keep their historical fp32 reload;
    load(dtype=...) overrides either way."""
    import dataclasses as dc
    import json

    bf16 = dc.replace(
        predictor,
        guidance=predictor.guidance.copy(dtype=jnp.bfloat16),
        model=predictor.model.copy(dtype=jnp.bfloat16),
    )
    path = str(tmp_path / "bf16_artifact")
    bf16.save(path)
    loaded = Predictor.load(path)
    assert loaded.model.dtype == jnp.bfloat16
    assert loaded.guidance.dtype == jnp.bfloat16
    # explicit override wins
    fp32 = Predictor.load(path, dtype="float32")
    assert fp32.model.dtype == jnp.float32

    # legacy artifact: strip the dtype fields from the meta on disk
    meta_path = tmp_path / "bf16_artifact" / "ladine_meta.json"
    meta = json.loads(meta_path.read_text())
    meta.pop("dtype", None)
    meta["guidance"].pop("dtype", None)
    meta_path.write_text(json.dumps(meta))
    legacy = Predictor.load(path)
    assert legacy.model.dtype is None and legacy.guidance.dtype is None


def test_load_presets(predictor, tmp_path):
    """Named operating points: preset sets sampler/quantization knobs,
    artifact keeps temperature/trials/heads, explicit overrides win."""
    import pytest

    from ladine_tpu.infer.serve import PRESETS

    path = str(tmp_path / "artifact3")
    predictor.save(path)

    fast = Predictor.load(path, preset="fast")
    assert (fast.ddim_steps, fast.ddim_eta) == (10, 1.0)
    assert fast.use_int8 and fast.use_int8_encode
    assert fast.temperature == predictor.temperature  # artifact-owned
    images = np.random.default_rng(3).random((2, 16, 16, 3)).astype(np.float32)
    out = fast.predict(images, key=jax.random.PRNGKey(0))
    assert np.isfinite(out["probs"]).all()

    parity = Predictor.load(path, preset="parity")
    assert parity.ddim_steps == 0 and not parity.use_int8

    # explicit override beats the preset
    tweaked = Predictor.load(path, preset="fast", ddim_steps=25)
    assert tweaked.ddim_steps == 25 and tweaked.use_int8

    with pytest.raises(ValueError, match="unknown preset"):
        Predictor.load(path, preset="turbo")

    assert set(PRESETS) == {"parity", "serving", "fast"}


def test_export_serving_bundle(predictor, tmp_path):
    """AOT deployment bundle: the deserialized StableHLO program must
    reproduce the live Predictor bit-for-bit (same weights, same key),
    refuse unknown batch sizes, and need no model classes to serve."""
    from ladine_tpu.infer import ExportedPredictor

    path = str(tmp_path / "bundle")
    predictor.export_serving(path, batch_sizes=(2, 4))
    served = ExportedPredictor.load(path)
    assert sorted(served.programs) == [2, 4]
    assert served.settings["mc_trials"] == predictor.mc_trials

    images = np.random.default_rng(9).random((2, 16, 16, 3)).astype(np.float32)
    key = jax.random.PRNGKey(11)
    live = predictor.predict(images, key=key)
    aot = served.predict(images, key=key)
    np.testing.assert_allclose(live["probs"], aot["probs"], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(live["majority_vote"], aot["majority_vote"])

    with pytest.raises(ValueError, match="batch sizes"):
        served.predict(np.zeros((3, 16, 16, 3), np.float32))
    with pytest.raises(ValueError, match="not an export_serving bundle"):
        p2 = str(tmp_path / "plain_artifact")
        predictor.save(p2)
        # a plain predictor artifact is not a bundle
        import os
        import shutil

        os.makedirs(os.path.join(p2 + "_b", "programs"), exist_ok=True)
        shutil.copytree(p2, os.path.join(p2 + "_b", "weights"))
        ExportedPredictor.load(p2 + "_b")


def test_export_serving_carries_int8_run_trees(tmp_path):
    """An int8_encode predictor's bundle must carry the PRE-QUANTIZED run
    trees (int8 kernels), not the float originals — the bundled program
    expects the quantized structure."""
    from ladine_tpu.infer import ExportedPredictor

    guidance = SEViTGuidance(
        num_classes=2, num_members=2, vit_depth=2,
        img_size=16, patch_size=8, embed_dim=16, num_heads=2,
        mlp_hidden_dims=(8, 8, 8),
    )
    gvars = guidance.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    model = ConditionalModel(data_dim=768, feature_dim=8, hidden_dim=8,
                             y_dim=2, n_steps=21)
    members = [
        model.init(jax.random.PRNGKey(i), jnp.zeros((1, 768)),
                   jnp.zeros((1, 2)), jnp.asarray(0), jnp.full((1, 2), 0.5))
        for i in range(2)
    ]
    p = Predictor(guidance=guidance, guidance_vars=gvars, model=model,
                  stacked_vars=stack_members(members),
                  sched=DiffusionSchedule.create("linear", 20),
                  mc_trials=2, ddim_steps=4, use_int8=True,
                  use_int8_encode=True)
    path = str(tmp_path / "int8_bundle")
    p.export_serving(path, batch_sizes=(2,))
    served = ExportedPredictor.load(path)
    enc_kernel = served.stacked["params"]["enc_lin1"]["Dense_0"]["kernel"]
    assert enc_kernel.dtype == jnp.int8
    images = np.random.default_rng(1).random((2, 16, 16, 3)).astype(np.float32)
    key = jax.random.PRNGKey(2)
    np.testing.assert_allclose(p.predict(images, key=key)["probs"],
                               served.predict(images, key=key)["probs"],
                               rtol=1e-5, atol=1e-6)


def test_bundle_behind_microbatcher(predictor, tmp_path):
    """The batcher's power-of-two padding buckets are exactly the batch
    sizes a bundle needs: bucket_sizes(cap) + export_serving + MicroBatcher
    serve ragged requests through fixed-shape AOT programs."""
    from ladine_tpu.infer import ExportedPredictor, MicroBatcher

    assert MicroBatcher.bucket_sizes(4) == [1, 2, 4]
    assert MicroBatcher.bucket_sizes(70) == [1, 2, 4, 8, 16, 32, 64, 70]

    path = str(tmp_path / "mb_bundle")
    predictor.export_serving(path, batch_sizes=MicroBatcher.bucket_sizes(4))
    served = ExportedPredictor.load(path)
    batcher = MicroBatcher(served.predict, max_batch=4, max_wait_ms=1.0)
    try:
        out = batcher.predict(
            np.random.default_rng(4).random((3, 16, 16, 3)).astype(np.float32))
        assert out["probs"].shape == (3, 2)  # pad row discarded
    finally:
        batcher.close()


def test_export_bundle_cli(predictor, tmp_path):
    """cli.export_bundle: artifact -> bundle with the requested preset baked
    in and every bucket program present."""
    from ladine_tpu.cli.export_bundle import main as export_main
    from ladine_tpu.infer import ExportedPredictor

    artifact = str(tmp_path / "cli_artifact")
    predictor.save(artifact)
    out = str(tmp_path / "cli_bundle")
    rc = export_main(["--artifact", artifact, "--out", out,
                      "--preset", "fast", "--max_batch", "2", "--cpu"])
    assert rc == 0
    served = ExportedPredictor.load(out)
    assert sorted(served.programs) == [1, 2]
    assert served.settings["ddim_steps"] == 10 and served.settings["use_int8"]
    imgs = np.random.default_rng(6).random((1, 16, 16, 3)).astype(np.float32)
    assert np.isfinite(served.predict(imgs)["probs"]).all()


def test_cli_test_path_export_predictor(tmp_path):
    """--export_predictor on the --test path packages the exact evaluated
    configuration (weights + sampler/quantization knobs) as a servable
    artifact — the train -> evaluate -> deploy handoff."""
    from ladine_tpu.cli.main import main as cli_main

    exp = str(tmp_path / "exp")
    rc = cli_main([
        "--test", "--demo", "--cpu", "--exp", exp, "--doc", "ep",
        "--mc_trials", "2", "--timesteps", "8", "--ddim", "4",
        "--export_predictor",
    ])
    assert rc == 0
    import os

    p = Predictor.load(os.path.join(exp, "logs", "ep", "predictor_artifact"))
    assert p.ddim_steps == 4 and p.mc_trials == 2
    s = p.guidance.img_size
    imgs = np.random.default_rng(0).random((2, s, s, 3)).astype(np.float32)
    assert np.isfinite(p.predict(imgs)["probs"]).all()


def test_predictor_int8_pallas_path(predictor, tmp_path):
    """use_int8_pallas serves through the fused Pallas scan body (interpret
    mode on CPU) and the flag survives a save/load roundtrip."""
    import dataclasses

    p = dataclasses.replace(predictor, use_int8_pallas=True)
    images = np.random.default_rng(3).random((2, 16, 16, 3)).astype(np.float32)
    out = p.predict(images)
    assert out["probs"].shape == (2, 2)
    np.testing.assert_allclose(np.asarray(out["probs"]).sum(-1), 1.0, rtol=1e-5)
    path = str(tmp_path / "artifact_pallas")
    p.save(path)
    loaded = Predictor.load(path)
    assert loaded.use_int8_pallas is True
    out2 = loaded.predict(images, key=jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(out2["probs"])).all()
