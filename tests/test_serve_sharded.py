"""Mesh-sharded serving: Predictor(mesh=...) parity with single-device.

The reference has no serving at all, let alone multi-accelerator serving
(SURVEY.md C23/C24 — one CUDA device). Here the Predictor accepts a
('member','data') mesh and serves the ensemble with member-sharded stacked
variables and a data-sharded request batch — the same GSPMD layout
`make_eval_pipeline(mesh=...)` uses — so these tests pin output parity
between the sharded and single-device programs on the virtual 8-device
CPU mesh (conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.infer import Predictor, stack_members
from ladine_tpu.models import ConditionalModel, SEViTGuidance
from ladine_tpu.ops import DiffusionSchedule
from ladine_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def parts():
    guidance = SEViTGuidance(
        num_classes=2, num_members=4, vit_depth=4,
        img_size=16, patch_size=8, embed_dim=16, num_heads=2, mlp_hidden_dims=(16, 8, 8),
    )
    gvars = guidance.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    model = ConditionalModel(data_dim=768, feature_dim=8, hidden_dim=8, y_dim=2, n_steps=11)
    members = [
        model.init(jax.random.PRNGKey(5 + i), jnp.zeros((1, 768)), jnp.zeros((1, 2)),
                   jnp.asarray(0), jnp.full((1, 2), 0.5))
        for i in range(4)
    ]
    sched = DiffusionSchedule.create("linear", 10, 1e-4, 0.02)
    return dict(
        guidance=guidance, guidance_vars=gvars, model=model,
        stacked_vars=stack_members(members), sched=sched,
        temperature=0.2, mc_trials=2, ddim_steps=5,
    )


def test_sharded_predict_matches_unsharded(parts):
    plain = Predictor(**parts)
    sharded = Predictor(**parts, mesh=make_mesh(8, num_members=4))
    images = np.random.default_rng(0).random((8, 16, 16, 3)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    a = plain.predict(images, key=key)
    b = sharded.predict(images, key=key)
    for k in ("probs", "majority_vote", "piw", "mc_variance"):
        np.testing.assert_allclose(a[k], b[k], rtol=1e-4, atol=1e-5, err_msg=k)


def test_tail_batch_falls_back(parts):
    """A batch that doesn't tile the data axis serves via the plain program."""
    plain = Predictor(**parts)
    sharded = Predictor(**parts, mesh=make_mesh(8, num_members=4))
    # make_mesh(8, num_members=4) -> (member=4, data=2); 7 doesn't tile 2
    images = np.random.default_rng(1).random((7, 16, 16, 3)).astype(np.float32)
    key = jax.random.PRNGKey(4)
    a = plain.predict(images, key=key)
    b = sharded.predict(images, key=key)
    np.testing.assert_allclose(a["probs"], b["probs"], rtol=1e-4, atol=1e-5)


def test_load_with_mesh(parts, tmp_path):
    """Predictor.load(path, mesh=...) attaches the mesh to a saved artifact."""
    path = str(tmp_path / "artifact")
    Predictor(**parts).save(path)
    mesh = make_mesh(8, num_members=4)
    loaded = Predictor.load(path, mesh=mesh)
    assert loaded.mesh is mesh
    # members landed member-sharded (not replicated)
    # the RUN tree (what the jitted program receives) landed member-sharded;
    # the public stacked_vars stays the untouched save()-able original
    leaf = jax.tree.leaves(loaded._rv_s)[0]
    assert not leaf.sharding.is_fully_replicated
    images = np.random.default_rng(2).random((4, 16, 16, 3)).astype(np.float32)
    key = jax.random.PRNGKey(5)
    a = Predictor.load(path).predict(images, key=key)
    b = loaded.predict(images, key=key)
    np.testing.assert_allclose(a["probs"], b["probs"], rtol=1e-4, atol=1e-5)


def test_mesh_int8_encode_nonlinear_arch_aliases_originals():
    """With a mesh, use_int8_encode=True, and a NON-'linear' arch (no
    encoder quantization possible), the Predictor must not pin a duplicate
    full-size ensemble copy: unquantized trees alias the sharded run trees
    (ADVICE r3: the aliasing branch used to gate on the flag, not on
    whether quantization actually ran)."""
    guidance = SEViTGuidance(
        num_classes=2, num_members=4, vit_depth=4,
        img_size=16, patch_size=8, embed_dim=16, num_heads=2,
        mlp_hidden_dims=(16, 8, 8),
    )
    gvars = guidance.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    model = ConditionalModel(data_dim=768, feature_dim=8, hidden_dim=8,
                             y_dim=2, n_steps=11, arch="simple")
    members = [
        model.init(jax.random.PRNGKey(5 + i), jnp.zeros((1, 768)),
                   jnp.zeros((1, 2)), jnp.asarray(0), jnp.full((1, 2), 0.5))
        for i in range(4)
    ]
    sched = DiffusionSchedule.create("linear", 10, 1e-4, 0.02)
    pred = Predictor(
        guidance=guidance, guidance_vars=gvars, model=model,
        stacked_vars=stack_members(members), sched=sched, temperature=0.2,
        mc_trials=2, ddim_steps=5, mesh=make_mesh(8, num_members=4),
        use_int8_encode=True,
    )
    # the encoder tree was never quantized -> originals ARE the run tree
    assert pred.stacked_vars is pred._rv_s
    # the mapping heads WERE quantized (all conditioning heads are mapping
    # heads here) -> float originals kept for save()
    assert pred.guidance_vars is not pred._rv_g
    images = np.random.default_rng(3).random((8, 16, 16, 3)).astype(np.float32)
    out = pred.predict(images, key=jax.random.PRNGKey(6))
    assert np.isfinite(out["probs"]).all()
