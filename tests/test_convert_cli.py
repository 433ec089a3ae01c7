"""cli.convert end-to-end: reference-layout .pth artifacts -> runner-loadable
checkpoints -> evaluation, plus a full-size-dims parity spot check.

The torch modules are built in-test with the reference's exact layouts
(state-dict key names from mapping/models/mlp.py, diffusion/latent_model.py,
timm vit_base_patch16_224) — torch in this image is CPU-only.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

from tests.test_encoders_convert import (  # noqa: E402
    _torch_conditional_model,
    _torch_mapping_mlp,
    _torch_vit,
)

DIMS = dict(img=16, patch=8, embed=16, heads=2, depth=5)


@pytest.fixture(scope="module")
def reference_artifacts(tmp_path_factory):
    """A reference-layout pretrained dir + diffusion ckpts at tiny dims."""
    root = tmp_path_factory.mktemp("ref_ckpts")
    pre = root / "chest_x_ray_ckpt"
    (pre / "MLPs").mkdir(parents=True)
    vit = _torch_vit(depth=DIMS["depth"], embed=DIMS["embed"], heads=DIMS["heads"],
                     img=DIMS["img"], patch=DIMS["patch"]).eval()
    # the reference saves WHOLE-MODULE pickles; state dicts convert the same
    torch.save(vit.state_dict(), pre / "vit_base_patch16_224_ChestXRay.pth")
    for k in range(5):
        mlp = _torch_mapping_mlp(in_features=(DIMS["img"] // DIMS["patch"]) ** 2 * DIMS["embed"])
        torch.save(mlp.state_dict(), pre / "MLPs" / f"block_{k}.pth")
    diffu = []
    for k in range(5):
        cm = _torch_conditional_model(data_dim=DIMS["img"] ** 2 * 3, hidden=16,
                                      feat=16, y_dim=2, n_steps=11)
        p = root / f"diffu{k}_ckpt_best_eph9_acc80.0.pth"
        # the reference's checkpoint wrapper (cts.py:1121-1126)
        torch.save({"noise_estimator": cm.state_dict(), "optimizer": {}, "epoch": 9}, p)
        diffu.append(str(p))
    return str(pre), diffu


@pytest.fixture(scope="module")
def small_config(tmp_path_factory):
    cfg = {
        "data": {"dataset": "ChestXRay", "num_classes": 2},
        "model": {"image_size": 16, "patch_size": 8, "embed_dim": 16, "vit_depth": 5,
                  "num_heads": 2, "mlp_hidden_dims": [16, 8, 4],
                  "feature_dim": 16, "hidden_dim": 16, "data_dim": 16 * 16 * 3},
        "diffusion": {"timesteps": 10, "num_members": 5, "ddim_steps": 5},
        "testing": {"batch_size": 4, "mc_trials": 2, "drop_last": False},
    }
    p = tmp_path_factory.mktemp("ccfg") / "small.yml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_convert_cli_end_to_end(reference_artifacts, small_config, tmp_path):
    from ladine_tpu.cli.convert import main as convert_main
    from ladine_tpu.infer import Predictor

    pre, diffu = reference_artifacts
    out = str(tmp_path / "converted")
    rc = convert_main([
        "--cpu", "--pretrained_dir", pre, "--dataset", "ChestXRay",
        "--diffusion_ckpt", *diffu, "--config", small_config,
        "--out", out, "--export_predictor",
    ])
    assert rc == 0
    assert os.path.isdir(os.path.join(out, "guidance_ChestXRay"))
    for k in range(5):
        assert os.path.isdir(os.path.join(out, f"member_{k}"))

    # the artifact serves
    predictor = Predictor.load(os.path.join(out, "predictor_artifact"))
    imgs = np.random.default_rng(0).random((2, 16, 16, 3)).astype(np.float32)
    res = predictor.predict(imgs)
    assert res["probs"].shape == (2, 2)
    assert np.isfinite(res["probs"]).all()


def test_converted_ckpts_feed_the_runner(reference_artifacts, small_config, tmp_path):
    """--guidance_ckpt/--diffusion_ckpt consume the converted artifacts in
    the normal --test path (parity-eval flow for reference-trained weights)."""
    from ladine_tpu.cli.convert import main as convert_main
    from ladine_tpu.cli.main import main

    pre, diffu = reference_artifacts
    out = str(tmp_path / "converted")
    rc = convert_main(["--cpu", "--pretrained_dir", pre, "--dataset", "ChestXRay",
                       "--diffusion_ckpt", *diffu, "--config", small_config, "--out", out])
    assert rc == 0

    # tiny on-disk test split
    from PIL import Image

    ds = tmp_path / "ds"
    rng = np.random.default_rng(1)
    for cls_idx, cls in enumerate(["NORMAL", "TUBERCULOSIS"]):
        d = ds / "testing" / cls
        d.mkdir(parents=True)
        for i in range(4):
            arr = rng.integers(0, 40, size=(16, 16, 3)) + cls_idx * 140
            Image.fromarray(arr.astype(np.uint8)).save(d / f"i{i}.png")

    cfg = yaml.safe_load(open(small_config))
    cfg["data"]["dataroot"] = str(ds)
    cfg2 = tmp_path / "cfg2.yml"
    cfg2.write_text(yaml.safe_dump(cfg))
    exp = str(tmp_path / "exp")
    rc = main([
        "--test", "--config", str(cfg2), "--cpu", "--exp", exp, "--doc", "cv",
        "--timesteps", "10", "--mc_trials", "2", "--ddim", "5",
        "--guidance_ckpt", os.path.join(out, "guidance_ChestXRay"),
        "--diffusion_ckpt", *[os.path.join(out, f"member_{k}") for k in range(5)],
    ])
    assert rc == 0
    report = json.load(open(os.path.join(exp, "logs", "cv", "report.json")))
    assert report["num_samples"] == 10  # 5 members x 2 trials
    assert report["num_instances"] == 8


def test_full_size_conversion_parity():
    """Logit parity at the REAL dims (224/768/4096): reference-layout torch
    modules -> converters -> our models, through the guidance tap path and
    one reverse-diffusion step (VERDICT r1 Next #2). Batch 1, eager CPU."""
    from ladine_tpu.models import ConditionalModel, MappingMLP, ViT
    from ladine_tpu.ops import DiffusionSchedule
    from ladine_tpu.ops.diffusion import p_sample_coefficients, p_sample_step
    from ladine_tpu.utils.torch_convert import (
        convert_conditional_model,
        convert_mapping_mlp,
        convert_vit,
    )

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    x_img = rng.random((1, 224, 224, 3)).astype(np.float32)

    # --- guidance: full ViT-B/16 + one full-size mapping MLP -------------
    tvit = _torch_vit(depth=12, embed=768, heads=12, img=224, patch=16).eval()
    vparams = convert_vit(tvit.state_dict(), depth=12)
    vit = ViT(num_classes=2, img_size=224, patch_size=16, embed_dim=768,
              depth=12, num_heads=12)
    ours_logits = vit.apply({"params": vparams}, jnp.asarray(x_img))
    with torch.no_grad():
        theirs_logits = tvit(torch.tensor(x_img).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(np.asarray(ours_logits), theirs_logits,
                               rtol=1e-3, atol=1e-4)

    # tap at depth 2 -> full-size mapping MLP (150528 -> 4096 -> 2048 -> 128)
    class _RefMLP(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.linear1 = torch.nn.Linear(196 * 768, 4096)
            self.linear2 = torch.nn.Linear(4096, 2048)
            self.linear3 = torch.nn.Linear(2048, 128)
            self.linear4 = torch.nn.Linear(128, 2)

        def forward(self, x):
            import torch.nn.functional as F

            x = x.reshape(x.shape[0], -1)
            x = F.relu(self.linear1(x))
            x = F.relu(self.linear2(x))
            x = F.relu(self.linear3(x))
            return self.linear4(x)

    tmlp = _RefMLP().eval()
    mparams = convert_mapping_mlp(tmlp.state_dict())
    mlp = MappingMLP(num_classes=2, hidden_dims=(4096, 2048, 128))
    taps = vit.apply({"params": vparams}, jnp.asarray(x_img), (2,), method="tap_features")
    ours_head = mlp.apply({"params": mparams}, taps[0])
    with torch.no_grad():
        t = tvit.patch_embed(torch.tensor(x_img).permute(0, 3, 1, 2))
        t = tvit.blocks[0](t)
        t = tvit.blocks[1](t)
        theirs_head = tmlp(t).numpy()
    np.testing.assert_allclose(np.asarray(ours_head), theirs_head, rtol=1e-3, atol=1e-3)

    # --- one reverse step through the full-size ConditionalModel ---------
    tcm = _torch_conditional_model(data_dim=150528, hidden=4096, feat=4096,
                                   y_dim=2, n_steps=1001).eval()
    variables = convert_conditional_model(tcm.state_dict())
    cond = ConditionalModel(data_dim=150528, feature_dim=4096, hidden_dim=4096,
                            y_dim=2, n_steps=1001)
    x_flat = x_img.reshape(1, -1)
    y_t = rng.normal(size=(1, 2)).astype(np.float32)
    y0_hat = np.asarray([[0.7, 0.3]], np.float32)
    t_step = 500
    ours_eps = cond.apply(variables, jnp.asarray(x_flat), jnp.asarray(y_t),
                          jnp.asarray(t_step), jnp.asarray(y0_hat))
    with torch.no_grad():
        theirs_eps = tcm(torch.tensor(x_flat), torch.tensor(y_t),
                         torch.tensor([t_step]), torch.tensor(y0_hat)).numpy()
    np.testing.assert_allclose(np.asarray(ours_eps), theirs_eps, rtol=1e-3, atol=1e-4)

    # and the actual p_sample update with those eps values agrees
    sched = DiffusionSchedule.create("linear", 1000, 1e-4, 0.02)
    coeffs = p_sample_coefficients(sched, jnp.asarray(t_step))
    z = rng.normal(size=(1, 2)).astype(np.float32)
    ours_y = p_sample_step(jnp.asarray(y_t), ours_eps, jnp.asarray(y0_hat), coeffs,
                           jnp.asarray(z))
    theirs_y = p_sample_step(jnp.asarray(y_t), jnp.asarray(theirs_eps),
                             jnp.asarray(y0_hat), coeffs, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(ours_y), np.asarray(theirs_y),
                               rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Inverse direction: flax -> reference .pth (cli.convert --export)
# ---------------------------------------------------------------------------


def test_export_roundtrip_state_dicts(reference_artifacts):
    """torch sd -> convert -> export -> identical torch sd (all three model
    families), proving the exporters are exact inverses."""
    from ladine_tpu.utils.torch_convert import (
        convert_conditional_model,
        convert_mapping_mlp,
        convert_vit,
        export_conditional_model,
        export_mapping_mlp,
        export_vit,
        load_torch_state_dict,
    )

    pre, diffu = reference_artifacts
    cases = [
        (os.path.join(pre, "vit_base_patch16_224_ChestXRay.pth"),
         lambda sd: export_vit(convert_vit(sd, depth=DIMS["depth"]),
                               depth=DIMS["depth"])),
        (os.path.join(pre, "MLPs", "block_0.pth"),
         lambda sd: export_mapping_mlp(convert_mapping_mlp(sd))),
        (diffu[0],
         lambda sd: export_conditional_model(convert_conditional_model(sd))),
    ]
    for path, roundtrip in cases:
        sd = load_torch_state_dict(path)
        out = roundtrip(sd)
        extra = set(out) - set(sd)
        assert all(k.endswith("num_batches_tracked") for k in extra), extra
        for k in sd:
            np.testing.assert_array_equal(out[k], sd[k], err_msg=f"{path}:{k}")


def test_export_cli_reference_loadable(reference_artifacts, small_config, tmp_path):
    """import CLI -> export CLI -> the .pth files strict-load into
    reference-layout torch modules (a reference user can consume them)."""
    from ladine_tpu.cli.convert import main as convert_main

    pre, diffu = reference_artifacts
    imported = str(tmp_path / "imported")
    rc = convert_main(["--cpu", "--pretrained_dir", pre, "--dataset", "ChestXRay",
                       "--diffusion_ckpt", diffu[0], "--config", small_config,
                       "--out", imported])
    assert rc == 0

    exported = str(tmp_path / "exported")
    rc = convert_main(["--cpu", "--export", "--dataset", "ChestXRay",
                       "--out", exported,
                       "--guidance_ckpt", os.path.join(imported, "guidance_ChestXRay"),
                       "--diffusion_ckpt", os.path.join(imported, "member_0")])
    assert rc == 0

    vit = _torch_vit(depth=DIMS["depth"], embed=DIMS["embed"], heads=DIMS["heads"],
                     img=DIMS["img"], patch=DIMS["patch"])
    vit.load_state_dict(
        torch.load(os.path.join(exported, "vit_base_patch16_224_ChestXRay.pth"),
                   weights_only=False), strict=True)
    mlp = _torch_mapping_mlp(in_features=(DIMS["img"] // DIMS["patch"]) ** 2 * DIMS["embed"])
    mlp.load_state_dict(
        torch.load(os.path.join(exported, "MLPs", "block_0.pth"),
                   weights_only=False), strict=True)
    cm = _torch_conditional_model(data_dim=DIMS["img"] ** 2 * 3, hidden=16,
                                  feat=16, y_dim=2, n_steps=11)
    wrapper = torch.load(os.path.join(exported, "diffu0_ckpt_best_eph0_acc0.0000.pth"),
                         weights_only=False)
    assert set(wrapper) == {"noise_estimator", "optimizer", "epoch"}
    cm.load_state_dict(wrapper["noise_estimator"], strict=True)

    # and the exported weights equal the originals end-to-end
    orig = torch.load(diffu[0], weights_only=False)["noise_estimator"]
    for k, v in orig.items():
        np.testing.assert_array_equal(
            wrapper["noise_estimator"][k].numpy(), v.numpy(), err_msg=k)


def test_export_cli_from_training_ckpt(tmp_path):
    """--export unpacks a stacked TRAINING checkpoint (diffu_all*) into one
    reference .pth per member, honoring --eval_ema."""
    import jax

    from ladine_tpu.cli.convert import main as convert_main
    from ladine_tpu.models import ConditionalModel
    from ladine_tpu.train import create_member_states, make_optimizer
    from ladine_tpu.utils import save_checkpoint

    model = ConditionalModel(data_dim=48, feature_dim=16, hidden_dim=16,
                             y_dim=2, n_steps=11)
    tx = make_optimizer("Adam", 1e-3)
    states = create_member_states(model, jax.random.PRNGKey(0), tx, 3, batch_size=4)
    # make EMA distinguishable from raw params (this ckpt carries no
    # ema_init meta -> legacy pass-through: the shadow IS the weights)
    states = states.replace(ema=jax.tree.map(lambda x: x + 1.0, states.params))
    ck = str(tmp_path / "diffu_all0_ckpt_best_eph7_acc88.0")
    save_checkpoint(ck, {"states": states, "guidance": None},
                    {"epoch": 7, "accuracy": 88.0, "kind": "diffusion_members",
                     "member_idx": None})

    out = str(tmp_path / "exported")
    rc = convert_main(["--cpu", "--export", "--out", out, "--diffusion_ckpt", ck])
    assert rc == 0
    names = sorted(f for f in os.listdir(out) if f.endswith(".pth"))
    assert names == [f"diffu{k}_ckpt_best_eph7_acc88.0000.pth" for k in range(3)]

    out_ema = str(tmp_path / "exported_ema")
    rc = convert_main(["--cpu", "--export", "--eval_ema", "--out", out_ema,
                       "--diffusion_ckpt", ck])
    assert rc == 0
    raw = torch.load(os.path.join(out, names[0]), weights_only=False)
    ema = torch.load(os.path.join(out_ema, names[0]), weights_only=False)
    w_raw = raw["noise_estimator"]["lin4.weight"].numpy()
    w_ema = ema["noise_estimator"]["lin4.weight"].numpy()
    np.testing.assert_allclose(w_ema, w_raw + 1.0, rtol=1e-6)
