"""--light_ckpt: eval-only best checkpoints (params/EMA/batch_stats, compute
dtype) — ~6x smaller device->host pulls for remote-tunnel training."""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest


def _train(tmp_path, doc, dtype=None, **kw):
    from ladine_tpu.cli.runner import Runner
    from ladine_tpu.config import Config

    cfg = Config()
    if dtype:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, dtype=dtype))
    runner = Runner(cfg, log_dir=str(tmp_path / doc), demo=True)
    out = runner.train(jax.random.PRNGKey(3), epochs=1, light_ckpt=True, **kw)
    return runner, out


@pytest.mark.slow
def test_light_ckpt_saves_eval_payload_only(tmp_path):
    runner, out = _train(tmp_path, "t1")
    ck = out["best_ckpt_path"]
    assert ck is not None
    meta = json.load(open(os.path.join(ck, "ladine_meta.json")))
    assert meta["light"] is True

    from ladine_tpu.utils import load_checkpoint

    tree, meta2 = load_checkpoint(ck)
    # step rides along: EMA debiasing at load time needs the update counts
    assert set(tree["states"]) == {"params", "ema", "batch_stats", "step"}
    assert meta2["ema_init"] == "zero" and meta2["ema_rate"] > 0

    # evaluates through the normal train-ckpt loader, raw and EMA
    vars_raw, g, _ = runner.load_members_from_train_ckpt(ck)
    vars_ema, _, _ = runner.load_members_from_train_ckpt(ck, use_ema=True)
    assert g is not None
    a = jax.tree.leaves(vars_raw["params"])[0]
    b = jax.tree.leaves(vars_ema["params"])[0]
    assert a.shape == b.shape


@pytest.mark.slow
def test_light_ckpt_refuses_resume(tmp_path):
    runner, out = _train(tmp_path, "t2")
    with pytest.raises(ValueError, match="light_ckpt"):
        runner.train(jax.random.PRNGKey(4), epochs=2, resume_from=out["best_ckpt_path"])


@pytest.mark.slow
def test_light_ckpt_references_stage1_guidance(tmp_path):
    """With frozen stage-1 artifacts, light checkpoints store the artifact
    PATHS instead of a full guidance copy, supersede previous bests on disk,
    and the eval loader resolves the reference transparently."""
    from PIL import Image

    from ladine_tpu.cli.train_mapping import main as tm_main
    from ladine_tpu.cli.train_transformer import main as tt_main
    from ladine_tpu.cli.runner import Runner
    from ladine_tpu.config import Config
    from ladine_tpu.utils import load_checkpoint

    # stage-1 artifacts at the Runner's demo geometry (16px, depth 5 = K)
    rng = np.random.default_rng(7)
    ds = tmp_path / "ds"
    for split in ("training", "validation"):
        for cls_idx, cls in enumerate(["NORMAL", "TUBERCULOSIS"]):
            d = ds / split / cls
            d.mkdir(parents=True)
            for i in range(4):
                arr = rng.integers(0, 40, size=(16, 16, 3)) + cls_idx * 140
                Image.fromarray(arr.astype(np.uint8)).save(d / f"i{i}.png")
    dims = ["--image_size", "16", "--patch_size", "8", "--embed_dim", "16",
            "--depth", "5", "--num_heads", "2"]
    models = str(tmp_path / "models")
    assert tt_main(["--cpu", "--epochs", "1", "--out", models, *dims,
                    "--dataroot", str(ds), "--batch_size", "4"]) == 0
    assert tm_main(["--cpu", "--epochs", "1", "--num_members", "5",
                    "--out", models, *dims, "--mlp_hidden_dims", "16", "8", "8",
                    "--dataroot", str(ds), "--batch_size", "4",
                    "--vit_ckpt", os.path.join(models, "vit_ChestXRay")]) == 0
    vit_ckpt = os.path.join(models, "vit_ChestXRay")
    mlp_dir = os.path.join(models, "ChestXRay", "MLPs")

    runner = Runner(Config(), log_dir=str(tmp_path / "run"), demo=True)
    out = runner.train(jax.random.PRNGKey(3), epochs=1, light_ckpt=True,
                       vit_ckpt=vit_ckpt, mlp_dir=mlp_dir,
                       precompute_yhat=True)
    ck = out["best_ckpt_path"]
    meta = json.load(open(os.path.join(ck, "ladine_meta.json")))
    assert meta["guidance_src"]["vit_ckpt"] == os.path.abspath(vit_ckpt)

    tree, _ = load_checkpoint(ck)
    assert tree.get("guidance") is None  # no 13 GB copy embedded

    variables, g, _ = runner.load_members_from_train_ckpt(ck)
    assert g is not None and "vit" in g["params"]  # resolved from the source
    # only ONE best checkpoint remains on disk (superseded ones pruned)
    bests = [f for f in os.listdir(str(tmp_path / "run"))
             if f.startswith("diffu_all") and not f.endswith((".json", "_aux"))]
    assert len(bests) == 1


@pytest.mark.slow
def test_light_ckpt_bf16_casts_floats(tmp_path):
    import jax.numpy as jnp

    _, out = _train(tmp_path, "t3", dtype="bfloat16")
    from ladine_tpu.utils import load_checkpoint

    tree, _ = load_checkpoint(out["best_ckpt_path"])
    leaf = jax.tree.leaves(tree["states"]["params"])[0]
    assert np.asarray(leaf).dtype == jnp.bfloat16

    # the --fp32 numerics A/B upcasts bf16-STORED weights at load: an fp32
    # Runner reading this bf16 light checkpoint gets resident fp32 leaves
    # (save-time rounding is baked in, but all downstream promotion is fp32)
    from ladine_tpu.cli.runner import Runner
    from ladine_tpu.config import Config

    r32 = Runner(Config(), log_dir=str(tmp_path / "t3_fp32"), demo=True)
    assert r32.config.model.dtype == "float32"
    v32, _, _ = r32.load_members_from_train_ckpt(out["best_ckpt_path"],
                                                 eval_cast=True)
    leaf32 = jax.tree.leaves(v32["params"])[0]
    assert np.asarray(leaf32).dtype == np.float32

    # and the flax->torch exporter handles the non-numpy-native dtype
    from ladine_tpu.cli.convert import main as convert_main

    out_dir = str(tmp_path / "exported")
    rc = convert_main(["--cpu", "--export", "--out", out_dir,
                       "--diffusion_ckpt", out["best_ckpt_path"]])
    assert rc == 0
    torch = pytest.importorskip("torch")
    pths = [f for f in os.listdir(out_dir) if f.endswith(".pth")]
    sd = torch.load(os.path.join(out_dir, pths[0]), weights_only=False)
    assert sd["noise_estimator"]["lin4.weight"].dtype == torch.float32
