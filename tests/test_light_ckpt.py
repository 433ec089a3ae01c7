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


def test_light_ckpt_saves_eval_payload_only(tmp_path):
    runner, out = _train(tmp_path, "t1")
    ck = out["best_ckpt_path"]
    assert ck is not None
    meta = json.load(open(os.path.join(ck, "ladine_meta.json")))
    assert meta["light"] is True

    from ladine_tpu.utils import load_checkpoint

    tree, _ = load_checkpoint(ck)
    assert set(tree["states"]) == {"params", "ema", "batch_stats"}

    # evaluates through the normal train-ckpt loader, raw and EMA
    vars_raw, g, _ = runner.load_members_from_train_ckpt(ck)
    vars_ema, _, _ = runner.load_members_from_train_ckpt(ck, use_ema=True)
    assert g is not None
    a = jax.tree.leaves(vars_raw["params"])[0]
    b = jax.tree.leaves(vars_ema["params"])[0]
    assert a.shape == b.shape


def test_light_ckpt_refuses_resume(tmp_path):
    runner, out = _train(tmp_path, "t2")
    with pytest.raises(ValueError, match="light_ckpt"):
        runner.train(jax.random.PRNGKey(4), epochs=2, resume_from=out["best_ckpt_path"])


def test_light_ckpt_bf16_casts_floats(tmp_path):
    import jax.numpy as jnp

    _, out = _train(tmp_path, "t3", dtype="bfloat16")
    from ladine_tpu.utils import load_checkpoint

    tree, _ = load_checkpoint(out["best_ckpt_path"])
    leaf = jax.tree.leaves(tree["states"]["params"])[0]
    assert np.asarray(leaf).dtype == jnp.bfloat16

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
