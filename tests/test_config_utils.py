import os

import jax.numpy as jnp
import numpy as np
import pytest

from ladine_tpu.config import Config
from ladine_tpu.utils import load_checkpoint, save_checkpoint, setup_logging, ScalarLogger


def test_config_defaults_match_reference():
    cfg = Config()
    assert cfg.diffusion.timesteps == 1000
    assert cfg.diffusion.beta_start == 1e-4
    assert cfg.training.batch_size == 30
    assert cfg.testing.batch_size == 70
    assert cfg.optim.lr == 1e-3
    assert cfg.model.ema_rate == 0.9999
    assert cfg.training.warmup_epochs == 40


def test_config_from_reference_yaml():
    """The reference's own YAML files load directly."""
    path = "/root/reference/diffusion/configs/chest_x_ray.yml"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    cfg = Config.from_yaml(path)
    assert cfg.data.dataset == "ChestXRay"
    assert cfg.data.seed == 4444
    assert cfg.diffusion.timesteps == 1000
    assert cfg.diffusion.aux_cls_arch == "sevit"
    assert cfg.optim.grad_clip == 1.0
    assert cfg.data.label_min_max == (0.001, 0.999)


def test_config_overrides_and_roundtrip(tmp_path):
    cfg = Config()
    cfg.apply_overrides({"diffusion.timesteps": 50, "data.dataroot": "/x"})
    assert cfg.diffusion.timesteps == 50
    assert cfg.data.dataroot == "/x"
    p = str(tmp_path / "snap.yml")
    cfg.save_yaml(p)
    cfg2 = Config.from_yaml(p)
    assert cfg2.diffusion.timesteps == 50
    assert cfg2.data.dataroot == "/x"


def test_checkpoint_roundtrip(tmp_path):
    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": jnp.asarray(7)}
    path = str(tmp_path / "ckpt1")
    save_checkpoint(path, tree, {"epoch": 3, "accuracy": 91.5})
    restored, meta = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3))
    assert meta["epoch"] == 3
    # restore with target structure
    restored2, _ = load_checkpoint(path, target=tree)
    np.testing.assert_array_equal(np.asarray(restored2["step"]), 7)


def test_scalar_logger(tmp_path):
    d = str(tmp_path / "logs")
    sl = ScalarLogger(d, use_tensorboard=False)
    sl.add_scalar("loss", 0.5, 1)
    sl.add_scalar("loss", 0.4, 2)
    sl.close()
    import json

    lines = [json.loads(l) for l in open(os.path.join(d, "scalars.jsonl"))]
    assert lines[0]["tag"] == "loss" and lines[1]["step"] == 2


def test_setup_logging_writes_file(tmp_path):
    d = str(tmp_path / "logdir")
    logger = setup_logging(d)
    logger.info("hello world")
    with open(os.path.join(d, "stdout.txt")) as f:
        assert "hello world" in f.read()


def test_cli_set_overrides_dotted_paths(tmp_path):
    """--set K=V (repeatable) routes through Config.apply_overrides with
    YAML scalar parsing — the generic knob surface (optim.lowmem etc.)."""
    from ladine_tpu.cli.main import build_parser

    args = build_parser().parse_args(
        ["--demo", "--set", "optim.lowmem=true", "--set", "optim.lr=5e-4"])
    assert args.set_overrides == ["optim.lowmem=true", "optim.lr=5e-4"]
    import yaml

    cfg = Config()
    kv = {}
    for s in args.set_overrides:
        k, v = s.split("=", 1)
        parsed = yaml.safe_load(v)
        if isinstance(parsed, str):
            # mirror cli.main: YAML 1.1 reads dot-less sci notation as str
            try:
                parsed = float(parsed)
            except ValueError:
                pass
        kv[k] = parsed
    cfg.apply_overrides(kv)
    assert cfg.optim.lowmem is True
    assert cfg.optim.lr == 5e-4


def test_render_results_fallback(tmp_path):
    """scripts/render_results.py builds a table from whatever reports are
    synced — the chip-free RESULTS.md fallback (round-4 weak #2)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "RESULTS.md"
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "render_results.py"),
         "--out", str(out)],
        capture_output=True, text=True, cwd=repo, timeout=120)
    assert res.returncode == 0, res.stderr[-1500:]
    text = out.read_text()
    assert "| evaluation | acc % |" in text
    assert "Rows landed:" in text
