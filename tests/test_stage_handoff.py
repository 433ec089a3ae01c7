"""The REAL three-stage pipeline, artifact handoff included:

    stage 1a (cli.train_transformer)  -> vit_ChestXRay
    stage 1b (cli.train_mapping)      -> ChestXRay/MLPs/block_0..4
    assemble (cli.assemble / --vit_ckpt) -> guidance tree
    stage 3  (cli.main --train)       -> diffu_all* training checkpoint
    eval     (cli.main --test --diffusion_ckpt <ckpt>)

No --pretrain_guidance anywhere — this is the reference's make_files.sh +
torch.load flow (classification_train_separately.py:249-315) running as
actual separate processes' worth of artifacts.
"""

import json
import os

import numpy as np
import pytest

DIMS = ["--image_size", "16", "--patch_size", "8", "--embed_dim", "16",
        "--depth", "5", "--num_heads", "2"]


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("handoff_ds")
    rng = np.random.default_rng(7)
    counts = {"training": 12, "validation": 6, "testing": 6}
    for split, n in counts.items():
        for cls_idx, cls in enumerate(["NORMAL", "TUBERCULOSIS"]):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                base = rng.integers(0, 40, size=(16, 16, 3)) + cls_idx * 140
                Image.fromarray(base.astype(np.uint8)).save(d / f"i{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def small_config(tmp_path_factory, dataset_root):
    import yaml

    cfg = {
        "data": {"dataset": "ChestXRay", "dataroot": dataset_root, "num_classes": 2,
                 "preprocess": "grayscaled"},
        "model": {"image_size": 16, "patch_size": 8, "embed_dim": 16, "vit_depth": 5,
                  "num_heads": 2, "mlp_hidden_dims": [16, 8, 8],
                  "feature_dim": 16, "hidden_dim": 16, "data_dim": 16 * 16 * 3},
        "diffusion": {"timesteps": 10, "num_members": 5},
        "training": {"batch_size": 8, "n_epochs": 4, "warmup_epochs": 1,
                     "validation_freq": 2, "logging_freq": 1000},
        "testing": {"batch_size": 6, "mc_trials": 2, "drop_last": False},
        "sampling": {"batch_size": 6},
    }
    p = tmp_path_factory.mktemp("cfg") / "small.yml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


@pytest.fixture(scope="module")
def stage1_artifacts(tmp_path_factory, dataset_root):
    from ladine_tpu.cli.train_mapping import main as mapping_main
    from ladine_tpu.cli.train_transformer import main as vit_main

    out = str(tmp_path_factory.mktemp("models"))
    rc = vit_main(["--cpu", "--dataset", "ChestXRay", "--dataroot", dataset_root,
                   "--epochs", "2", "--batch_size", "8", "--out", out, *DIMS])
    assert rc == 0
    vit_ckpt = os.path.join(out, "vit_ChestXRay")
    assert os.path.isdir(vit_ckpt)

    rc = mapping_main(["--cpu", "--dataset", "ChestXRay", "--dataroot", dataset_root,
                       "--epochs", "2", "--batch_size", "8", "--out", out,
                       "--vit_ckpt", vit_ckpt, "--num_members", "5",
                       "--mlp_hidden_dims", "16", "8", "8", *DIMS])
    assert rc == 0
    mlp_dir = os.path.join(out, "ChestXRay", "MLPs")
    assert sorted(os.listdir(mlp_dir)) == [f"block_{k}" for k in range(5)]
    return vit_ckpt, mlp_dir


def test_assemble_cli_roundtrip(stage1_artifacts, tmp_path):
    from ladine_tpu.cli.assemble import main as assemble_main
    from ladine_tpu.utils import load_checkpoint

    vit_ckpt, mlp_dir = stage1_artifacts
    out = str(tmp_path / "guidance_ChestXRay")
    rc = assemble_main(["--vit_ckpt", vit_ckpt, "--mlp_ckpt_dir", mlp_dir, "--out", out])
    assert rc == 0
    gvars, meta = load_checkpoint(out)
    assert meta["num_members"] == 5
    assert set(gvars["params"]) == {"vit", "mlp0", "mlp1", "mlp2", "mlp3", "mlp4"}

    # inverse: split back into stage-1 layout and compare leaves
    split_out = str(tmp_path / "split")
    rc = assemble_main(["--split", out, "--dataset", "ChestXRay", "--out", split_out])
    assert rc == 0
    vit2, _ = load_checkpoint(os.path.join(split_out, "vit_ChestXRay"))
    orig_vit, _ = load_checkpoint(vit_ckpt)
    a = np.concatenate([np.ravel(x) for x in __import__("jax").tree.leaves(vit2)])
    b = np.concatenate([np.ravel(x) for x in __import__("jax").tree.leaves(orig_vit)])
    np.testing.assert_array_equal(a, b)


def test_assemble_rejects_wrong_dims(stage1_artifacts, tmp_path, small_config):
    """Stage-1 ckpts trained at different dims must fail loudly, not garble."""
    from ladine_tpu.cli.main import main

    vit_ckpt, mlp_dir = stage1_artifacts
    import yaml

    cfg = yaml.safe_load(open(small_config))
    cfg["model"]["embed_dim"] = 32  # wrong on purpose
    bad = tmp_path / "bad.yml"
    bad.write_text(yaml.safe_dump(cfg))
    with pytest.raises(ValueError, match="mismatch|does not match"):
        main(["--train", "--config", str(bad), "--cpu", "--exp", str(tmp_path / "exp"),
              "--doc", "bad", "--n_epochs", "1",
              "--vit_ckpt", vit_ckpt, "--mlp_ckpt_dir", mlp_dir])


@pytest.fixture(scope="module")
def trained_ckpt(stage1_artifacts, small_config, tmp_path_factory):
    """Stage 3 trained against ASSEMBLED stage-1 guidance (the previously
    broken handoff) — returns the diffu_all checkpoint path."""
    from ladine_tpu.cli.main import main

    vit_ckpt, mlp_dir = stage1_artifacts
    exp = str(tmp_path_factory.mktemp("exp"))
    rc = main([
        "--train", "--config", small_config, "--cpu", "--exp", exp, "--doc", "s3",
        "--seed", "3", "--vit_ckpt", vit_ckpt, "--mlp_ckpt_dir", mlp_dir,
    ])
    assert rc == 0
    log_dir = os.path.join(exp, "logs", "s3")
    ckpts = [d for d in os.listdir(log_dir) if d.startswith("diffu_all")]
    assert ckpts, os.listdir(log_dir)
    return os.path.join(log_dir, sorted(ckpts)[-1])


def test_full_pipeline_without_pretrain_guidance(trained_ckpt, small_config, tmp_path):
    """--test consuming the training checkpoint directly: members AND the
    guidance they were trained against come from one artifact."""
    from ladine_tpu.cli.main import main

    exp = str(tmp_path / "exp")
    rc = main([
        "--test", "--config", small_config, "--cpu", "--exp", exp, "--doc", "t",
        "--mc_trials", "2", "--ddim", "5",
        "--diffusion_ckpt", trained_ckpt,
    ])
    assert rc == 0
    report = json.load(open(os.path.join(exp, "logs", "t", "report.json")))
    assert report["num_instances"] == 12
    assert report["num_samples"] == 10
    assert 0 <= report["ece"] <= 1


def test_eval_ema_differs_from_raw(trained_ckpt, small_config, tmp_path):
    """--eval_ema must actually evaluate different weights: after a short run
    the EMA shadow (mu=0.9999, ~init) and the raw params have diverged."""
    import jax
    from ladine_tpu.cli.main import main
    from ladine_tpu.utils import load_checkpoint

    tree, _ = load_checkpoint(trained_ckpt)
    st = tree["states"]
    diffs = jax.tree.map(lambda a, b: float(np.max(np.abs(a - b))), st["params"], st["ema"])
    assert max(jax.tree.leaves(diffs)) > 0, "EMA never updated?"

    exp = str(tmp_path / "exp")
    for doc, extra in [("raw", []), ("ema", ["--eval_ema"])]:
        rc = main([
            "--test", "--config", small_config, "--cpu", "--exp", exp, "--doc", doc,
            "--mc_trials", "2", "--ddim", "5", "--seed", "11",
            "--diffusion_ckpt", trained_ckpt, *extra,
        ])
        assert rc == 0
    raw = json.load(open(os.path.join(exp, "logs", "raw", "report.json")))
    ema = json.load(open(os.path.join(exp, "logs", "ema", "report.json")))
    # same seed, same data — any metric difference must come from the weights
    assert raw != ema


def test_per_member_train_ckpts_stack(stage1_artifacts, small_config, tmp_path):
    """The reference's MLP_IDX workflow: two --mlp_idx runs, then --test with
    BOTH training checkpoints — members stack in head order and a partial
    ensemble (2 of 5 heads) evaluates via selected_members."""
    from ladine_tpu.cli.main import main

    vit_ckpt, mlp_dir = stage1_artifacts
    exp = str(tmp_path / "exp")
    ckpts = []
    for k in range(2):
        rc = main([
            "--train", "--config", small_config, "--cpu", "--exp", exp,
            "--doc", f"m{k}", "--seed", str(20 + k), "--mlp_idx", str(k),
            "--n_epochs", "2",
            "--vit_ckpt", vit_ckpt, "--mlp_ckpt_dir", mlp_dir,
        ])
        assert rc == 0
        log_dir = os.path.join(exp, "logs", f"m{k}")
        found = [d for d in os.listdir(log_dir) if d.startswith("diffu")]
        assert found
        ckpts.append(os.path.join(log_dir, sorted(found)[-1]))

    rc = main([
        "--test", "--config", small_config, "--cpu", "--exp", exp, "--doc", "mt",
        "--mc_trials", "2", "--ddim", "5", "--diffusion_ckpt", *ckpts,
    ])
    assert rc == 0
    report = json.load(open(os.path.join(exp, "logs", "mt", "report.json")))
    assert report["num_samples"] == 4  # 2 members x 2 trials
    assert report["num_instances"] == 12


def test_mlp_idx_member_keeps_its_trained_head(stage1_artifacts, small_config, tmp_path):
    """A member trained with --mlp_idx 3 must be conditioned on guidance
    head 3 at eval (recorded in ckpt metadata), not silently remapped to
    head 0 (round-2 review finding)."""
    import json as _json

    from ladine_tpu.cli.main import main
    from ladine_tpu.config import Config
    from ladine_tpu.cli.runner import Runner

    vit_ckpt, mlp_dir = stage1_artifacts
    exp = str(tmp_path / "exp")
    rc = main([
        "--train", "--config", small_config, "--cpu", "--exp", exp,
        "--doc", "m3", "--seed", "33", "--mlp_idx", "3", "--n_epochs", "2",
        "--vit_ckpt", vit_ckpt, "--mlp_ckpt_dir", mlp_dir,
    ])
    assert rc == 0
    log_dir = os.path.join(exp, "logs", "m3")
    ckpt = os.path.join(log_dir, sorted(
        d for d in os.listdir(log_dir) if d.startswith("diffu"))[-1])
    meta = _json.load(open(os.path.join(ckpt, "ladine_meta.json")))
    assert meta["member_idx"] == 3

    cfg = Config.from_yaml(small_config)
    runner = Runner(cfg, log_dir=str(tmp_path / "rl"))
    _, _, head_ids = runner.load_members_from_train_ckpts([ckpt])
    assert head_ids == (3,)

    # and the CLI eval path runs with that conditioning
    rc = main([
        "--test", "--config", small_config, "--cpu", "--exp", exp, "--doc", "m3t",
        "--mc_trials", "1", "--ddim", "5", "--diffusion_ckpt", ckpt,
    ])
    assert rc == 0
    report = json.load(open(os.path.join(exp, "logs", "m3t", "report.json")))
    assert report["num_samples"] == 1


def test_eval_ema_rejects_per_member_ckpts(small_config, tmp_path):
    from ladine_tpu.cli.main import main

    rc = main([
        "--test", "--config", small_config, "--cpu", "--exp", str(tmp_path), "--doc", "x",
        "--eval_ema", "--mc_trials", "2", "--ddim", "5",
    ])
    assert rc == 2


def test_precompute_yhat_disk_cache_shared_across_members(
        stage1_artifacts, small_config, tmp_path):
    """Two --mlp_idx invocations share one cached y0_hat file (the guidance
    forward runs once for all heads), and the cached run's ckpt evaluates."""
    import yaml

    from ladine_tpu.cli.main import main

    vit_ckpt, mlp_dir = stage1_artifacts
    exp = str(tmp_path / "exp")
    for k in range(2):
        rc = main([
            "--train", "--config", small_config, "--cpu", "--exp", exp,
            "--doc", f"m{k}", "--mlp_idx", str(k), "--n_epochs", "1",
            "--precompute_guidance", "--light_ckpt",
            "--vit_ckpt", vit_ckpt, "--mlp_ckpt_dir", mlp_dir,
        ])
        assert rc == 0
    caches = [f for f in os.listdir(os.path.join(exp, "logs"))
              if f.startswith("yhat_cache_")]
    assert len(caches) == 1, caches
    cfg = yaml.safe_load(open(small_config))
    z = np.load(os.path.join(exp, "logs", caches[0]))
    assert z["train"].shape[1] == cfg["diffusion"]["num_members"]  # ALL heads

    m0 = [f for f in os.listdir(os.path.join(exp, "logs", "m0"))
          if f.startswith("diffu0_")]
    rc = main([
        "--test", "--config", small_config, "--cpu", "--exp", exp, "--doc", "te",
        "--mc_trials", "2", "--ddim", "5",
        "--diffusion_ckpt", os.path.join(exp, "logs", "m0", m0[0]),
    ])
    assert rc == 0


def test_suite_mode_runs_named_configs_in_one_process(
        trained_ckpt, small_config, tmp_path):
    """--suite: several eval configurations, one load; per-row reports land
    incrementally and the summary aggregates them."""
    from ladine_tpu.cli.main import main

    suite = {"clean": {"ddim_steps": 5, "ddim_eta": 1.0},
             "noisy": {"ddim_steps": 5, "ddim_eta": 1.0, "noise_std": 0.1}}
    sp = tmp_path / "suite.json"
    sp.write_text(json.dumps(suite))
    exp = str(tmp_path / "exp")
    rc = main([
        "--test", "--config", small_config, "--cpu", "--exp", exp, "--doc", "s",
        "--mc_trials", "2", "--suite", str(sp),
        "--diffusion_ckpt", trained_ckpt,
    ])
    assert rc == 0
    d = os.path.join(exp, "logs", "s")
    for name in suite:
        rep = json.load(open(os.path.join(d, f"report_{name}.json")))
        assert 0 <= rep["ece"] <= 1
    summary = json.load(open(os.path.join(d, "report.json")))
    assert set(summary["rows"]) == {"clean", "noisy"}


def test_suite_mode_int8_pallas_row(trained_ckpt, small_config, tmp_path):
    """The int8_pallas suite row (run_results.py) evaluates through the
    fused Pallas scan body + MC-fold (EvalConfig.use_int8_pallas)."""
    from ladine_tpu.cli.main import main

    suite = {"int8_pallas": {"ddim_steps": 5, "ddim_eta": 1.0,
                             "use_int8_pallas": True}}
    sp = tmp_path / "suite.json"
    sp.write_text(json.dumps(suite))
    exp = str(tmp_path / "exp")
    rc = main([
        "--test", "--config", small_config, "--cpu", "--exp", exp, "--doc", "sp",
        "--mc_trials", "2", "--suite", str(sp),
        "--diffusion_ckpt", trained_ckpt,
    ])
    assert rc == 0
    rep = json.load(open(os.path.join(exp, "logs", "sp",
                                      "report_int8_pallas.json")))
    assert 0 <= rep["ece"] <= 1
