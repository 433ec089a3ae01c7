"""Precomputed frozen-guidance training (--precompute_guidance) and the
per-MLP stage-1b mode (--mlp_idx): both exist so FULL-dims single-chip
training fits HBM; both must be numerically equivalent to the concurrent
in-step paths they replace."""

import json
import os

import jax
import numpy as np
import pytest


def _run_train(tmp_path, doc, precompute):
    from ladine_tpu.cli.runner import Runner
    from ladine_tpu.config import Config

    runner = Runner(Config(), log_dir=str(tmp_path / doc), demo=True)
    return runner.train(jax.random.PRNGKey(7), epochs=2,
                        precompute_yhat=precompute)


@pytest.mark.slow
def test_precompute_matches_in_step_guidance(tmp_path):
    """Same seeds: training with cached y0_hat reproduces the in-step
    guidance run's losses exactly (the guidance is frozen, so its output
    per sample is a constant the precompute merely hoists)."""
    ref = _run_train(tmp_path, "instep", False)
    pre = _run_train(tmp_path, "pre", True)
    assert pre["best_accuracy"] == ref["best_accuracy"]
    assert pre["steps"] == ref["steps"]
    # the cached softmax is jitted separately from the fused in-step one, so
    # last-ulp rounding can differ; Adam's sign-sensitive first steps bound
    # the divergence at ~2 * lr per step (same bound as test_fsdp)
    for a, b in zip(jax.tree.leaves(ref["states"].params),
                    jax.tree.leaves(pre["states"].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1.3e-2)


def test_precompute_rejects_joint_train(tmp_path):
    from ladine_tpu.cli.runner import Runner
    from ladine_tpu.config import Config

    runner = Runner(Config(), log_dir=str(tmp_path), demo=True)
    with pytest.raises(ValueError, match="joint_train"):
        runner.train(jax.random.PRNGKey(0), joint_train=True, precompute_yhat=True)


def test_precompute_checkpoint_feeds_eval(tmp_path):
    """The ckpt saved by a precompute run carries the (host) guidance tree
    and evaluates through the normal --test handoff."""
    from ladine_tpu.cli.main import main

    exp = str(tmp_path / "exp")
    rc = main(["--demo", "--train", "--cpu", "--n_epochs", "1",
               "--timesteps", "10", "--precompute_guidance",
               "--exp", exp, "--doc", "tr", "--ni"])
    assert rc == 0
    ckpts = [f for f in os.listdir(os.path.join(exp, "logs", "tr"))
             if f.startswith("diffu_all") and not f.endswith(("_aux", ".json"))]
    assert ckpts
    rc = main(["--demo", "--test", "--cpu", "--timesteps", "10",
               "--mc_trials", "2", "--exp", exp, "--doc", "te", "--ni",
               "--diffusion_ckpt",
               os.path.join(exp, "logs", "tr", sorted(ckpts)[-1])])
    assert rc == 0
    rep = json.load(open(os.path.join(exp, "logs", "te", "report.json")))
    assert np.isfinite(rep["ece"])


def test_mlp_idx_matches_concurrent_member(tmp_path):
    """train_mapping --mlp_idx k reproduces member k of the concurrent run:
    identical init (same per-member key) and identical tap depth."""
    from ladine_tpu.cli.train_mapping import main as tm_main
    from ladine_tpu.utils import load_checkpoint

    out_all = str(tmp_path / "all")
    rc = tm_main(["--demo", "--cpu", "--epochs", "2", "--num_members", "3",
                  "--out", out_all])
    assert rc == 0
    out_one = str(tmp_path / "one")
    rc = tm_main(["--demo", "--cpu", "--epochs", "2", "--num_members", "3",
                  "--mlp_idx", "1", "--out", out_one])
    assert rc == 0

    a, _ = load_checkpoint(os.path.join(out_all, "ChestXRay", "MLPs", "block_1"))
    b, _ = load_checkpoint(os.path.join(out_one, "ChestXRay", "MLPs", "block_1"))
    fa = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_flatten_with_path(a)[0]}
    fb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_flatten_with_path(b)[0]}
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   rtol=1e-6, err_msg=k)
    # and only the requested block was written
    assert os.listdir(os.path.join(out_one, "ChestXRay", "MLPs")) == ["block_1"]


@pytest.mark.slow
def test_sequential_matches_per_invocation(tmp_path):
    """--sequential trains the same members with the same init keys as K
    separate --mlp_idx invocations (one ViT load instead of K), and skips
    already-complete members on rerun."""
    from ladine_tpu.cli.train_mapping import main as tm_main
    from ladine_tpu.utils import load_checkpoint

    out_seq = str(tmp_path / "seq")
    rc = tm_main(["--demo", "--cpu", "--epochs", "2", "--num_members", "3",
                  "--sequential", "--out", out_seq])
    assert rc == 0
    out_one = str(tmp_path / "one")
    rc = tm_main(["--demo", "--cpu", "--epochs", "2", "--num_members", "3",
                  "--mlp_idx", "2", "--out", out_one])
    assert rc == 0

    a, ma = load_checkpoint(os.path.join(out_seq, "ChestXRay", "MLPs", "block_2"))
    b, _ = load_checkpoint(os.path.join(out_one, "ChestXRay", "MLPs", "block_2"))
    fa = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_flatten_with_path(a)[0]}
    fb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_flatten_with_path(b)[0]}
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   rtol=1e-6, err_msg=k)
    assert sorted(os.listdir(os.path.join(out_seq, "ChestXRay", "MLPs"))) == [
        "block_0", "block_1", "block_2"]

    # rerun: everything already trained -> all skipped, accuracies re-read
    mtime = os.path.getmtime(
        os.path.join(out_seq, "ChestXRay", "MLPs", "block_2", "ladine_meta.json"))
    rc = tm_main(["--demo", "--cpu", "--epochs", "2", "--num_members", "3",
                  "--sequential", "--out", out_seq])
    assert rc == 0
    assert os.path.getmtime(
        os.path.join(out_seq, "ChestXRay", "MLPs", "block_2", "ladine_meta.json")
    ) == mtime
